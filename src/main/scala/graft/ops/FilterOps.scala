package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Row filters (SURVEY.md §2.3) — every predicate is a plain `Column`
  * combinator, so Catalyst pushes it down to the scan where possible.
  */
object FilterOps {

  /** RULE_MODE include filter: ALL (key → regex) pairs must match; the
    * key must exist (non-null) and its full value match the regex.
    * Reference: `core/plugin/processor/ProcessorFilterNative.cpp:286`
    * (`IsMatched`), Go `plugins/processor/filter/regex/
    * processor_filter_regex.go:33-41`.
    */
  final case class IncludeFilter(include: Map[String, String]) {
    def condition: Column = include.map { case (k, r) =>
      col(k).isNotNull && col(k).rlike(s"^(?:$r)$$")
    }.reduce(_ && _)
    def apply(df: DataFrame): DataFrame = df.filter(condition)
  }

  /** Exclude filter: ANY (key → regex) full match drops the row.
    * Reference: `processor_filter_regex.go:33-41` (Exclude). */
  final case class ExcludeFilter(exclude: Map[String, String]) {
    def condition: Column = exclude.map { case (k, r) =>
      col(k).isNotNull && col(k).rlike(s"^(?:$r)$$")
    }.reduce(_ || _)
    def apply(df: DataFrame): DataFrame = df.filter(!coalesce(condition, lit(false)))
  }

  /** Keep-row-iff-key-NAMES-match filter over a map-typed column (the
    * engine's dynamic-fields representation).
    * Reference: `plugins/processor/filter/keyregex/
    * processor_filter_key_regex.go:70-101` (IsLogMatch) — every
    * `include` regex must match AT LEAST ONE key name; ANY key name
    * matching ANY `exclude` regex drops the row. Unanchored search
    * (Go `MatchString`), matching `rlike`. A null/absent map has no
    * keys: it fails every include, and nothing can exclude it.
    */
  final case class KeyRegexFilter(mapCol: String,
      include: Seq[String] = Nil, exclude: Seq[String] = Nil) {
    def condition: Column = {
      val keys = coalesce(map_keys(col(mapCol)), array().cast("array<string>"))
      graft.functions.Cols.let(keys) { ks =>
        val inc = include.map(r => exists(ks, k => k.rlike(r)))
          .foldLeft(lit(true))(_ && _)
        val exc = exclude.map(r => exists(ks, k => k.rlike(r)))
          .foldLeft(lit(false))(_ || _)
        inc && !exc
      }
    }
    def apply(df: DataFrame): DataFrame = df.filter(condition)
  }

  /** EXPRESSION_MODE boolean tree over key-regex leaves.
    * Reference: `ProcessorFilterNative.h:34-94` node classes,
    * `ParseExpressionFromJSON` (`ProcessorFilterNative.cpp:405`).
    * Maps 1:1 onto `Column` combinators.
    */
  sealed trait Cond { def toColumn: Column }
  final case class KeyRegex(key: String, regex: String) extends Cond {
    def toColumn: Column =
      col(key).isNotNull && col(key).rlike(s"^(?:$regex)$$")
  }
  final case class And(cs: Seq[Cond]) extends Cond {
    def toColumn: Column = cs.map(_.toColumn).reduce(_ && _)
  }
  final case class Or(cs: Seq[Cond]) extends Cond {
    def toColumn: Column = cs.map(_.toColumn).reduce(_ || _)
  }
  final case class Not(c: Cond) extends Cond {
    def toColumn: Column = !coalesce(c.toColumn, lit(false))
  }
  final case class ExpressionFilter(root: Cond) {
    def apply(df: DataFrame): DataFrame = df.filter(root.toColumn)
  }

  /** switch/case field conditions: first matching case applies its
    * actions (add fields), optionally dropping non-matching rows.
    * Reference: `plugins/processor/fieldswithcondition/
    * processor_fields_with_condition.go:43-81` — `RelationOperator`
    * ∈ equals/regexp/contains/startwith, `LogicalOperator` and/or,
    * `DropIfNotMatchCondition`.
    */
  sealed trait Rel
  case object Equals extends Rel
  case object Regexp extends Rel
  case object Contains extends Rel
  case object StartWith extends Rel

  final case class FieldCond(key: String, rel: Rel, value: String) {
    def toColumn: Column = rel match {
      case Equals    => col(key) === value
      case Regexp    => col(key).rlike(value)
      case Contains  => col(key).contains(value)
      case StartWith => col(key).startsWith(value)
    }
  }
  final case class Case(
      conds: Seq[FieldCond],
      allMustMatch: Boolean, // LogicalOperator: and=true / or=false
      addFields: Map[String, String]) {
    def condition: Column = {
      val cs = conds.map(_.toColumn)
      if (allMustMatch) cs.reduce(_ && _) else cs.reduce(_ || _)
    }
  }
  final case class FieldsWithCondition(
      cases: Seq[Case],
      dropIfNotMatch: Boolean = false) {
    def apply(df: DataFrame): DataFrame = {
      // All add-field targets across cases become columns; a row gets the
      // value from the FIRST matching case (chained when = Catalyst CaseWhen).
      val targets = cases.flatMap(_.addFields.keys).distinct
      val withCols = targets.foldLeft(df) { (d, t) =>
        val branches = cases.filter(_.addFields.contains(t))
        val expr = branches.foldLeft(when(lit(false), lit(null: String))) {
          (acc, c) => acc.when(c.condition, lit(c.addFields(t)))
        }
        d.withColumn(t, expr)
      }
      if (dropIfNotMatch)
        withCols.filter(cases.map(c => coalesce(c.condition, lit(false))).reduce(_ || _))
      else withCols
    }
  }

  /** Deterministic batch analog of the token-bucket rate limit: keep at
    * most `limit` rows per distinct value-combination of `fields` per
    * time bucket. Reference: `plugins/processor/ratelimit/
    * processor_rate_limit.go:26-33` (+ token_bucket.go). The reference
    * drops by wall-clock arrival; a batch engine has no arrival clock, so
    * rows are ranked by event time within each (fields, bucket) group —
    * a documented, deterministic divergence (SURVEY.md §2.3).
    */
  final case class RateLimit(
      fields: Seq[String],
      limit: Int,
      tsCol: String = "ts",
      bucket: String = "1 second",
      tieBreak: Seq[String] = Seq.empty,
      // skew control: `fields` are typically LOW-cardinality (the
      // reference rate-limits per label set), so one (bucket, fields)
      // window partition would hold ALL matching rows — a full sort of
      // the hot group on one task. Phase 1 spreads each group over
      // `saltBuckets` deterministic sub-partitions and keeps the per-salt
      // top-`limit`; phase 2 exactly re-ranks the ≤ saltBuckets·limit
      // survivors. Any global top-limit row is inside its salt's
      // top-limit, so the two-phase result is EXACTLY the single-window
      // result. 1 disables salting.
      saltBuckets: Int = 32) {
    def apply(df: DataFrame): DataFrame = {
      val bucketCol = window(col(tsCol), bucket).getField("start")
      val orderCols = (col(tsCol) +: tieBreak.map(col)): Seq[Column]
      def ranked(d: DataFrame, extra: Seq[Column]): DataFrame = {
        val w = Window
          .partitionBy((bucketCol +: fields.map(col)) ++ extra: _*)
          .orderBy(orderCols: _*)
        d.withColumn("__rl_rn__", row_number().over(w))
          .filter(col("__rl_rn__") <= limit)
          .drop("__rl_rn__")
      }
      val survivors =
        if (saltBuckets <= 1) df
        else ranked(df, Seq(pmod(xxhash64(orderCols: _*), lit(saltBuckets))))
      ranked(survivors, Nil)
    }
  }
}
