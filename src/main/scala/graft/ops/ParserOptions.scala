package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared parse-failure semantics of every parser in the reference,
  * re-expressed over a fixed-schema DataFrame.
  *
  * Reference: `core/plugin/processor/CommonParserOptions.cpp:29-113`
  * (quzard/ilogtail). Semantics kept:
  *  - `KeepingSourceWhenParseFail` (default true): on parse failure the
  *    source value survives; otherwise the row is dropped
  *    (`ShouldEraseEvent`, CommonParserOptions.cpp:98-113 — with our fixed
  *    schema a failed, source-erased event has no contents left).
  *  - `KeepingSourceWhenParseSucceed` (default false): on success the
  *    source value is erased (nulled — columns are fixed in Spark).
  *  - `RenamedSourceKey`: the kept source value moves to this column.
  *  - `CopingRawLog`: failed rows additionally copy the raw source into
  *    `__raw_log__` (CommonParserOptions.cpp:27,90-92).
  *
  * Everything is pure Catalyst (`when`/`coalesce`) so it stays inside
  * whole-stage codegen.
  */
final case class ParserOptions(
    keepingSourceWhenParseFail: Boolean = true,
    keepingSourceWhenParseSucceed: Boolean = false,
    renamedSourceKey: Option[String] = None,
    copingRawLog: Boolean = false) {

  private val okCol = "__parse_ok__"
  private val rawCol = "__parse_raw__"

  /** Apply the keep/rename/raw-log/drop policy.
    *
    * @param df        input with `sourceKey` still intact
    * @param sourceKey the parsed column
    * @param ok        row-wise parse-success predicate (may reference
    *                  `sourceKey`; it is snapshotted before any overwrite)
    * @param extracted (name, value) pairs valid only where `ok`
    */
  def finish(
      df: DataFrame,
      sourceKey: String,
      ok: Column,
      extracted: Seq[(String, Column)]): DataFrame = {
    // Snapshot predicate + raw value so later overwrites of sourceKey
    // cannot change what they see (each withColumn stacks a Project).
    val snap = df
      .withColumn(okCol, coalesce(ok, lit(false)))
      .withColumn(rawCol, col(sourceKey))
    val okc = col(okCol)
    val raw = col(rawCol)
    // New fields: null where the parse failed (reference: absent keys);
    // existing keys are not overwritten (AddLog no-overwrite,
    // ProcessorParseRegexNative.cpp:169-177).
    val withFields = extracted.foldLeft(snap) { case (d, (name, value)) =>
      if (df.columns.contains(name) && name != sourceKey) d
      else d.withColumn(name, when(okc, value))
    }
    val keptSource =
      when(okc, if (keepingSourceWhenParseSucceed) raw else lit(null: String))
        .otherwise(if (keepingSourceWhenParseFail) raw else lit(null: String))
    val target = renamedSourceKey.getOrElse(sourceKey)
    val renamed = {
      val d = withFields.withColumn(target, keptSource)
      if (target != sourceKey) d.withColumn(sourceKey, lit(null: String)) else d
    }
    val withRaw =
      if (copingRawLog) renamed.withColumn("__raw_log__", when(!okc, raw))
      else renamed
    val filtered =
      if (keepingSourceWhenParseFail) withRaw else withRaw.filter(okc)
    filtered.drop(okCol, rawCol)
  }
}
