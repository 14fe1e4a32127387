package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Prometheus metric path: exposition-format text parse + relabel rules
  * — the last commonly-hit reference family (§2 "metric pipeline").
  *
  * Reference: parser `core/prometheus/labels/TextParser.cpp:70-324`
  * (state machine over one line), line pre-filter
  * `core/prometheus/Utils.cpp:102-113` (`IsValidMetric`: first
  * non-blank char `#` → comment, all-blank → skip), relabel
  * `core/prometheus/labels/Relabel.cpp:140-258`, processors
  * `core/plugin/processor/inner/ProcessorPromParseMetricNative.cpp`,
  * `ProcessorPromRelabelMetricNative.cpp`.
  *
  * The whole parse is ONE anchored regex validation + group packing —
  * a per-row projection, no UDF, no shuffle; relabel actions are map
  * HOFs over the label column. Metric events model as columns
  * `(name string, labels map<string,string>, value double,
  * ts_sec long, ts_ns long)`.
  */
object PromOps {

  /** `IsValidNumberChar` (TextParser.cpp:35-40): the chars stod may
    * consume, incl. inf/nan/infinity spellings. */
  private val NumTok = "[0-9.eE+\\-IiNnFfTtYyXxAa]+"
  /** One label pair: name, `=`, double-quoted value with `\\.` escapes
    * (TextParser.cpp:123-139: label names are alpha/_ then alnum/_ —
    * no colon, unlike metric names). */
  private val Pair = "[A-Za-z_][A-Za-z0-9_]*[ \\t]*=[ \\t]*\"(?:[^\"\\\\]|\\\\.)*\""
  /** `{ pairs }` with the reference's comma rules: spaces anywhere, an
    * optional trailing comma (HandleCommaOrCloseBrace → HandleLabelName
    * accepts `}`). */
  private val Block =
    s"\\{[ \\t]*(?:$Pair(?:[ \\t]*,[ \\t]*$Pair)*(?:[ \\t]*,)?[ \\t]*)?\\}"
  /** Full line: name, optional label block, REQUIRED value token, then
    * optional timestamp; after either number the next char must be
    * blank / `#` / EOL (junk beyond that point is accepted, as in
    * HandleSampleValue/HandleTimestamp). */
  private val Line =
    s"^[ \\t]*([A-Za-z_:][A-Za-z0-9_:]*)[ \\t]*($Block)?[ \\t]*($NumTok)" +
      s"(?:[ \\t]*(?:#.*)?|[ \\t]+($NumTok)?(?:[ \\t].*|#.*)?)?$$"

  /** `std::stod` prefix semantics: consume the longest valid decimal /
    * inf / nan prefix of the token and ignore the rest ("12x3" → 12).
    * Hex floats (stod would take them) are NOT supported — no real
    * exporter emits them. An unparseable token → null → parse failure.
    */
  private def stodPrefix(tok: Column): Column = {
    val p = regexp_extract(tok,
      "^[+-]?(?:[Ii][Nn][Ff](?:[Ii][Nn][Ii][Tt][Yy])?|[Nn][Aa][Nn]" +
        "|(?:\\d+\\.?\\d*|\\.\\d+)(?:[eE][+-]?\\d+)?)", 0)
    Cols.let(p) { pre =>
      val low = lower(pre)
      val neg = low.startsWith("-")
      when(low.rlike("inf"),
        when(neg, lit(Double.NegativeInfinity))
          .otherwise(lit(Double.PositiveInfinity)))
        .when(low.rlike("nan"), lit(Double.NaN))
        .when(pre === "", lit(null).cast("double"))
        .otherwise(pre.try_cast("double"))
    }
  }

  /** Label-value unescape (TextParser.cpp:160-202): `\\`→`\`, `\"`→`"`,
    * `\n`→newline; an INVALID escape keeps both chars (the
    * "incorrectly escaped backslash" real-world case). Escape-free
    * values take the fast path; the per-char fold runs only when a
    * backslash is present (label values are short).
    */
  def unescapeLabelValue(v: Column): Column =
    when(!v.contains("\\"), v).otherwise(
      Cols.let(split(v, "")) { chars =>
        Cols.let(aggregate(chars,
          struct(lit(false).as("esc"), lit("").as("acc")),
          (st, c) => {
            val esc = st.getField("esc"); val acc = st.getField("acc")
            when(esc, struct(lit(false).as("esc"),
              concat(acc,
                when(c === "\\", lit("\\"))
                  .when(c === "\"", lit("\""))
                  .when(c === "n", lit("\n"))
                  .otherwise(concat(lit("\\"), c))).as("acc")))
              .otherwise(when(c === "\\",
                struct(lit(true).as("esc"), acc.as("acc")))
                .otherwise(struct(lit(false).as("esc"),
                  concat(acc, c).as("acc"))))
          })) { st =>
          // a lone trailing backslash is unreachable through the line
          // grammar (it would escape the closing quote); keep it if fed
          // a bare value directly
          when(st.getField("esc"), concat(st.getField("acc"), lit("\\")))
            .otherwise(st.getField("acc"))
        }
      })

  /** Parse exposition lines into metric events.
    *
    * Comment (`#`-first) and blank lines are silently skipped
    * (IsValidMetric); any other non-parsing line is dropped — the
    * reference logs-and-drops (HandleError), there is no
    * keep-source mode on this processor. Timestamps follow the
    * reference heuristic (TextParser.cpp:305-314): values < 2^31 are
    * seconds, larger are milliseconds; absent → `defaultTsSec`
    * (also used when `honorTimestamps=false`).
    */
  final case class TextParser(
      sourceKey: String = "text",
      honorTimestamps: Boolean = true,
      defaultTsSec: Long = 0L,
      defaultTsNs: Long = 0L) {

    def apply(df: DataFrame): DataFrame = {
      val src = col(sourceKey)
      val considered = df.filter(src.isNotNull &&
        src.rlike("^[ \\t]*[^ \\t#]")) // IsValidMetric
      val g = "__prom__"
      val parsed = considered
        .withColumn(g, when(src.rlike(Line), struct(
          regexp_extract(src, Line, 1).as("name"),
          regexp_extract(src, Line, 2).as("block"),
          regexp_extract(src, Line, 3).as("valtok"),
          regexp_extract(src, Line, 4).as("tstok"))))
        .filter(col(g).isNotNull)
      val pv = col(g)
      val pairRe = "([A-Za-z_][A-Za-z0-9_]*)[ \\t]*=[ \\t]*\"((?:[^\"\\\\]|\\\\.)*)\""
      // duplicate label names: the reference's SetTag overwrites
      // (last wins); map_from_arrays would THROW on duplicates under
      // the default dedup policy, so keep only the last occurrence of
      // each key before building the map (labels are short — the O(k²)
      // exists-scan is a few comparisons)
      val labels = Cols.let2(
        regexp_extract_all(pv.getField("block"), lit(pairRe), lit(1)),
        transform(
          regexp_extract_all(pv.getField("block"), lit(pairRe), lit(2)),
          v => unescapeLabelValue(v))) { (ks, vs) =>
        Cols.let(zip_with(ks, vs,
          (k, v) => struct(k.as("key"), v.as("value")))) { ents =>
          map_from_entries(filter(ents, (e, i) =>
            !exists(slice(ents, i + lit(2), size(ents)), e2 =>
              e2.getField("key") === e.getField("key"))))
        }
      }
      val value = stodPrefix(pv.getField("valtok"))
      val tsRaw = stodPrefix(pv.getField("tstok"))
      // try_cast, never a plain ANSI cast: the grammar's NumTok admits
      // 'nan' and out-of-int64 magnitudes, and stod would hand the
      // reference a value it then range-errors on — here a NaN/overflow
      // timestamp nulls and the row drops as a parse failure instead of
      // CAST_OVERFLOW killing the job
      val tsMsL = when(tsRaw < (1L << 31), tsRaw * 1000).otherwise(tsRaw)
        .try_cast("long")
      val hasTs = pv.getField("tstok") =!= "" && tsMsL.isNotNull
      val tsSec =
        if (honorTimestamps)
          when(hasTs, (tsMsL / 1000).cast("long"))
            .otherwise(lit(defaultTsSec))
        else lit(defaultTsSec)
      val tsNs =
        if (honorTimestamps)
          when(hasTs, pmod(tsMsL, lit(1000)) * 1000000L)
            .otherwise(lit(defaultTsNs))
        else lit(defaultTsNs)
      // an in-range-but-unparseable value or timestamp is a parse error
      // (stod throw → HandleError): drop
      parsed
        .withColumn("name", pv.getField("name"))
        .withColumn("labels", labels)
        .withColumn("value", value)
        .withColumn("__ts_bad__",
          pv.getField("tstok") =!= "" && tsMsL.isNull)
        .withColumn("ts_sec", tsSec)
        .withColumn("ts_ns", tsNs)
        .filter(col("value").isNotNull && !col("__ts_bad__"))
        .drop(g, "__ts_bad__")
    }
  }

  // --- relabel (Relabel.cpp:140-258) ---------------------------------------

  /** One relabel rule; `action` ∈ replace, keep, drop, keepequal,
    * dropequal, lowercase, uppercase, hashmod, labelmap, labeldrop,
    * labelkeep, dropmetric. Defaults per RelabelConfig(): separator
    * ";", replacement "$1". `__name__` addresses the metric name. */
  final case class RelabelRule(
      action: String,
      sourceLabels: Seq[String] = Nil,
      separator: String = ";",
      targetLabel: String = "",
      regex: String = "(.*)",
      replacement: String = "$1",
      modulus: Long = 0L,
      matchList: Set[String] = Set.empty)

  private val NameLabel = "__name__"

  /** Count capturing groups of a Java regex: plain `(` and named
    * `(?<name>…)` groups (both numbered by Java); `(?:`/`(?=`/`(?!`/
    * lookbehind `(?<=`/`(?<!` and char-class contents excluded. */
  private[ops] def countGroups(regex: String): Int = {
    var i = 0; var n = 0; var inClass = false
    while (i < regex.length) {
      regex.charAt(i) match {
        case '\\' => i += 1 // skip escaped char
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass =>
          val plain = i + 1 >= regex.length || regex.charAt(i + 1) != '?'
          // (?<name>…) is a CAPTURING group; (?<= and (?<! are not
          val named = !plain && i + 2 < regex.length &&
            regex.charAt(i + 2) == '<' && i + 3 < regex.length &&
            regex.charAt(i + 3) != '=' && regex.charAt(i + 3) != '!'
          if (plain || named) n += 1
        case _ =>
      }
      i += 1
    }
    n
  }

  /** boost::regex_replace(…, format_first_only): substitute the FIRST
    * match of `regex` inside `v` with the expanded template, keeping
    * prefix and suffix. Emulated as ONE whole-string anchored match —
    * `^(lazy prefix)(regex)(rest)$` — so an empty-matching regex (the
    * default `(.*)`!) cannot fire a second time at end-of-input; the
    * prefix group shifts the template's `$N` references by one. */
  private def firstOnlyReplace(v: Column, regex: String, tmpl: String): Column = {
    val n = countGroups(regex)
    val shifted = "\\$(\\d+)".r.replaceAllIn(tmpl,
      m => "\\$" + (m.group(1).toInt + 1))
    regexp_replace(v, s"(?s)^([\\s\\S]*?)(?:$regex)([\\s\\S]*)$$",
      "$1" + shifted + "$" + (n + 2))
  }

  /** Apply relabel rules to a parsed metric frame. Row-dropping actions
    * become filters; label rewrites are map expressions. After all
    * rules, labels starting with `__` are dropped from the final label
    * set (ProcessorPromRelabelMetricNative's toDelete sweep), except
    * the name which lives in its own column.
    */
  final case class Relabel(rules: Seq[RelabelRule],
      dropInternalLabels: Boolean = true) {

    private def anchored(re: String) = s"^(?:$re)$$"

    private def get(df: DataFrame, label: String): Column =
      if (label == NameLabel) col("name")
      else coalesce(col("labels").getItem(label), lit(""))

    private def joined(df: DataFrame, r: RelabelRule): Column =
      if (r.sourceLabels.isEmpty) lit("")
      else concat_ws(r.separator, r.sourceLabels.map(get(df, _)): _*)

    private def setLabel(labels: Column, name: Column, v: Column): Column =
      Cols.let2(name, v) { (n, vv) =>
        map_concat(map_filter(labels, (k, _) => k =!= n), map(n, vv))
      }

    private def applyRule(df: DataFrame, r: RelabelRule): DataFrame = {
      val v = joined(df, r)
      r.action match {
        case "drop" => df.filter(!v.rlike(anchored(r.regex)))
        case "keep" => df.filter(v.rlike(anchored(r.regex)))
        case "dropequal" => df.filter(!(get(df, r.targetLabel) === v))
        case "keepequal" => df.filter(get(df, r.targetLabel) === v)
        case "dropmetric" =>
          df.filter(!col("name").isin(r.matchList.toSeq: _*))
        case "lowercase" => setOrName(df, lit(r.targetLabel), lower(v))
        case "uppercase" => setOrName(df, lit(r.targetLabel), upper(v))
        case "hashmod" =>
          // md5 LAST 8 bytes as uint64 % modulus (Relabel.cpp:197-208);
          // decimal(20,0) carries the full unsigned range
          val h = pmod(
            conv(substring(md5(v.cast("binary")), 17, 16), 16, 10)
              .cast("decimal(20,0)"),
            lit(r.modulus).cast("decimal(20,0)")).cast("string")
          setOrName(df, lit(r.targetLabel), h)
        case "replace" =>
          val matches = v.rlike(r.regex) // search, not match
          // both the target label NAME and the result go through the
          // same first-only substitution (Relabel.cpp:179-180)
          val target = firstOnlyReplace(v, r.regex, r.targetLabel)
          val res = firstOnlyReplace(v, r.regex, r.replacement)
          // no match → no-op; empty result → delete target label
          val labels0 = col("labels")
          val newLabels = when(!matches, labels0)
            .otherwise(Cols.let2(target, res) { (t, rr) =>
              when(t === NameLabel, labels0)
                .when(rr === "", map_filter(labels0, (k, _) => k =!= t))
                .otherwise(map_concat(
                  map_filter(labels0, (k, _) => k =!= t), map(t, rr)))
            })
          val newName = when(matches && target === NameLabel && res =!= "",
            res).otherwise(col("name"))
          df.withColumn("__labels_next__", newLabels)
            .withColumn("name", newName)
            .withColumn("labels", col("__labels_next__"))
            .drop("__labels_next__")
        case "labelmap" =>
          // every label whose NAME matches gets a copy under the
          // replaced name (original kept unless overwritten)
          val ents = map_entries(col("labels"))
          val renamed = transform(
            filter(ents, e => e.getField("key").rlike(anchored(r.regex))),
            e => struct(
              regexp_replace(e.getField("key"), r.regex, r.replacement)
                .as("key"),
              e.getField("value").as("value")))
          val newKeys = transform(renamed, _.getField("key"))
          df.withColumn("labels", map_from_entries(concat(
            filter(ents, e => !array_contains(newKeys, e.getField("key"))),
            renamed)))
        case "labeldrop" =>
          df.withColumn("labels",
            map_filter(col("labels"), (k, _) => !k.rlike(anchored(r.regex))))
        case "labelkeep" =>
          df.withColumn("labels",
            map_filter(col("labels"), (k, _) => k.rlike(anchored(r.regex))))
        case other =>
          throw new IllegalArgumentException(s"unknown relabel action '$other'")
      }
    }

    /** lowercase/uppercase/hashmod write to targetLabel; targetLabel
      * `__name__` rewrites the name column instead. */
    private def setOrName(df: DataFrame, target: Column, v: Column): DataFrame =
      df.withColumn("name",
        when(target === NameLabel, v).otherwise(col("name")))
        .withColumn("labels",
          when(target === NameLabel, col("labels"))
            .otherwise(setLabel(col("labels"), target, v)))

    def apply(df: DataFrame): DataFrame = {
      val out = rules.foldLeft(df)(applyRule)
      if (dropInternalLabels)
        out.withColumn("labels",
          map_filter(col("labels"), (k, _) => !k.startsWith("__")))
      else out
    }
  }
}
