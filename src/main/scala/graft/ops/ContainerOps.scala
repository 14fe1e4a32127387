package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Container stdout/stderr parsing — the single most common real-world
  * input shape for the reference collector (every k8s node): containerd
  * CRI text lines and Docker json-file lines, plus the partial-line
  * ("P"/"F" flag) merge.
  *
  * Reference: `core/plugin/processor/inner/
  * ProcessorParseContainerLogNative.cpp:180-256` (CRI),
  * `:425-520` (docker json), and the flag-merge
  * `ProcessorMergeMultilineLogNative.cpp:112-159` (MergeLogsByFlag).
  * Both parsers are pure Catalyst projections; the merge is two window
  * prefix-sums + one hash aggregation — fully distributed, no FSM needed
  * (a record boundary is any non-partial line, locally decidable).
  */
object ContainerOps {

  /** Output keys, matching the reference's field names
    * (ProcessorParseContainerLogNative.cpp:42-44). */
  val TimeKey = "_time_"
  val SourceKey = "_source_"
  val ContentKey = "content"
  /** Carries the reference's `P` flag as a boolean column (the
    * reference stores an empty `P` content entry and group metadata). */
  val PartialKey = "__partial__"

  /** Containerd CRI text: `time SP stream SP [P|F SP] content`.
    *
    * Faithful corner cases (cpp:180-256):
    *  - no 2nd space, or stream ∉ {stdout, stderr} → parse failure
    *    (row kept with null fields iff `keepingSourceWhenParseFail`,
    *    else dropped);
    *  - the P/F flag only counts when it is a SINGLE char followed by a
    *    space ("…stdout P" → content "P"; "…stdout PP 1" → content
    *    "PP 1");
    *  - `F` closes, `P` marks the row partial (merged by
    *    [[mergeByFlag]]);
    *  - `ignoringStdout` / `ignoringStderr` drop successfully-parsed
    *    rows of that stream.
    */
  final case class CriParser(
      sourceKey: String = "text",
      ignoringStdout: Boolean = false,
      ignoringStderr: Boolean = false,
      keepingSourceWhenParseFail: Boolean = true) {

    /** One anchored pass; the optional-flag group participates only for
      * a lone P/F token followed by a space. */
    val regex = "^([^ ]*) (stdout|stderr) (?:([PF]) )?(.*)$"

    def apply(df: DataFrame): DataFrame = {
      val src = col(sourceKey)
      val ok = src.isNotNull && src.rlike(regex)
      val packed = graft.functions.Cols.packGroups(src, regex, 4)
      val g = "__cri_groups__"
      val parsed = df
        .withColumn(g, when(ok, packed))
        .withColumn(TimeKey, element_at(col(g), 1))
        .withColumn(SourceKey, element_at(col(g), 2))
        .withColumn(PartialKey,
          coalesce(element_at(col(g), 3) === "P", lit(false)))
        .withColumn(ContentKey, element_at(col(g), 4))
        .drop(g)
      val kept =
        if (keepingSourceWhenParseFail) parsed
        else parsed.filter(ok)
      val noOut = if (ignoringStdout)
        kept.filter(!(col(SourceKey) <=> lit("stdout"))) else kept
      if (ignoringStderr)
        noOut.filter(!(col(SourceKey) <=> lit("stderr"))) else noOut
    }
  }

  /** Docker json-file line: `{"log":…,"stream":…,"time":…}`.
    *
    * The reference hand-parses EXACTLY these three fields, each of which
    * must be a string value (cpp:355-465: every value must open with
    * `"`, every key must be one of log/stream/time, logTypeCnt must
    * reach 3) — so `"log":1`, a missing/renamed key, or an extra key is
    * a parse failure, not a coercion. One `try_parse_json` +
    * `schema_of_variant` equality reproduces that strictness (the
    * variant schema lists keys alphabetically, matching the reference's
    * key-order-insensitive loop). A complete docker line carries ONE
    * trailing `\n` in `log`, stripped (cpp:512-515). stream ∉
    * {stdout, stderr} → parse failure, same keep/drop contract as CRI.
    */
  final case class DockerJsonParser(
      sourceKey: String = "text",
      ignoringStdout: Boolean = false,
      ignoringStderr: Boolean = false,
      keepingSourceWhenParseFail: Boolean = true) {

    /** The only variant shape the reference parser accepts. */
    val strictSchema = "OBJECT<log: STRING, stream: STRING, time: STRING>"

    def apply(df: DataFrame): DataFrame = {
      val src = col(sourceKey)
      val g = "__dj__"
      // variant parsed once into a named column (CollapseProject keeps
      // multi-use non-cheap projections single-eval); all field gets +
      // the type check walk the variant binary without re-parsing
      val parsed = df.withColumn(g, try_parse_json(src))
      val pv = col(g)
      def f(name: String) = try_variant_get(pv, "$." + name, "string")
      // try_parse_json accepts trailing garbage after the first object;
      // the reference requires the line to BE the object — first byte
      // `{`, last byte `}`, nothing outside (ParseDockerLog cpp:356-375,
      // no trimming). A strings-aware whole-line regex enforces that:
      // outside quoted strings no brace may appear, so a second object
      // or trailing junk cannot slip past (nested-object values fail
      // the regex AND the strict schema — consistent).
      val wholeObject =
        src.rlike("\\A\\{(?:[^{}\"]|\"(?:[^\"\\\\]|\\\\.)*\")*\\}\\z")
      val ok = schema_of_variant(pv) === strictSchema &&
        f("stream").isin("stdout", "stderr") && wholeObject
      val out = parsed
        .withColumn(TimeKey, when(ok, f("time")))
        .withColumn(SourceKey, when(ok, f("stream")))
        .withColumn(ContentKey,
          when(ok, regexp_replace(f("log"), "\\n\\z", "")))
        .drop(g)
      val kept =
        if (keepingSourceWhenParseFail) out
        else out.filter(ok)
      val noOut = if (ignoringStdout)
        kept.filter(!(col(SourceKey) <=> lit("stdout"))) else kept
      if (ignoringStderr)
        noOut.filter(!(col(SourceKey) <=> lit("stderr"))) else noOut
    }
  }

  /** Merge partial lines by flag (MergeLogsByFlag, cpp:112-159): a run
    * of partial rows plus the FIRST following full row is one record —
    * contents concatenated WITHOUT a separator (partials are split
    * mid-line, MergeEvents called with insertLineBreak=false); a
    * trailing partial run at end-of-source still merges. Time/stream of
    * the record = the first line's.
    *
    * Distributed shape: the record id is a prefix sum (number of FULL
    * rows strictly before the current row in (keyCol, orderCol) order),
    * so the whole merge is one window + one hash aggregation — no
    * sequential state, safe at any scale.
    */
  def mergeByFlag(df: DataFrame,
      keyCol: String = "conv_id",
      orderCol: String = "turn_idx",
      contentCol: String = ContentKey,
      partialCol: String = PartialKey): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rec = coalesce(
      sum(when(col(partialCol), 0).otherwise(1)).over(w), lit(0L))
    // content assembly: collect_list over an ORDERED full-frame window
    // (elements come out in partition-sort order), NOT
    // array_sort(collect_list(struct))+transform — CLAUDE.md documents
    // that shape as result-unstable, and this column feeds a
    // hash-verified oracle query
    val wRec = Window.partitionBy(col(keyCol), col("__rec__"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.withColumn("__rec__", rec)
      .withColumn("__rec_content__",
        array_join(collect_list(col(contentCol)).over(wRec), ""))
      .groupBy(col(keyCol), col("__rec__").as("record"))
      .agg(
        min(col(orderCol)).as("first_turn"),
        count(lit(1)).as("n_lines"),
        min_by(col(TimeKey), col(orderCol)).as("time_first"),
        min_by(col(SourceKey), col(orderCol)).as("source"),
        // every row in the record carries the identical windowed value
        first(col("__rec_content__")).as(contentCol))
  }
}
