package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Aggregates (SURVEY.md §2.10) — the reference's numeric "aggregation"
  * is counters per group; the north star asks for per-sink event counts
  * per conv_id / tool / time bucket and window functions over turn_idx
  * ordering. All built-in hash aggregation: Catalyst plans
  * partial (map-side) + final automatically, so a 10^12-row groupBy
  * shuffles only the partial aggregates, not rows.
  */
object AggOps {

  /** Per-sink counts per (conv_id, tool, time bucket). `date_trunc`
    * buckets (not `window()`) keep the output schema flat for
    * cross-engine verification; the streaming runner uses `window()`.
    */
  def sinkAggregates(
      df: DataFrame,
      sinkCol: String = "__sink__",
      bucket: String = "hour"): DataFrame =
    df.groupBy(
        col(sinkCol),
        col("tool"),
        date_trunc(bucket, col("ts")).as("bucket"))
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("conv_id")).as("n_convs"))

  /** Per-conversation ordered stats over the turn_idx ordering —
    * exercises the range-partition + in-partition sort contract
    * (aggregator_context parity, SURVEY.md §2.8). */
  def conversationStats(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    df.withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("turn_rank", row_number().over(w))
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        max(col("turn_idx")).as("max_turn"),
        sum(when(col("role") === col("prev_role"), 1).otherwise(0)).as("role_repeats"),
        min(col("ts")).as("started_at"),
        max(col("ts")).as("ended_at"))
  }

  /** Multiline re-segmentation: group consecutive turns of a conversation
    * into segments per the reference's Start/Continue/End pattern state
    * machine, then concatenate.
    * Reference: `core/plugin/processor/inner/
    * ProcessorSplitMultilineLogStringNative.cpp:130-295` (the per-group
    * scan), `core/file_server/MultilineOptions.h:29-44` (+ `.cpp:126-158`
    * config normalization), `ProcessorMergeMultilineLogNative.cpp`
    * (merge-back). Patterns are SEARCH semantics (BoostRegexSearch),
    * matching `rlike`.
    *
    * Valid combinations and their execution strategy:
    *  - start-only, end-only, start+continue: pure Catalyst window
    *    prefix-sums — fully distributed, no per-group state. (For
    *    start+continue, a line matching BOTH patterns is treated as a
    *    start; the reference's sequential scan would treat it as a
    *    continuation of an open record — disjoint patterns, the
    *    practical case, are exact.)
    *  - start+end, continue+end: the record boundary is genuinely
    *    sequential (idle↔partial automaton), so these run the faithful
    *    per-conversation FSM via `flatMapGroups` — conversations are the
    *    distribution unit, exactly the reference's one-file event group.
    *  - all three given → continue dropped; continue alone → ignored
    *    (reference normalization, MultilineOptions.cpp:126-158).
    *
    * Output: (convCol, segment, first_turn, n_lines, merged_text).
    * Matched segments get increasing positive ids in turn order;
    * unmatched lines follow `UnmatchedContentTreatment`: SINGLE_LINE
    * keeps each as its own segment with id `-turn-1` (discardUnmatched =
    * false), DISCARD drops them.
    */
  final case class MultilineMerge(
      startPattern: Option[String] = None,
      continuePattern: Option[String] = None,
      endPattern: Option[String] = None,
      convCol: String = "conv_id",
      orderCol: String = "turn_idx",
      textCol: String = "text",
      discardUnmatched: Boolean = false) {

    // Config normalization (MultilineOptions.cpp:126-158): S+C+E drops
    // the continue pattern; a lone continue pattern disables multiline.
    private val (startP, contP, endP) =
      (startPattern, continuePattern, endPattern) match {
        case (Some(s), Some(_), Some(e)) => (Some(s), None, Some(e))
        case (None, Some(_), None)       => (None, None, None)
        case other                       => other
      }

    def apply(df: DataFrame): DataFrame = (startP, contP, endP) match {
      case (Some(s), None, None)    => startOnly(df, s)
      case (None, None, Some(e))    => endOnly(df, e)
      case (Some(s), Some(c), None) => startContinue(df, s, c)
      case (Some(_), None, Some(_)) | (None, Some(_), Some(_)) => fsm(df)
      case _                        => passThrough(df)
    }

    private def w = Window.partitionBy(col(convCol)).orderBy(col(orderCol))

    private def merge(body: DataFrame): DataFrame =
      body.groupBy(col(convCol), col("__seg__").as("segment"))
        .agg(
          min(col(orderCol)).as("first_turn"),
          count(lit(1)).as("n_lines"),
          array_join(transform(
            array_sort(collect_list(struct(col(orderCol).as("i"), col(textCol).as("t")))),
            x => x.getField("t")), "\n").as("merged_text"))

    private def unmatchedOrDrop(flagged: DataFrame, isUnmatched: Column,
        matchedSeg: Column): DataFrame = {
      val body = if (discardUnmatched) flagged.filter(!isUnmatched)
        else flagged.withColumn("__seg__",
          when(isUnmatched, -col(orderCol).cast("long") - 1)
            .otherwise(matchedSeg))
      if (discardUnmatched) body.withColumn("__seg__", matchedSeg) else body
    }

    /** New record at each start match; anything until the next start
      * appends; prefix lines before the first start are unmatched. */
    private def startOnly(df: DataFrame, s: String): DataFrame = {
      val flagged = df
        .withColumn("__start__", when(col(textCol).rlike(s), 1).otherwise(0))
        .withColumn("__run__", sum(col("__start__")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      merge(unmatchedOrDrop(flagged, col("__run__") === 0, col("__run__")))
    }

    /** Everything up to AND INCLUDING an end-matching line is one
      * record; lines after the last end (partial at EOF) are unmatched
      * (end-only mode, ProcessorSplitMultilineLogStringNative.cpp:
      * 162-167,232-246,289-307). */
    private def endOnly(df: DataFrame, e: String): DataFrame = {
      val flagged = df
        .withColumn("__end__", when(col(textCol).rlike(e), 1).otherwise(0))
        .withColumn("__lagseg__", coalesce(sum(col("__end__")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("__tot__",
          sum(col("__end__")).over(Window.partitionBy(col(convCol))))
      merge(unmatchedOrDrop(flagged, col("__lagseg__") === col("__tot__"),
        col("__lagseg__") + 1))
    }

    /** A start line opens a record; the maximal run of continue lines
      * after it appends; the first other line closes it (that line is a
      * new start, or unmatched — as are later continue lines with no
      * open record). */
    private def startContinue(df: DataFrame, s: String, c: String): DataFrame = {
      val flagged = df
        .withColumn("__start__", when(col(textCol).rlike(s), 1).otherwise(0))
        .withColumn("__cont__", when(col(textCol).rlike(c), 1).otherwise(0))
        .withColumn("__run__", sum(col("__start__")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // within a run: any non-start non-continue line poisons the rest
      val wSeg = Window.partitionBy(col(convCol), col("__run__"))
        .orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bad = sum(when(col("__start__") === 1 || col("__cont__") === 1, 0)
        .otherwise(1)).over(wSeg)
      val withBad = flagged.withColumn("__bad__", bad)
      merge(unmatchedOrDrop(withBad,
        col("__run__") === 0 || col("__bad__") > 0, col("__run__")))
    }

    /** No multiline config: every line is its own (matched) record. */
    private def passThrough(df: DataFrame): DataFrame =
      df.select(col(convCol),
        (col(orderCol).cast("long") + 1).as("segment"),
        col(orderCol).as("first_turn"),
        lit(1L).as("n_lines"),
        col(textCol).as("merged_text"))

    /** Faithful sequential automaton for the start+end / continue+end
      * combinations (idle↔partial with chunk emission on the END line,
      * EOF-partial handled as unmatched), one conversation per group.
      * State is one conversation's lines — the same in-memory unit the
      * reference holds as a PipelineEventGroup. */
    private def fsm(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val (sOpt, cOpt, eOpt) = (startP, contP, endP)
      val discard = discardUnmatched
      val proj = df.select(col(convCol).cast("string"),
        col(orderCol).cast("long"), col(textCol).cast("string"))
        .as[(String, Long, String)]
      val out = proj.groupByKey(_._1).flatMapGroups { (conv, it) =>
        val sRe = sOpt.map(java.util.regex.Pattern.compile)
        val cRe = cOpt.map(java.util.regex.Pattern.compile)
        val eRe = eOpt.map(java.util.regex.Pattern.compile)
        def m(p: Option[java.util.regex.Pattern], t: String): Boolean =
          p.exists(_.matcher(if (t == null) "" else t).find())
        val lines = it.toArray.sortBy(_._2)
        val res = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, Long, Long, String)]
        var nextSeg = 1L
        val chunk = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
        def emitMatched(): Unit = {
          res += ((conv, nextSeg, chunk.head._1, chunk.length.toLong,
            chunk.map(l => if (l._2 == null) "" else l._2).mkString("\n")))
          nextSeg += 1; chunk.clear()
        }
        def emitUnmatched(): Unit = {
          if (!discard) chunk.foreach { case (i, t) =>
            res += ((conv, -i - 1, i, 1L, if (t == null) "" else t))
          }
          chunk.clear()
        }
        var partial = false
        lines.foreach { case (_, idx, text) =>
          if (!partial) {
            // idle: a start (or, in continue+end mode, continue) opens;
            // a lone end line in continue+end mode is its own record
            if (m(sRe, text) || (sRe.isEmpty && m(cRe, text))) {
              chunk += ((idx, text)); partial = true
            } else if (sRe.isEmpty && cRe.nonEmpty && m(eRe, text)) {
              chunk += ((idx, text)); emitMatched()
            } else { chunk += ((idx, text)); emitUnmatched() }
          } else if (cRe.nonEmpty && m(cRe, text)) {
            chunk += ((idx, text)) // continue appends, stays partial
          } else if (m(eRe, text)) {
            chunk += ((idx, text)); emitMatched(); partial = false
          } else if (cRe.nonEmpty) {
            // continue+end: a non-continue non-end line fails the whole
            // open chunk including itself (cpp:206-228)
            chunk += ((idx, text)); emitUnmatched(); partial = false
          } else {
            chunk += ((idx, text)) // start+end: anything accumulates
          }
        }
        // EOF with an end pattern configured: partial chunk is unmatched
        if (chunk.nonEmpty) emitUnmatched()
        res.iterator
      }
      // restore the INPUT's conv/order column types (the typed FSM ran
      // over strings/longs) so FSM and window modes emit one schema
      out.toDF(convCol, "segment", "first_turn", "n_lines", "merged_text")
        .withColumn(convCol, col(convCol).cast(df.schema(convCol).dataType))
        .withColumn("first_turn",
          col("first_turn").cast(df.schema(orderCol).dataType))
    }
  }

  object MultilineMerge {
    /** Start-pattern-only mode (the common config). */
    def apply(startPattern: String): MultilineMerge =
      MultilineMerge(startPattern = Some(startPattern))
    def apply(startPattern: String, discardUnmatched: Boolean): MultilineMerge =
      MultilineMerge(startPattern = Some(startPattern),
        discardUnmatched = discardUnmatched)
  }

  /** Time-window counts via `window()` (streaming-compatible shape). */
  def windowCounts(df: DataFrame, duration: String = "5 minutes"): DataFrame =
    df.groupBy(window(col("ts"), duration), col("tool"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("tool"), col("n"))
}
