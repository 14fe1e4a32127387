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
    * into segments opened by `startPattern`, then concatenate.
    * Reference: `core/plugin/processor/inner/
    * ProcessorSplitMultilineLogStringNative.cpp:162-187` (start-pattern
    * mode) and `ProcessorMergeMultilineLogNative.cpp` (merge-back).
    *
    * segment id = running count of start-flags over the per-conversation
    * turn order; unmatched prefix rows (segment 0 with no start) follow
    * `UnmatchedContentTreatment`: single-line (kept as their own
    * segment) or discard.
    */
  final case class MultilineMerge(
      startPattern: String,
      convCol: String = "conv_id",
      orderCol: String = "turn_idx",
      textCol: String = "text",
      discardUnmatched: Boolean = false) {
    def apply(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col(convCol)).orderBy(col(orderCol))
      val flagged = df
        .withColumn("__start__", when(col(textCol).rlike(startPattern), 1).otherwise(0))
        .withColumn("__seg__", sum(col("__start__")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // Unmatched prefix (segment 0, before any start match):
      // SINGLE_LINE treatment keeps each such line as its own segment
      // (reference UnmatchedContentTreatment, ProcessorSplitMultiline-
      // LogStringNative.cpp:162-187); DISCARD drops them.
      val body = if (discardUnmatched) flagged.filter(col("__seg__") > 0)
        else flagged.withColumn("__seg__",
          when(col("__seg__") === 0, -col(orderCol).cast("long") - 1)
            .otherwise(col("__seg__")))
      // Bounded state: segments are capped by conversation length; the
      // sort_array(collect_list(struct)) stays within one group.
      body.groupBy(col(convCol), col("__seg__").as("segment"))
        .agg(
          min(col(orderCol)).as("first_turn"),
          count(lit(1)).as("n_lines"),
          array_join(transform(
            array_sort(collect_list(struct(col(orderCol).as("i"), col(textCol).as("t")))),
            x => x.getField("t")), "\n").as("merged_text"))
    }
  }

  /** Time-window counts via `window()` (streaming-compatible shape). */
  def windowCounts(df: DataFrame, duration: String = "5 minutes"): DataFrame =
    df.groupBy(window(col("ts"), duration), col("tool"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("tool"), col("n"))
}
