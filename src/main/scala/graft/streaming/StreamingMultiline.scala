package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.AggOps
import graft.ops.AggOps.MultilineState

/** Streaming multiline assembly — the mode the reference actually runs:
  * a tailing reader feeds partial files, and an open record must carry
  * across reads until its closing line (or a flush timeout) arrives
  * (`ProcessorSplitMultilineLogStringNative.cpp` driven by
  * `LogFileReader`'s incremental buffers; flush timeout
  * `FlushTimeoutValidToken` semantics).
  *
  * Implementation: `flatMapGroupsWithState` keyed by the source (file
  * path / conv id); each micro-batch's lines run through the SAME
  * automaton as the batch operator ([[AggOps.MultilineFsm]] — one
  * transition function, zero semantic drift), emitted records leave the
  * state, the open chunk stays in it. `flushAfter` (processing-time
  * timeout) force-flushes an idle key's open chunk exactly like the
  * reference's multiline timeout: matched when no end pattern is
  * configured, unmatched-per-line otherwise.
  *
  * Scale shape: state per key = the one open chunk (bounded by record
  * size, not stream length), hash-partitioned across executors.
  *
  * Lines must arrive key-ordered across batches (a tailing file source
  * appends monotonically); within a batch they are sorted by
  * `orderCol`.
  */
object StreamingMultiline {

  def apply(df: DataFrame,
      startPattern: Option[String] = None,
      continuePattern: Option[String] = None,
      endPattern: Option[String] = None,
      keyCol: String = "__source__",
      orderCol: String = "line_no",
      textCol: String = "text",
      discardUnmatched: Boolean = false,
      flushAfter: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    implicit val stateEnc: Encoder[MultilineState] =
      Encoders.product[MultilineState]

    val stepper = AggOps.MultilineFsm(startPattern, continuePattern,
      endPattern, discardUnmatched)
    val timeoutConf = flushAfter.map(_ =>
      GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)

    val keyed = df.select(col(keyCol).cast("string"),
        col(orderCol).cast("long"), col(textCol).cast("string"))
      .as[(String, Long, String)]
      .groupByKey(_._1)

    val out = keyed.flatMapGroupsWithState[MultilineState,
      (String, Long, Long, Long, String)](
      OutputMode.Append, timeoutConf) {
      (key: String, rows: Iterator[(String, Long, String)],
          state: GroupState[MultilineState]) =>
        if (state.hasTimedOut) {
          // idle-key flush: emit the open chunk per the EOF rule. The
          // post-flush state (empty chunk, ADVANCED segment counter) is
          // kept — with a RE-ARMED timeout — so segment ids stay unique
          // per key across flushes. A key that times out AGAIN with
          // nothing open (bare counter, one full extra interval idle) is
          // REMOVED: under high key churn (file rotation) the store
          // would otherwise grow one entry per key ever seen, forever.
          // Segment ids restart for a key idle that long — the same
          // trade the reference makes when a rotated reader is reaped.
          val (recs, st1) = state.getOption
            .map(stepper.flushWithState)
            .getOrElse((Vector.empty, stepper.initial))
          if (recs.isEmpty) state.remove()
          else {
            state.update(st1)
            flushAfter.foreach(state.setTimeoutDuration)
          }
          recs.iterator.map(r => (key, r.segment, r.first, r.nLines, r.text))
        } else {
          val st0 = state.getOption.getOrElse(stepper.initial)
          val lines = rows.toArray.sortBy(_._2).iterator
            .map { case (_, i, t) => (i, t) }
          val (recs, st1) = stepper.run(st0, lines)
          state.update(st1)
          flushAfter.foreach(state.setTimeoutDuration)
          recs.iterator.map(r => (key, r.segment, r.first, r.nLines, r.text))
        }
    }.toDF(keyCol, "segment", "first_turn", "n_lines", "merged_text")
    out
  }
}
