package graft.sink

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Per-plugin self-monitor counters — the reference instruments every
  * processor with event counters and asserts them in each unittest
  * (`pkg/pipeline/self_metrics.go` counter model; counter names
  * `core/monitor/metric_constants/PluginMetrics.cpp`:
  * `in_events_total`, `out_events_total`, `discarded_events_total`,
  * `out_successful_events_total`, `out_failed_events_total`;
  * increments e.g. `ProcessorParseRegexNative.cpp:146-161`).
  *
  * Spark-first shape: `Dataset.observe` — a `CollectMetrics` node per
  * stage boundary. The counters ride the SAME action that materializes
  * the pipeline (zero extra passes, zero extra shuffles); each stage's
  * `in_events_total` is the previous boundary's row count, so one
  * observe per stage suffices.
  *
  * `out_successful/out_failed` need per-row parse status; rather than
  * threading marker columns through every operator, the instrumentation
  * takes an optional per-stage success predicate derived from the
  * stage's declared config (for a parse stage: "first declared output
  * key extracted") — exact for the reference's regex/delimiter
  * processors, a documented proxy for free-schema JSON/KV parses.
  */
object StageMetrics {

  /** What the instrumentation knows about a configured stage. */
  final case class StageInfo(
      kind: String,
      successKey: Option[String] = None)

  /** One stage's counters, reference names. */
  final case class StageCounters(
      index: Int,
      kind: String,
      counters: Map[String, Long])

  /** The observed pipeline: run ONE action on `df` (write, count,
    * localCheckpoint), then read `counters`. An Observation binds to a
    * single query execution — instrument again for a second run. */
  final case class Observed(
      df: DataFrame,
      input: Observation,
      stages: Seq[(StageInfo, Observation)]) {

    /** Blocking: call AFTER an action on `df` has completed. */
    def counters: Seq[StageCounters] = {
      def outOf(o: Observation): (Long, Option[Long]) = {
        val m = o.get
        (m("out_events_total").asInstanceOf[Long],
          m.get("out_successful_events_total").map(_.asInstanceOf[Long]))
      }
      var prevOut = outOf(input)._1
      stages.zipWithIndex.map { case ((info, o), i) =>
        val (out, successful) = outOf(o)
        val in = prevOut
        prevOut = out
        // an expanding stage (explode) emits more rows than it takes;
        // there discarded clamps to 0 and in/out carry the fan-out
        val base = Map(
          "in_events_total" -> in,
          "out_events_total" -> out,
          "discarded_events_total" -> math.max(in - out, 0L))
        val parseCounters = successful.fold(Map.empty[String, Long])(s =>
          Map("out_successful_events_total" -> s,
            "out_failed_events_total" -> (out - s)))
        StageCounters(i, info.kind, base ++ parseCounters)
      }
    }
  }

  /** Thread `df` through `stages`, observing every boundary. */
  def instrument(
      df: DataFrame,
      stages: Seq[(StageInfo, DataFrame => DataFrame)]): Observed = {
    val input = Observation("graft_stage_input")
    var d = df.observe(input, count(lit(1)).as("out_events_total"))
    val observed = stages.zipWithIndex.map { case ((info, fn), i) =>
      val o = Observation(s"graft_stage_${i}_${info.kind}")
      val aggs: Seq[Column] =
        count(lit(1)).as("out_events_total") +:
          info.successKey.toSeq.map(k =>
            count(when(col(k).isNotNull, 1))
              .as("out_successful_events_total"))
      d = fn(d).observe(o, aggs.head, aggs.tail: _*)
      (info, o)
    }
    Observed(d, input, observed)
  }
}
