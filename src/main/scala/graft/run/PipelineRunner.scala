package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.AggOps
import graft.pipeline.TranscriptPipeline
import graft.sink.{FanOutWriter, Metrics, TableIO}

/** Batch job entry: transcripts → parse → enrich → route → resumable
  * fan-out write → per-sink aggregates (the full north-star pipeline as
  * one run).
  *
  * Resume contract: `run(runId)` may be invoked any number of times
  * after any partial failure; completed (sink, bucket) partitions are
  * skipped via the lineage table, incomplete ones are idempotently
  * re-overwritten. After the data write completes, the aggregates table
  * is recomputed FROM THE DURABLY WRITTEN routed table (not the input),
  * so aggregates always reflect exactly what the sinks contain.
  */
object PipelineRunner {

  final case class RunResult(runId: String, bucketsWritten: Int,
    complete: Boolean)

  def run(input: DataFrame, io: TableIO, runId: String,
      numBuckets: Int = 32, maxBuckets: Int = Int.MaxValue,
      aggBucket: String = "hour"): RunResult = {
    val spark = input.sparkSession
    val routed = TranscriptPipeline(input)
    // sink set declared statically from the router rules: the fan-out
    // writer enumerates candidate partitions with NO extra data scan
    val sinkNames = (TranscriptPipeline.router.rules.map(_.sink) :+
      TranscriptPipeline.router.defaultSink).distinct
    val writer = FanOutWriter(io, numBuckets = numBuckets, sinks = sinkNames)

    val written = writer.write(routed, runId, maxBuckets)

    if (maxBuckets == Int.MaxValue) {
      // aggregates + self-metrics from the durably written table
      val back = io.read(spark, writer.table)
      val aggs = AggOps.sinkAggregates(back, bucket = aggBucket)
      io.overwrite(aggs, "sink_aggregates")
      if (written > 0) Metrics.record(io, runId, back)
      RunResult(runId, written, complete = true)
    } else RunResult(runId, written, complete = false)
  }
}
