package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.pipeline.TranscriptPipeline
import graft.sink.{FanOutWriter, TableIO}

/** Structured-Streaming variant of the pipeline (SURVEY.md §2.11).
  *
  * The reference is wall-clock micro-batched (3 s sink flush,
  * `FlusherSLS.cpp:46`; Go flush timer `plugin_runner_v1.go:189`) with
  * no event-time semantics — the exact shape of Spark's
  * processing-time-trigger + `foreachBatch`. Each micro-batch reuses
  * THE SAME batch operators and the same resumable fan-out writer, with
  * the micro-batch id folded into the lineage run id: a replayed batch
  * (at-least-once source) re-overwrites its own (sink, bucket)
  * partitions — idempotent, so end-to-end effectively-once, mirroring
  * the reference's range-checkpoint design
  * (`ExactlyOnceQueueManager.h:41-56`) with the streaming checkpoint
  * taking the role of the file-offset checkpoint
  * (`CheckPointManager.h:40-52`).
  */
object StreamingRunner {

  /** parse→enrich→route on a streaming DataFrame — identical plan to
    * batch (the operators are all stateless projections/joins). */
  def routed(stream: DataFrame): DataFrame =
    TranscriptPipeline(stream)

  /** Fan-out sink via foreachBatch + the resumable writer. */
  def fanOutWriter(stream: DataFrame, io: TableIO, runPrefix: String,
      numBuckets: Int = 32,
      trigger: Trigger = Trigger.ProcessingTime("3 seconds"),
      checkpoint: Option[String] = None): DataStreamWriter[Row] = {
    val writer = FanOutWriter(io, numBuckets = numBuckets,
      extraPartCols = Seq("__batch__"),
      sinks = (TranscriptPipeline.router.rules.map(_.sink) :+
        TranscriptPipeline.router.defaultSink).distinct)
    val w = routed(stream).writeStream
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writer.write(batch.withColumn("__batch__", lit(batchId)),
          s"$runPrefix-$batchId",
          extraPartValues = Map("__batch__" -> batchId)): Unit
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c))
  }

  /** Event-time per-sink aggregates with watermarked 5-minute windows —
    * the north star's time-bucket counts as a streaming query. (The
    * reference has no event-time windows; this is the Spark-native
    * extension point, trivially added because the batch aggregate is
    * declarative.) */
  def windowedAggregates(stream: DataFrame, watermark: String = "1 hour",
      bucket: String = "5 minutes"): DataFrame =
    routed(stream)
      .withWatermark("ts", watermark)
      .groupBy(col("__sink__"), window(col("ts"), bucket), col("tool"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("__sink__"), col("window.start").as("bucket"),
        col("tool"), col("n_events"))
}
