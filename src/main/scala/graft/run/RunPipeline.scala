package graft.run

import org.apache.spark.sql.SparkSession
import graft.sink.TableIO
import graft.sources.Transcripts

/** spark-submit entry point for the batch pipeline job:
  *
  * {{{
  * spark-submit --class graft.run.RunPipeline <jar> \
  *   <inputParquetDir|synthetic:N> <sinkRoot> <runId> [numBuckets]
  * }}}
  *
  * The same invocation works on a real cluster (`--master yarn/k8s`,
  * any executor count) and on local[N] — the job carries no
  * local-mode assumptions: parallelism comes from the scan and the
  * configured shuffle partitions, resume state lives in the sink-root
  * lineage table, and re-running the same runId after any failure
  * completes exactly the missing (sink, bucket) partitions
  * ([[PipelineRunner]]).
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: RunPipeline <inputDir|synthetic:N> <sinkRoot> <runId> [numBuckets]")
    val Array(input, sinkRoot, runId) = args.take(3)
    val numBuckets = args.lift(3).map(_.toInt).getOrElse(32)

    val builder = SparkSession.builder()
      .appName(s"graft-pipeline-$runId")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit provides the master; fall back to local[N] when run
    // directly (sbt runMain)
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master("local[" +
        sys.env.getOrElse("SPARK_GRAFT_CPUS",
          Runtime.getRuntime.availableProcessors.toString) + "]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df =
      if (input.startsWith("synthetic:"))
        Transcripts.generate(spark, input.stripPrefix("synthetic:").toLong)
      else spark.read.parquet(input)

    val result = PipelineRunner.run(df, TableIO(sinkRoot), runId,
      numBuckets = numBuckets)
    println(s"""{"runId":"${result.runId}","bucketsWritten":${result.bucketsWritten},"complete":${result.complete}}""")
    spark.stop()
  }
}
