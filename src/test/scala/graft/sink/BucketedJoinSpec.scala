package graft.sink

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.sources.Transcripts

/** Bucketed tables give exchange-free co-located joins — the at-rest
  * shard-hash contract (north star: "bucketing for co-located joins").
  * Also evidences AQE skew-join splitting on a hot key. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("join of two conv_id-bucketed tables plans with NO shuffle exchange") {
    val dir = Files.createTempDirectory("graft-bucket").toString
    val io = TableIO(dir)
    val t = Transcripts.generate(spark, 200, seed = 13)
    io.writeBucketed(t, "turns", 8, Seq("conv_id"), Seq("conv_id", "turn_idx"))
    val stats = t.groupBy("conv_id").count()
    io.writeBucketed(stats, "conv_stats", 8, Seq("conv_id"))

    val a = io.readBucketed(spark, "turns")
    val b = io.readBucketed(spark, "conv_stats")
    val joined = a.join(b, "conv_id")
    // correctness
    assert(joined.count() == t.count())
    // no shuffle before the join: bucketing co-locates both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-class join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not re-shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("AQE splits the skewed join partition for a hot conv_id") {
    // force tiny skew thresholds so the 512-turn hot conversation
    // triggers AQE's skew-join splitting on this small fixture
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // Both join inputs must be MATERIALIZED tables: OptimizeSkewedJoin
      // only matches sort-over-shuffle on both sides, so a join against
      // an un-materialized aggregate (Sort→HashAggregate→shuffle) is
      // not split — exactly why the 100 TB design writes conv-level
      // dims to storage before the big join. The payload is per-row
      // hash text: AQE sizes partitions by COMPRESSED shuffle bytes, so
      // constant payloads would vanish.
      val dir = Files.createTempDirectory("graft-skew").toString
      val hot = spark.range(50000).select(lit("conv-hot").as("conv_id"),
        col("id").cast("int").as("turn_idx"),
        concat(md5(col("id").cast("string").cast("binary")),
          sha2(col("id").cast("string").cast("binary"), 256),
          md5(concat(col("id"), lit("s")).cast("binary"))).as("payload"))
      val cold = spark.range(100).select(
        concat(lit("conv-"), col("id")).as("conv_id"),
        lit(0).as("turn_idx"), lit("y").as("payload"))
      hot.unionByName(cold).write.parquet(s"$dir/turns")
      spark.read.parquet(s"$dir/turns").groupBy("conv_id")
        .agg(count(lit(1)).as("n_turns")).write.parquet(s"$dir/stats")

      val t = spark.read.parquet(s"$dir/turns")
      val joined = t.join(spark.read.parquet(s"$dir/stats"), "conv_id")
      // execute THIS dataset's own query execution so its AQE plan
      // finalizes (count() would spawn a separate execution)
      assert(joined.queryExecution.toRdd.count() == t.count())
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"),
        s"expected AQE skew-split markers in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
