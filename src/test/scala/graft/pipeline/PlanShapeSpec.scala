package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ops._
import graft.sources.Transcripts

/** Physical-plan shape assertions — the "would this survive 100×
  * scale-up" contract. Each test pins a plan property the 100 TB
  * deployment depends on, so a regression that silently inserts a
  * shuffle, drops a broadcast, or breaks codegen fails CI, not the
  * cluster. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def input = Transcripts.generate(spark, 200, seed = 5)

  test("parse+enrich+route is shuffle-free (broadcast joins only, no hash/range shuffle)") {
    val plan = physical(TranscriptPipeline(input))
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"routing pipeline must not shuffle:\n$plan")
  }

  test("parse+enrich+route stays inside WholeStageCodegen") {
    // AQE wraps the plan until execution; inspect the non-adaptive plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = physical(TranscriptPipeline(input))
      // "*(n)" prefixes mark WholeStageCodegen stages in plan text
      assert(plan.contains("*(1)"), s"expected codegen stage markers:\n$plan")
      assert(!plan.contains("ScalaUDF"), "no UDFs in the hot path")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dict enrich plans as BroadcastHashJoin, never SortMergeJoin") {
    val plan = physical(TranscriptPipeline.enrich(input))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("sink aggregates use partial (map-side) aggregation") {
    val plan = physical(TranscriptPipeline.aggregates(TranscriptPipeline(input)))
    assert(plan.contains("partial"), s"expected partial aggregate:\n$plan")
  }

  test("parquet scan prunes columns and pushes filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scan").toString
    input.write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("role") === "tool")
      .select("conv_id", "tool")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(role), EqualTo(role,tool)]"),
      s"filter must reach the scan:\n$plan")
    val readSchema = "ReadSchema: struct<conv_id:string,role:string,tool:string>"
    assert(plan.contains(readSchema),
      s"scan must read only needed columns:\n$plan")
  }

  test("brute-force ANN top-k plans as TakeOrderedAndProject (no global sort)") {
    val e = spark.range(100).select(
      col("id").as("vec_id"),
      array((0 until 8).map(i => rand(i)): _*).as("embedding"))
    val plan = physical(SimilarityOps.bruteForceTopK(
      e.filter(col("vec_id") =!= 0), e.filter(col("vec_id") === 0), 10))
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not sort globally:\n$plan")
  }

  test("ANN ranking has no unpartitioned Window operator (single-task funnel)") {
    val e = spark.range(100).select(
      col("id").as("vec_id"),
      array((0 until 8).map(i => rand(i)): _*).as("embedding"))
    val q = e.filter(col("vec_id") === 0)
    val plans = Seq(
      SimilarityOps.bruteForceTopK(e.filter(col("vec_id") =!= 0), q, 10),
      SimilarityOps.SignLsh(planes = 4, dims = 8).topK(e, q, 10))
      .map(physical)
    plans.foreach(p => assert(!p.contains("Window"),
      s"rank must not use a global Window:\n$p"))
  }

  test("salted repartition spreads a hot key across salt buckets") {
    // one conv_id with 512 rows (hot), others tiny
    val skewed = Transcripts.generate(spark, 998, seed = 1) // conv 0 and 997 are hot
    val salted = GroupOps.SaltedRepartition("conv_id", saltBuckets = 8)(skewed)
    assert(physical(salted).contains("Exchange hashpartitioning"),
      "salted repartition must shuffle on (key, salt)")
    // hot conv rows land in several distinct salt buckets
    val buckets = salted.filter(col("conv_id") === "conv-00000000")
      .select("__salt__").distinct().count()
    assert(buckets > 1, s"hot key must be split across salt buckets, got $buckets")
  }

  test("AQE skew-join settings are on in the runtime session builder") {
    val s = graft.GraftSession.builder(4).getOrCreate()
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
  }

  test("minhash candidate join shuffles on (band, bucket), not on doc pairs") {
    val docs = spark.range(50).select(col("id").as("doc_id"),
      concat_ws(" ", (1 to 12).map(i => concat(lit(s"w$i-"), pmod(col("id"), lit(7)))): _*).as("text"))
    val plan = physical(DedupOps.MinHashLSH(16, 4, 3).pairs(docs))
    // candidate generation is an equi-join (hash-partitioned), not a
    // nested-loop cross product
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"LSH join must be an equi-join:\n$plan")
  }

  test("paragraph dedup finds first occurrences with a partial aggregate, " +
    "never a window over the paragraph-hash partition") {
    val docs = spark.range(50).select(col("id").as("doc_id"),
      concat(lit("body-"), col("id"),
        lit("\n\nshared footer paragraph")).as("text"))
    val plan = physical(DedupOps.ParagraphDedup()(docs))
    // a Window partitioned by the hash would funnel every copy of a hot
    // boilerplate paragraph (billions at 100 TB) into ONE task; the
    // groupBy(hash).min combines map-side before the shuffle
    assert(!plan.contains("windowspecdefinition(__ph__"),
      s"hot-paragraph straggler shape:\n$plan")
    assert(plan.contains("partial_min"),
      s"expected partial (map-side) first-occurrence min aggregate:\n$plan")
  }

  test("decontamination broadcasts the benchmark side; the corpus is " +
    "never shuffled before the overlap aggregate") {
    val docs = spark.range(50).select(col("id").as("doc_id"),
      concat_ws(" ", (1 to 12).map(i =>
        concat(lit(s"w$i-"), pmod(col("id"), lit(7)))): _*).as("text"))
    val bench = spark.range(2).select(col("id").as("bench_id"),
      lit("w1-0 w2-0 w3-0 w4-0 w5-0 w6-0 w7-0 w8-0").as("text"))
    val plan = physical(DedupOps.Decontaminate(n = 8).pairs(docs, bench))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast:\n$plan")
    // the only hash exchange is the final (doc, bench) overlap count,
    // never a corpus-shingle shuffle feeding the join itself
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled to join:\n$plan")
  }
}
