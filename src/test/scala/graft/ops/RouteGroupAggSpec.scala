package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession._

class RouteGroupAggSpec extends AnyFunSuite {

  private def roles = {
    val s = spark; import s.implicits._
    Seq("assistant", "tool", "system", "user", "weird")
      .zipWithIndex.map { case (r, i) => (r, i) }.toDF("role", "i")
  }

  test("logstore router: anchored first-match-wins, default, drop") {
    import RouteOps._
    val router = LogstoreRouter("role", Seq(
      Rule("assistant", "a"),
      Rule("tool|system", "t"),
      Rule("t.*", "never")), defaultSink = "dflt")
    val got = collectMaps(router(roles)).map(m => m("role") -> m("__sink__")).toMap
    assert(got == Map("assistant" -> "a", "tool" -> "t", "system" -> "t",
      "user" -> "dflt", "weird" -> "dflt"))
    // partial match must not route (anchoring): 'assistantX' -> default
    val s = spark; import s.implicits._
    val g2 = collectMaps(router(Seq(("assistantX", 0)).toDF("role", "i")))
    assert(g2.head("__sink__") == "dflt")
    // dropDisMatch drops non-matching rows
    val dropped = LogstoreRouter("role", Seq(Rule("assistant", "a")),
      dropDisMatch = true)(roles)
    assert(dropped.count() == 1)
  }

  test("multicast router: every matching condition gets a copy") {
    import RouteOps._
    val mc = MulticastRouter(Seq(
      "s1" -> col("role").startsWith("t"),
      "s2" -> (col("i") < 2),
      "s3" -> col("role").contains("z")))
    val exploded = mc.explodeSinks(roles)
    // tool matches s1+s2 (2 copies); assistant matches s2
    val bySink = collectMaps(exploded).groupBy(_("__sink__")).view.mapValues(_.size).toMap
    assert(bySink == Map("s1" -> 1, "s2" -> 2))
    val split = mc.split(roles)
    assert(split("s1").count() == 1 && split("s2").count() == 2 && split("s3").count() == 0)
  }

  test("multicast tag-drop: matched tag blanked only in that sink's copy") {
    val s = spark; import s.implicits._
    val df = Seq(("a", "tool"), ("b", "user")).toDF("text", "role")
    val mc = RouteOps.MulticastRouter(
      Seq("tools" -> (col("role") === "tool"), "all" -> lit(true)),
      dropTags = Map("tools" -> Seq("role")))
    val out = mc.split(df)
    assert(out("tools").select("role").collect().forall(_.isNullAt(0)))
    assert(out("all").select("role").collect().forall(!_.isNullAt(0)))
  }

  test("shardhash: stable md5 buckets within [0, shardCount)") {
    val sh = GroupOps.ShardHash(Seq("role"), 16)
    val buckets = collectMaps(roles.withColumn("b", sh.bucketColumn))
      .map(_("b").asInstanceOf[Int])
    assert(buckets.forall(b => b >= 0 && b < 16))
    // deterministic across evaluations
    val again = collectMaps(roles.withColumn("b", sh.bucketColumn))
      .map(_("b").asInstanceOf[Int])
    assert(buckets == again)
    intercept[IllegalArgumentException](GroupOps.ShardHash(Seq("x"), 15))
  }

  test("context group: conversations contiguous + sorted within partitions") {
    val s = spark; import s.implicits._
    val df = (for (c <- 0 until 20; t <- 0 until 5)
      yield (f"conv-$c%03d", t)).toDF("conv_id", "turn_idx")
      .repartition(7) // scramble
    val grouped = GroupOps.ContextGroup(numPartitions = Some(4))(df)
    val parts = grouped.select("conv_id", "turn_idx").rdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator((pid, it.map(r => (r.getString(0), r.getInt(1))).toList))
      }.collect()
    // each conversation in exactly one partition
    val convToParts = parts.flatMap { case (pid, rows) =>
      rows.map(_._1 -> pid)
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    assert(convToParts.values.forall(_ == 1))
    // rows sorted by (conv_id, turn_idx) within each partition
    parts.foreach { case (_, rows) => assert(rows == rows.sorted) }
  }

  test("multiline merge: start-pattern segments + SINGLE_LINE unmatched") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("c1", 0, "preamble a"),
      ("c1", 1, "preamble b"),
      ("c1", 2, "java.lang.RuntimeException: x"),
      ("c1", 3, "\tat A.run(A.java:1)"),
      ("c1", 4, "\tat B.run(B.java:2)"),
      ("c1", 5, "java.lang.IllegalStateException: y"),
      ("c1", 6, "\tat C.run(C.java:3)")
    ).toDF("conv_id", "turn_idx", "text")
    val merged = AggOps.MultilineMerge("^java\\.lang")(df)
    val ms = collectMaps(merged)
    // 2 unmatched singletons + 2 real segments
    assert(ms.size == 4)
    val seg1 = ms.find(_("first_turn") == 2).get
    assert(seg1("n_lines") == 3L)
    assert(seg1("merged_text") ==
      "java.lang.RuntimeException: x\n\tat A.run(A.java:1)\n\tat B.run(B.java:2)")
    assert(ms.count(_("n_lines") == 1L) == 2) // preambles stay single lines
    // DISCARD mode drops the unmatched prefix
    val disc = AggOps.MultilineMerge("^java\\.lang", discardUnmatched = true)(df)
    assert(disc.count() == 2)
  }

  test("conversation stats: ordered lag over turn_idx") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("c1", 0, "user", ts("2025-01-01 00:00:00")),
      ("c1", 1, "assistant", ts("2025-01-01 00:00:03")),
      ("c1", 2, "assistant", ts("2025-01-01 00:00:06")),
      ("c2", 0, "user", ts("2025-01-01 01:00:00"))
    ).toDF("conv_id", "turn_idx", "role", "ts")
    val m = collectMaps(AggOps.conversationStats(df))
      .map(r => r("conv_id") -> r).toMap
    assert(m("c1")("n_turns") == 3L && m("c1")("role_repeats") == 1L &&
      m("c1")("max_turn") == 2)
    assert(m("c2")("role_repeats") == 0L)
  }

  private def ts(x: String) = java.sql.Timestamp.valueOf(x)

  test("content value group tag") {
    val s = spark; import s.implicits._
    val df = Seq(("u", "bash"), (null, "x")).toDF("role", "tool")
    val out = GroupOps.ContentValueGroup(Seq("role", "tool"))(df)
    assert(collectMaps(out).map(_("__group__")) == Seq("u|bash", "|x"))
    intercept[IllegalArgumentException](
      GroupOps.ContentValueGroup(Seq("nope"), errIfKeyNotFound = true)(df))
  }

  test("skew + ordering together: salted aggregate equals plain; routed path ordering intact") {
    // SURVEY §7.5 hard part 6: salting is confined to the aggregate
    // path, so hot-key splitting must not perturb either the aggregate
    // values or the ordered routed-write path.
    val df = graft.sources.Transcripts.generate(spark, 998, seed = 9) // convs 0/997 hot
    val plain = df.groupBy("conv_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // two-phase aggregation over the salted layout
    val salted = GroupOps.SaltedRepartition("conv_id", saltBuckets = 8)(df)
    val twoPhase = salted.groupBy("conv_id", "__salt__").count()
      .groupBy("conv_id").agg(org.apache.spark.sql.functions.sum("count").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoPhase == plain)
    // the hot conversation really was split across salt buckets
    assert(salted.filter(col("conv_id") === "conv-00000000")
      .select("__salt__").distinct().count() > 1)
    // routed path (no salt): per-conversation turn order invariant holds
    val grouped = GroupOps.ContextGroup(numPartitions = Some(4))(
      graft.pipeline.TranscriptPipeline(df))
    val ordered = grouped.select("conv_id", "turn_idx").rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rows = it.map(r => (r.getString(0), r.getInt(1))).toList
        Iterator(rows == rows.sorted)
      }.collect()
    assert(ordered.forall(identity))
  }
}
