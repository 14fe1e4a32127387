package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession._
import graft.sources.Transcripts

/** End-to-end invariants (FIXTURES.md §6) against a plain-Scala oracle:
  * routed-row-set equality, per-sink aggregate counts, and the per-turn
  * text-equality invariant under stable (conv_id, turn_idx) ordering. */
class PipelineE2ESpec extends AnyFunSuite {

  private lazy val input = Transcripts.generate(spark, 300, seed = 42).cache()

  test("transcript generator: deterministic & partition-invariant") {
    val a = Transcripts.generate(spark, 100, seed = 42, partitions = 2)
    val b = Transcripts.generate(spark, 100, seed = 42, partitions = 13)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val c = Transcripts.generate(spark, 100, seed = 7)
    assert(c.exceptAll(a).count() > 0) // seed matters
    // schema contract (BASELINE.json input_hint)
    assert(a.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      "conv_id" -> "string", "turn_idx" -> "int", "role" -> "string",
      "text" -> "string", "tool" -> "string", "ts" -> "timestamp"))
  }

  test("transcript generator: skew + dense turn_idx + monotone ts") {
    val lens = input.groupBy("conv_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lens("conv-00000000") == 512) // hot conversation
    assert(lens.values.filter(_ < 100).nonEmpty)
    val viol = input.groupBy("conv_id")
      .agg(count(lit(1)).as("n"), max("turn_idx").as("m"))
      .filter(col("m") =!= col("n") - 1).count()
    assert(viol == 0) // dense 0..n-1
  }

  test("router fan-out: union of routed rows == parsed input (row sets)") {
    val routed = TranscriptPipeline(input)
    assert(routed.count() == input.count()) // first-match router: no loss, no dup
    val back = routed.select("conv_id", "turn_idx", "role", "tool", "ts")
    val orig = input.select("conv_id", "turn_idx", "role", "tool", "ts")
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("per-sink aggregate counts match the plain-Scala oracle exactly") {
    // Oracle: reimplement router + counts directly on collected rows.
    val rows = input.select("conv_id", "role", "tool", "ts").collect()
    def sinkOf(role: String): String =
      if (role == "assistant") "sink_llm"
      else if (role == "tool" || role == "system") "sink_infra"
      else "sink_user"
    val oracle = rows.groupBy { r =>
      val t = r.getTimestamp(3).toInstant
      val hour = t.truncatedTo(java.time.temporal.ChronoUnit.HOURS)
      (sinkOf(r.getString(1)), r.getString(2), hour)
    }.map { case (k, vs) => k -> (vs.length.toLong, vs.map(_.getString(0)).distinct.length.toLong) }

    val got = TranscriptPipeline.aggregates(TranscriptPipeline(input))
      .collect().map { r =>
        (r.getString(0), r.getString(1), r.getTimestamp(2).toInstant) ->
          (r.getLong(3), r.getLong(4))
      }.toMap
    assert(got == oracle)
  }

  test("per-turn text equality under stable (conv_id, turn_idx) ordering") {
    // Through the full pipeline (parse+enrich+route add columns only),
    // the text column must survive bit-identical, in stable order.
    val processed = TranscriptPipeline(input)
      .orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text")
    val original = input
      .orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text")
    val z = processed.collect().zip(original.collect())
    assert(z.forall { case (a, b) => a == b })
  }

  test("multi-format parse classifies every line") {
    val parsed = TranscriptPipeline.parse(input)
    val byFmt = parsed.groupBy("fmt").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFmt.keySet.subsetOf(Set("nginx", "json", "kv", "csv", "raw")))
    assert(byFmt("nginx") > 0 && byFmt("json") > 0 && byFmt("raw") > 0)
    // parsed fields non-null exactly for their format
    assert(parsed.filter(col("fmt") === "nginx" && col("ip").isNull).count() == 0)
    assert(parsed.filter(col("fmt") =!= "nginx" && col("ip").isNotNull).count() == 0)
  }
}
