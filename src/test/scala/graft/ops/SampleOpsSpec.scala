package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Deterministic sampling/mixing: content-keyed decisions are stable
  * across runs, stratum rates hold in expectation, weighted repetition
  * produces floor/ceil copies with exact expected multiplicity. */
class SampleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ids(n: Int) = (0 until n).map(_.toLong).toDF("id")

  test("hash sample: deterministic, rate holds within tolerance, " +
    "disjoint salts give independent samples") {
    val d = ids(4000)
    val a = SampleOps.HashSample("id", 0.3)(d).collect().map(_.getLong(0)).toSet
    val b = SampleOps.HashSample("id", 0.3)(d).collect().map(_.getLong(0)).toSet
    assert(a == b, "same salt+rate must keep identical rows")
    assert(math.abs(a.size / 4000.0 - 0.3) < 0.03)
    val c = SampleOps.HashSample("id", 0.3, salt = 7)(d).collect()
      .map(_.getLong(0)).toSet
    // different salt → a different (roughly independent) subset
    assert(math.abs((a intersect c).size / 4000.0 - 0.09) < 0.03)
    // a rate-0.1 sample nests inside the rate-0.3 sample (same salt):
    // u01 < 0.1 implies u01 < 0.3 — the property that makes staged
    // downsampling consistent
    val tight = SampleOps.HashSample("id", 0.1)(d).collect()
      .map(_.getLong(0)).toSet
    assert(tight.subsetOf(a))
  }

  test("null keys hash as empty string: rate 1.0 keeps every row " +
    "(null u01 would silently drop them)") {
    val d = Seq(Some(1L), None, Some(2L)).toDF("id")
    assert(SampleOps.HashSample("id", 1.0)(d).count() == 3)
    assert(SampleOps.WeightedRepeat("id", lit(1.0))(d).count() == 3)
  }

  test("stratified sample: per-stratum rates, default rate for " +
    "unlisted strata") {
    val d = ids(3000).withColumn("dom",
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b")
        .otherwise("zz"))
    val out = SampleOps.StratifiedSample("dom", "id",
      Map("a" -> 0.9, "b" -> 0.1), defaultRate = 0.5)(d)
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("a") / 1000.0 - 0.9) < 0.05)
    assert(math.abs(out("b") / 1000.0 - 0.1) < 0.05)
    assert(math.abs(out("zz") / 1000.0 - 0.5) < 0.05)
  }

  test("weighted repeat: floor/ceil copies, exact expected multiplicity, " +
    "weight 0 drops") {
    val d = ids(2000)
    val out = SampleOps.WeightedRepeat("id", lit(1.25))(d)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.forall { case (_, n) => n == 1 || n == 2 })
    val total = out.map(_._2).sum
    assert(math.abs(total / 2000.0 - 1.25) < 0.05)
    // copy indices are 0..reps-1
    val reps = SampleOps.WeightedRepeat("id", lit(2.0))(ids(5))
      .select("id", "__rep__").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(reps == (0L until 5L).flatMap(i => Seq((i, 0), (i, 1))).toSet)
    assert(SampleOps.WeightedRepeat("id", lit(0.0))(d).count() == 0)
  }
}
