package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Deterministic sampling & mixing for training-data curation — the
  * data-mixing stage a pre-training pipeline runs after dedup/quality
  * filtering (domain reweighting à la Gopher/DoReMi data mixtures;
  * the reference collector itself has no sampling stage, this is part
  * of the beyond-reference LLM-data family).
  *
  * Everything is keyed on a CONTENT-DERIVED hash, never `rand()`:
  * the same row makes the same keep/repeat decision on every run,
  * executor, and retry — the property that makes resume-after-crash
  * and cross-engine verification exact. Hash tiers as in
  * [[graft.functions.PortableHash]]: `md32` (oracle-verifiable) or
  * `fast32` (production).
  *
  * All three are pure projections/filters: no shuffle, no UDF — a
  * sampling stage costs one scan at any scale.
  */
object SampleOps {

  /** Uniform [0,1) value derived from `key` (+`salt`), portable across
    * engines (DuckDB: `('0x'||substr(md5(key||':'||salt),1,8))::BIGINT
    * / 4294967296.0`). A NULL key hashes as the empty string — without
    * that, u01(null) is null and every comparison against it is
    * null-false, so null-keyed rows would silently vanish even from a
    * rate-1.0 "keep everything" sample. */
  def u01(key: Column, salt: Int = 0, portable: Boolean = true): Column = {
    val k = coalesce(key.cast("string"), lit(""))
    (if (portable) PortableHash.md32(k, salt)
     else PortableHash.fast32(k, salt)).cast("double") / (1L << 32)
  }

  /** Bernoulli sample at `rate` keyed on `keyCol` — deterministic,
    * content-stable (a re-run or a second engine keeps the same rows). */
  final case class HashSample(
      keyCol: String,
      rate: Double,
      salt: Int = 0,
      portable: Boolean = true) {
    require(rate >= 0 && rate <= 1, s"rate $rate outside [0,1]")
    def apply(df: DataFrame): DataFrame =
      df.filter(u01(col(keyCol), salt, portable) < rate)
  }

  /** Per-stratum sampling rates (domain / language / source mixing):
    * rows whose `stratumCol` is absent from `rates` keep `defaultRate`.
    * The rate table is a plan-time literal CASE — no join, no shuffle. */
  final case class StratifiedSample(
      stratumCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      salt: Int = 0,
      portable: Boolean = true) {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates outside [0,1]")
    def apply(df: DataFrame): DataFrame = {
      val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
        when(col(stratumCol) === k, lit(r)).otherwise(acc)
      }
      df.filter(u01(col(keyCol), salt, portable) < rate)
    }
  }

  /** Weighted repetition (upsampling): each row appears
    * `floor(w) + Bernoulli(frac(w))` times, so the expected multiplicity
    * is exactly the weight — the standard epoch-mixing trick for
    * upweighting small high-quality domains. Weights may exceed 1;
    * weight 0 drops the row. Output gains `repCol` (0-based copy
    * index) so downstream shuffles de-collocate the copies. */
  final case class WeightedRepeat(
      keyCol: String,
      weight: Column,
      repCol: String = "__rep__",
      salt: Int = 0,
      portable: Boolean = true) {
    def apply(df: DataFrame): DataFrame = {
      val reps = (floor(weight) +
        when(u01(col(keyCol), salt, portable) < weight - floor(weight), 1)
          .otherwise(0)).cast("int")
      df.withColumn("__reps__", reps)
        .filter(col("__reps__") > 0)
        .select(col("*"),
          posexplode(array_repeat(lit(1), col("__reps__")))
            .as(Seq(repCol, "__one__")))
        .drop("__reps__", "__one__")
    }
  }
}
