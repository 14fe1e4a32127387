package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouping / partitioning / ordering (SURVEY.md §2.5, §2.8) — the
  * reference's aggregators are packers and shard routers; their Spark
  * analogs are partitioning decisions, which we make EXPLICITLY because
  * they are part of the contract (turn ordering, shard affinity), not
  * something Catalyst can infer.
  */
object GroupOps {

  /** Context-preserving grouping: rows of one conversation stay together
    * and in turn order — the reference's per-source LogGroup pools.
    * Reference: `plugins/aggregator/context/aggregator_context.go:44-59`.
    *
    * Range partitioning (not hash) keeps conversations contiguous so a
    * downstream per-conversation window needs no further shuffle, and
    * `sortWithinPartitions` gives the stable (conv_id, turn_idx) order
    * the per-turn text-equality invariant is checked under.
    */
  final case class ContextGroup(
      convCol: String = "conv_id",
      orderCol: String = "turn_idx",
      numPartitions: Option[Int] = None) {
    def apply(df: DataFrame): DataFrame = {
      val ranged = numPartitions match {
        case Some(n) => df.repartitionByRange(n, col(convCol))
        case None    => df.repartitionByRange(col(convCol))
      }
      ranged.sortWithinPartitions(col(convCol), col(orderCol))
    }
  }

  /** Shard-hash bucketing: md5 of concatenated source-key values → one
    * of `shardCount` (power of two, ≤512) buckets.
    * Reference: `plugins/aggregator/shardhash/aggregator_shardhash.go:
    * 42,65-105` — bucket = top bits of md5(concat(values)).
    *
    * The bucket column doubles as the repartition key so all rows of a
    * shard land in one task / output file set (SLS shard affinity).
    */
  final case class ShardHash(
      sourceKeys: Seq[String],
      shardCount: Int,
      bucketCol: String = "__shardhash__") {
    require(shardCount > 0 && (shardCount & (shardCount - 1)) == 0 && shardCount <= 512,
      "shardCount must be a power of two ≤ 512")

    /** Reference takes the leading bucketBits bits of the md5: with
      * shardCount = 2^b, bucket = int(md5[0:8] as hex) >> (32-b). */
    def bucketColumn: Column = {
      val b = 31 - Integer.numberOfLeadingZeros(shardCount)
      val hex8 = substring(md5(concat_ws("", sourceKeys.map(col): _*).cast("binary")), 1, 8)
      shiftright(conv(hex8, 16, 10).cast("long"), 32 - b).cast("int")
    }

    def apply(df: DataFrame): DataFrame = {
      val bucketed = df.withColumn(bucketCol, bucketColumn)
      bucketed.repartition(shardCount, col(bucketCol))
    }
  }

  /** Group-by-content-values: rows grouped by the tuple of `groupKeys`
    * values; each group becomes its own output partition with those
    * values as tags.
    * Reference: `plugins/aggregator/contentvaluegroup/
    * aggregator_content_value_group.go:66-76,160-176`.
    * In Spark this is exactly a write-side `partitionBy(groupKeys…)`;
    * the transform stamps a combined group tag for lineage parity. */
  final case class ContentValueGroup(
      groupKeys: Seq[String],
      errIfKeyNotFound: Boolean = false,
      tagCol: String = "__group__") {
    def apply(df: DataFrame): DataFrame = {
      val missing = groupKeys.filterNot(df.columns.contains)
      if (errIfKeyNotFound && missing.nonEmpty)
        throw new IllegalArgumentException(s"group keys missing: $missing")
      df.withColumn(tagCol, concat_ws("|", groupKeys.map(k =>
        coalesce(col(k).cast("string"), lit(""))): _*))
    }
  }

  /** Skew-safe repartition: salt hot keys so one huge conversation does
    * not pin a single task (north rule). Salting is restricted to the
    * AGGREGATE path — the routed-write path stays range-partitioned so
    * ordering invariants hold (SURVEY.md §7.5.6).
    */
  final case class SaltedRepartition(
      keyCol: String,
      saltBuckets: Int,
      saltSource: String = "turn_idx",
      saltCol: String = "__salt__") {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(saltCol, pmod(hash(col(saltSource)), lit(saltBuckets)))
        .repartition(col(keyCol), col(saltCol))
  }
}
