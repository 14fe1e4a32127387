package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — keep the FIRST occurrence of each content
  * key across micro-batches, so a replayed or long-running ingest never
  * double-admits a document.
  *
  * Spark-first: both tiers are the BUILT-IN streaming-deduplicate
  * state operator (state-store keyed by the dedup column, partitioned
  * across executors; `StreamingDeduplicateExec` /
  * `StreamingDeduplicateWithinWatermarkExec`), not hand-rolled
  * `flatMapGroupsWithState` — the engine already manages exactly this
  * state shape, with checkpointing and recovery for free:
  *
  *  - [[exact]] keeps state for every key seen (batch-corpus parity:
  *    same survivor set as [[graft.ops.DedupOps]] exact dedup over the
  *    concatenated batches, first-arrival-wins);
  *  - [[windowed]] bounds state by event time with
  *    `dropDuplicatesWithinWatermark` — the unbounded-ingest shape at
  *    100 TB scale, where a key older than the watermark delay can be
  *    admitted again (the standard windowed-dedup trade; state is
  *    O(keys per window), not O(keys ever)).
  *
  * The dedup key is md5 of the content column, so the state store
  * holds 16-byte hashes, never document text — state size follows
  * distinct-key count, not bytes ingested.
  */
object StreamingDedup {

  /** First occurrence per content hash, state kept forever. */
  def exact(stream: DataFrame, textCol: String = "text",
      keyCol: String = "__content_md5__"): DataFrame =
    stream.withColumn(keyCol, md5(col(textCol).cast("binary")))
      .dropDuplicates(keyCol)

  /** First occurrence per content hash within the watermark horizon;
    * state for keys older than `delay` (event time on `tsCol`) is
    * evicted, so a long-expired duplicate re-admits. */
  def windowed(stream: DataFrame, tsCol: String, delay: String,
      textCol: String = "text",
      keyCol: String = "__content_md5__"): DataFrame =
    stream.withColumn(keyCol, md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCol)
}
