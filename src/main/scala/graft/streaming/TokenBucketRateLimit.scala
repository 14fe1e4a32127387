package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming token-bucket rate limiter — the faithful stateful analog of
  * the reference's `processor_rate_limit`
  * (`plugins/processor/ratelimit/token_bucket.go`): per distinct
  * value-combination of `fields`, a bucket holds `limit` tokens refilled
  * at `limit` per `periodSeconds`; each event consumes one token;
  * token-less events are DROPPED (not queued).
  *
  * Implemented over `flatMapGroupsWithState` — the one operator family
  * in this engine that needs custom state (SURVEY.md §7.4). Time is
  * EVENT time (`ts` column), which makes the operator deterministic and
  * testable, unlike the reference's wall clock; within a micro-batch,
  * events of one key are processed in `(ts, tieBreak)` order so replays
  * yield identical keep/drop decisions.
  *
  * Scale shape: state is one (double, long) per key, partitioned by key
  * hash across executors; no state growth per event. The batch
  * approximation (deterministic `row_number` per time bucket) lives in
  * `FilterOps.RateLimit`.
  */
object TokenBucketRateLimit {

  final case class BucketState(tokens: Double, lastTsMicros: Long)

  /** Apply to a streaming (or batch) Dataset. `fields` = key columns;
    * `limit` tokens per `periodSeconds`. Returns kept rows only. */
  def apply(df: DataFrame, fields: Seq[String], limit: Int,
      periodSeconds: Long, tsCol: String = "ts",
      tieBreak: Seq[String] = Nil): DataFrame = {
    val schema = df.schema
    implicit val rowEnc: Encoder[Row] = Encoders.row(schema)
    implicit val stateEnc: Encoder[BucketState] = Encoders.product[BucketState]
    implicit val keyEnc: Encoder[String] = Encoders.STRING

    val tsIdx = schema.fieldIndex(tsCol)
    val keyIdxs = fields.map(schema.fieldIndex)
    val tieIdxs = tieBreak.map(schema.fieldIndex)
    val ratePerMicro = limit.toDouble / (periodSeconds * 1e6)

    def micros(r: Row): Long =
      r.getTimestamp(tsIdx).getTime * 1000L

    // Unambiguous composite key: length-prefixed parts with a dedicated
    // null marker, so ("ab","c") never collides with ("a","bc"), a value
    // containing the delimiter cannot shift later parts, and a null
    // field never collides with the literal string "null".
    def encodeKey(r: Row, idxs: Seq[Int]): String =
      idxs.map { i =>
        val v = r.get(i)
        if (v == null) "\u0000" else { val s = String.valueOf(v); s"${s.length}:$s" }
      }.mkString("|")

    val keyed = df.groupByKey((r: Row) => encodeKey(r, keyIdxs))

    keyed.flatMapGroupsWithState[BucketState, Row](
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (_: String, rows: Iterator[Row], state: GroupState[BucketState]) =>
        // deterministic replay order within the batch
        val ordered = rows.toSeq.sortBy { r =>
          (micros(r), encodeKey(r, tieIdxs))
        }
        var st = state.getOption.getOrElse(
          BucketState(limit.toDouble, ordered.headOption.map(micros).getOrElse(0L)))
        val kept = ordered.flatMap { r =>
          val now = micros(r)
          val refilled = math.min(limit.toDouble,
            st.tokens + math.max(0L, now - st.lastTsMicros) * ratePerMicro)
          if (refilled >= 1.0) {
            st = BucketState(refilled - 1.0, math.max(now, st.lastTsMicros))
            Some(r)
          } else {
            st = BucketState(refilled, math.max(now, st.lastTsMicros))
            None
          }
        }
        state.update(st)
        kept.iterator
    }.toDF(schema.fieldNames: _*)
  }
}
