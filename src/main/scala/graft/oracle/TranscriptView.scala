package graft.oracle

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The verification transcript table, derived DETERMINISTICALLY from the
  * driver's `events` parquet with one SQL text that is valid — and
  * produces identical values — in both Spark SQL and DuckDB (only
  * portable constructs: `printf`, `mod`, `lpad`, `row_number`, `CASE`).
  * This lets the driver's DuckDB oracle verify the whole
  * parse→enrich→route→aggregate pipeline end-to-end.
  *
  * Shape per BASELINE.json `input_hint`:
  * (conv_id string, turn_idx int, role string, text string, tool string,
  *  ts timestamp). The `text` mix exercises the parser families
  * (nginx 50%, JSON 20%, key=value 10%, CSV 10%, garbage 10%) —
  * miniature of FIXTURES.md §2.
  *
  * Unit tests and the bench use the richer fully-synthetic generator
  * [[graft.sources.Transcripts]] instead; this view exists for
  * cross-engine verification.
  */
object TranscriptView {

  /** status CASE used inside several payloads. */
  private val statusSql =
    "CASE mod(event_id, 6) WHEN 3 THEN 301 WHEN 4 THEN 404 WHEN 5 THEN 500 ELSE 200 END"

  /** Apsara-format line (reference ProcessorParseApsaraNative fixture
    * shape): `[time]\t[LEVEL]\t[thread]\t[file:line]\tk:v\tk:v`. The
    * time-of-day is DERIVED (not formatted from ts) because strftime /
    * date_format spellings differ between engines; every piece below is
    * portable (`concat`/`chr`/`lpad`/`mod`). */
  private val apsaraSql =
    """concat('[2025-01-01 00:00:', lpad(cast(mod(event_id, 60) AS STRING), 2, '0'),
      '.', lpad(cast(mod(event_id * 7919, 1000000) AS STRING), 6, '0'), ']', chr(9),
      '[', CASE mod(event_id, 3) WHEN 0 THEN 'INFO' WHEN 1 THEN 'WARNING' ELSE 'ERROR' END, ']', chr(9),
      '[', cast(mod(event_id, 64) AS STRING), ']', chr(9),
      '[worker.cpp:', cast(mod(event_id, 900) + 10 AS STRING), ']', chr(9),
      'shard:', cast(mod(event_id, 16) AS STRING), chr(9),
      'queue:', cast(mod(event_id, 128) AS STRING))"""

  /** Portable Spark-SQL/DuckDB CTE body over table `events`. */
  val cte: String = s"""SELECT
  concat('conv-', lpad(cast(user_id AS STRING), 8, '0')) AS conv_id,
  cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS turn_idx,
  CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'assistant'
       WHEN 'purchase' THEN 'system' ELSE 'tool' END AS role,
  CASE
    WHEN mod(event_id, 10) < 5 THEN printf('10.0.%d.%d - u%d [01/Jan/2025:00:00:00 +0000] "GET /api/item/%d HTTP/1.1" %d %d "-" "graft/1.0"',
      mod(event_id, 256), mod(user_id, 256), user_id, mod(event_id, 10000),
      $statusSql, mod(event_id * 37, 100000))
    WHEN mod(event_id, 10) < 7 THEN printf('{"level":"%s","code":%d,"msg":"call %s"}',
      CASE mod(event_id, 4) WHEN 0 THEN 'INFO' WHEN 1 THEN 'WARN' WHEN 2 THEN 'ERROR' ELSE 'DEBUG' END,
      mod(event_id, 600), event_type)
    WHEN mod(event_id, 10) = 7 THEN printf('tool=%s status=%d latency_ms=%d', event_type,
      $statusSql, mod(event_id * 13, 2000))
    WHEN mod(event_id, 10) = 8 THEN printf('%s,%d,"item %d",%d', event_type,
      $statusSql, mod(event_id, 500), mod(event_id * 37, 100000))
    WHEN mod(event_id, 40) = 9 THEN $apsaraSql
    WHEN mod(event_id, 40) = 19 THEN printf('java.lang.RuntimeException: boom in %s (id %d)',
      event_type, mod(event_id, 1000))
    WHEN mod(event_id, 40) = 29 THEN concat(chr(9), printf('at com.graft.Svc.call(Svc.java:%d)',
      mod(event_id, 2000) + 1))
    ELSE printf('??%d??', event_id)
  END AS text,
  CASE WHEN event_type IN ('error', 'signup') THEN
    CASE mod(event_id, 4) WHEN 0 THEN 'search' WHEN 1 THEN 'bash' WHEN 2 THEN 'browser' ELSE 'editor' END
  ELSE 'none' END AS tool,
  ts AS ts
FROM events"""

  /** Wrap an oracle query body with the transcripts CTE (DuckDB side). */
  def withCte(body: String): String = s"WITH transcripts AS ($cte)\n$body"

  /** Spark side: same SQL text over the events parquet in `dir`. */
  def load(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(s"$dir/events.parquet").createOrReplaceTempView("events")
    spark.sql(cte)
  }
}
