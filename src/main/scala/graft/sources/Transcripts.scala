package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic transcript table
  * `(conv_id string, turn_idx int, role string, text string,
  *   tool string, ts timestamp)` — the input shape fixed by
  * BASELINE.json `input_hint`, synthesized fully distributed (no
  * driver-side data, no wall clock, no RNG objects): every value is a
  * pure Catalyst expression of (conv index, turn index, seed), so the
  * same (sf, seed) always produces byte-identical data at any
  * parallelism — the property the scaling benchmark and idempotent
  * resume tests rely on.
  *
  * The text payload grammar mirrors the reference's own test/bench
  * fixtures (FIXTURES.md §2): nginx access lines (the reference bench
  * workload, `test/benchmark/test_cases/performance_file_to_blackhole_
  * ilogtail/ilogtail.yaml`), flat JSON, CSV, key=value, Apsara lines,
  * grok lines, java-stack multiline blocks, and garbage.
  *
  * Skew (north rule): conversation lengths are long-tailed — every
  * 997th conversation is "hot" (512 turns) vs a 2..33-turn body, so
  * per-conv_id aggregation exhibits real key skew for AQE/salting to
  * handle.
  */
object Transcripts {

  val roles = Seq("user", "assistant", "system", "tool")
  val tools = Seq("search", "bash", "browser", "editor", "python",
    "sql", "http", "fs", "calc", "mail", "chart", "ocr", "asr",
    "translate", "summarize", "none")

  /** Stable per-(conv,turn) pseudo-random long ≥ 0. */
  private def h(convIdx: Column, turnIdx: Column, salt: Int): Column =
    abs(xxhash64(convIdx, turnIdx, lit(salt)))

  def generate(spark: SparkSession, numConvs: Long, seed: Int = 42,
      partitions: Int = 0): DataFrame = {
    val base = if (partitions > 0) spark.range(0, numConvs, 1, partitions)
               else spark.range(numConvs)
    val convIdx = col("id")
    // Long-tail conversation lengths: hot every 997th conv.
    val convLen = when(pmod(convIdx, lit(997)) === 0, lit(512))
      .otherwise((pmod(abs(xxhash64(convIdx, lit(seed))), lit(32)) + 2).cast("int"))
    val withLen = base.withColumn("__len__", convLen)
    val turns = withLen
      .withColumn("turn_idx", explode(sequence(lit(0), col("__len__") - 1)))
      .drop("__len__")
    val t = col("turn_idx")
    val r0 = h(convIdx, t, seed)

    val role = element_at(
      array(roles.map(lit): _*), (pmod(r0, lit(4)) + 1).cast("int"))
    val tool = when(role === "tool",
      element_at(array(tools.map(lit): _*), (pmod(h(convIdx, t, seed + 1), lit(16)) + 1).cast("int")))
      .otherwise(lit("none"))

    val ts = to_timestamp(lit("2025-01-01 00:00:00")) +
      make_dt_interval(lit(0), lit(0), lit(0),
        (convIdx * 977 + t * 3).cast("double"))

    val convId = concat(lit("conv-"), lpad(convIdx.cast("string"), 8, "0"))

    // --- payload grammar -------------------------------------------------
    def hx(salt: Int): Column = h(convIdx, t, seed + salt)
    val ip = concat_ws(".", lit(10), pmod(hx(2), lit(256)),
      pmod(hx(3), lit(256)), pmod(hx(4), lit(256)))
    val user = concat(lit("u"), pmod(hx(5), lit(1000)))
    val status = element_at(array(lit(200), lit(200), lit(200), lit(301),
      lit(404), lit(500)), (pmod(hx(6), lit(6)) + 1).cast("int"))
    val bytes = pmod(hx(7), lit(100000))
    val path = concat(lit("/api/v"), pmod(hx(8), lit(3)) + 1, lit("/item/"),
      pmod(hx(9), lit(10000)))
    val method = element_at(array(lit("GET"), lit("GET"), lit("POST"),
      lit("PUT")), (pmod(hx(10), lit(4)) + 1).cast("int"))
    val httpTime = date_format(ts, "dd/MMM/yyyy:HH:mm:ss Z")
    val nginx = format_string(
      "%s - %s [%s] \"%s %s HTTP/1.1\" %d %d \"-\" \"graft-agent/1.0\"",
      ip, user, httpTime, method, path, status, bytes)

    val json = format_string(
      "{\"level\":\"%s\",\"code\":%d,\"msg\":\"call %s\",\"dur\":%d.%02d,\"ok\":%s,\"meta\":{\"attempt\":%d}}",
      element_at(array(lit("INFO"), lit("WARN"), lit("ERROR"), lit("DEBUG")),
        (pmod(hx(11), lit(4)) + 1).cast("int")),
      pmod(hx(12), lit(600)), tool, pmod(hx(13), lit(9)),
      pmod(hx(14), lit(100)),
      when(pmod(hx(15), lit(2)) === 0, "true").otherwise("false"),
      pmod(hx(16), lit(5)))

    val csvLine = format_string("%s,%d,\"item %d\",%d",
      tool, status, pmod(hx(17), lit(500)), bytes)

    val kv = format_string("tool=%s status=%d latency_ms=%d attempt=%d",
      tool, status, pmod(hx(18), lit(2000)), pmod(hx(19), lit(5)))

    val apsara = format_string(
      "[%s.%06d]\t[%s]\t[%d]\t[worker.cpp:%d]\tshard:%d\tqueue:%d",
      date_format(ts, "yyyy-MM-dd HH:mm:ss"), pmod(hx(20), lit(1000000)),
      element_at(array(lit("INFO"), lit("WARNING"), lit("ERROR")),
        (pmod(hx(21), lit(3)) + 1).cast("int")),
      pmod(hx(22), lit(64)), pmod(hx(23), lit(900)) + 10,
      pmod(hx(24), lit(16)), pmod(hx(25), lit(128)))

    val grokLine = format_string("%s %s %s %d 0.%03d",
      ip, method, path, bytes, pmod(hx(26), lit(1000)))

    val stackHead = format_string(
      "java.lang.RuntimeException: failure in %s (turn %d)", tool, t)
    val stackCont = format_string(
      "\tat com.graft.Worker.run(Worker.java:%d)", pmod(hx(27), lit(2000)) + 1)
    val garbage = format_string("??%d??\\x00%d", hx(28), hx(29))

    val mix = pmod(r0, lit(100))
    val text = when(mix < 40, nginx)
      .when(mix < 60, json)
      .when(mix < 70, csvLine)
      .when(mix < 80, kv)
      .when(mix < 88, apsara)
      .when(mix < 95, grokLine)
      .when(mix < 97, when(pmod(t, lit(3)) === 0, stackHead).otherwise(stackCont))
      .otherwise(garbage)

    turns.select(
      convId.as("conv_id"),
      t.cast("int").as("turn_idx"),
      role.as("role"),
      text.as("text"),
      tool.as("tool"),
      ts.as("ts"))
  }
}
