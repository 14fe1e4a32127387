package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops._

/** The north-star composed pipeline: collect → parse → enrich → route →
  * aggregate over the transcript table (BASELINE.json). One declarative
  * Catalyst plan end-to-end: the multi-format parse is a single
  * projection (whole-stage codegen), the enrich is a broadcast join, the
  * route is a `when` chain + partitioned fan-out, the aggregates are
  * hash aggregations with map-side partials — no RDDs, no UDFs, no
  * driver-side loops, so the identical plan runs on a 1000-executor
  * cluster against 10^12 turns.
  */
object TranscriptPipeline {

  /** Full-match nginx access-line pattern (the reference bench workload:
    * `test/benchmark/test_cases/performance_file_to_blackhole_ilogtail/
    * ilogtail.yaml`, 11 fields). */
  val nginxRegex: String =
    "(\\S+) - (\\S+) \\[([^\\]]+)\\] \"(\\w+) (\\S+) ([^\"]+)\" (\\d+) (\\d+) \"([^\"]*)\" \"([^\"]*)\""
  val nginxKeys: Seq[String] = Seq("ip", "http_user", "http_time", "method",
    "path", "protocol", "status", "bytes", "referer", "agent")

  /** Multi-format parse: one projection that classifies each line and
    * extracts the per-format fields (null where not applicable) — the
    * columnar equivalent of the reference's processor chain where each
    * parser keeps-source-on-fail and the next one tries
    * (CommonParserOptions keep semantics).
    */
  def parse(df: DataFrame): DataFrame = {
    val t = col("text")
    val anchored = s"^(?:$nginxRegex)$$"
    val isNginx = t.rlike(anchored)
    val isJson = t.rlike("^\\s*\\{") && get_json_object(t, "$").isNotNull
    val isKv = t.rlike("^tool=\\S+ status=\\d+")
    val isCsv = t.rlike("^[^,\"]+,\\d+,\"[^\"]*\",\\d+$")
    val fmt = when(isNginx, "nginx").when(isJson, "json")
      .when(isKv, "kv").when(isCsv, "csv").otherwise("raw")

    val withNginx = nginxKeys.zipWithIndex.foldLeft(df.withColumn("fmt", fmt)) {
      case (d, (k, i)) =>
        d.withColumn(k, when(isNginx, regexp_extract(t, anchored, i + 1)))
    }
    val kvMap = str_to_map(t, lit(" "), lit("="))
    withNginx
      .withColumn("level", when(isJson, get_json_object(t, "$.level")))
      .withColumn("code", when(isJson, get_json_object(t, "$.code")))
      .withColumn("msg", when(isJson, get_json_object(t, "$.msg")))
      .withColumn("kv_status", when(isKv, try_element_at(kvMap, lit("status"))))
      .withColumn("latency_ms", when(isKv, try_element_at(kvMap, lit("latency_ms"))))
      .withColumn("status_any",
        coalesce(col("status"), col("kv_status"),
          when(isCsv, regexp_extract(t, "^[^,]+,(\\d+),", 1))))
  }

  /** Role/tool lookup dictionaries (FIXTURES.md §3) — broadcast joins. */
  val roleDict = Map(
    "user" -> "human", "assistant" -> "model", "system" -> "control")
  // 'tool' intentionally absent → exercises HandleMissing.
  val toolDict = Map(
    "search" -> "retrieval", "browser" -> "retrieval", "bash" -> "exec",
    "python" -> "exec", "sql" -> "exec", "editor" -> "authoring",
    "none" -> "n/a")

  def enrich(df: DataFrame): DataFrame = {
    val d1 = EnrichOps.DictMap(roleDict, "role", "role_class",
      handleMissing = true, missing = "other")(df)
    EnrichOps.DictMap(toolDict, "tool", "tool_family",
      handleMissing = true, missing = "misc")(d1)
  }

  /** First-match-wins router on role (FIXTURES.md §4): the overlapping
    * third rule can never win over `^tool$` — proves rule order. */
  val router: RouteOps.LogstoreRouter = RouteOps.LogstoreRouter(
    sourceKey = "role",
    rules = Seq(
      RouteOps.Rule("assistant", "sink_llm"),
      RouteOps.Rule("tool|system", "sink_infra"),
      RouteOps.Rule("t.*", "sink_never")),
    defaultSink = "sink_user")

  def route(df: DataFrame): DataFrame = router(df)

  /** Per-sink aggregates: counts per (sink, tool, hour bucket). */
  def aggregates(df: DataFrame): DataFrame =
    AggOps.sinkAggregates(df, bucket = "hour")

  /** The full plan. */
  def apply(df: DataFrame): DataFrame =
    route(enrich(parse(df)))
}
