package graft.config

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.sources.Transcripts

/** Config-driven pipeline: YAML/JSON spec → composed Catalyst plan. */
class PipelineConfigSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val yaml =
    """processors:
      |  - type: parse_kv
      |    sourceKey: text
      |    keys: [status, latency_ms]
      |  - type: add_fields
      |    fields: {pipeline: p1}
      |  - type: dict_map
      |    sourceKey: role
      |    destKey: role_class
      |    dict: {user: human, assistant: model, system: control}
      |    missing: other
      |  - type: md5
      |    sourceKey: text
      |    destKey: text_md5
      |router:
      |  sourceKey: role
      |  rules:
      |    - {regex: assistant, sink: sink_llm}
      |    - {regex: tool|system, sink: sink_infra}
      |  default: sink_user
      |""".stripMargin

  test("yaml config builds the same plan as manual composition") {
    val input = Transcripts.generate(spark, 50, seed = 11)
    val spec = PipelineConfig.parse(yaml)
    val out = spec(input)
    assert(out.columns.toSet.contains("__sink__"))
    assert(out.columns.toSet
      .intersect(Set("status", "latency_ms", "pipeline", "role_class", "text_md5"))
      .size == 5)
    // router semantics: first-match on role
    val sinks = out.groupBy("role", "__sink__").count().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sinks("assistant") == "sink_llm")
    assert(sinks("tool") == "sink_infra")
    assert(sinks("user") == "sink_user")
    // dict enrich
    val rc = out.select("role", "role_class").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rc("user") == "human" && rc("tool") == "other")
  }

  test("json config parses too; unknown type rejected at build time") {
    val json = """{"processors": [{"type": "md5", "sourceKey": "text", "destKey": "h"}]}"""
    val input = Transcripts.generate(spark, 5)
    assert(PipelineConfig.parse(json)(input).columns.contains("h"))
    val bad = """{"processors": [{"type": "nope"}]}"""
    val e = intercept[IllegalArgumentException](PipelineConfig.parse(bad))
    assert(e.getMessage.contains("nope"))
  }

  test("configured parser failure semantics flow through (keepSource default)") {
    val cfg =
      """processors:
        |  - type: parse_regex
        |    sourceKey: text
        |    regex: 'tool=(\S+) status=(\d+).*'
        |    keys: [t_tool, t_status]
        |""".stripMargin
    val input = Transcripts.generate(spark, 80, seed = 2)
    val out = PipelineConfig.parse(cfg)(input)
    // parse failures keep the source row with null extracted fields
    assert(out.count() == input.count())
    assert(out.filter(col("t_status").isNotNull).count() > 0)
    assert(out.filter(col("t_status").isNull).count() > 0)
  }
}
