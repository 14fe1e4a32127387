package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops._
import graft.oracle.TranscriptView
import graft.pipeline.TranscriptPipeline
import graft.sources.Transcripts

/** Driver contract: one `queries` entry per implemented operator
  * (SURVEY.md §2), each with equivalent DuckDB SQL in `oracleSql`.
  * Transcript-shaped queries run over [[TranscriptView]] — a
  * deterministic derivation from the driver's `events` parquet whose
  * defining SQL is portable across Spark and DuckDB, so the oracle
  * verifies the full parse→enrich→route→aggregate pipeline.
  */
object SparkEntry {

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def transcripts(spark: SparkSession, dir: String): DataFrame =
    TranscriptView.load(spark, dir)

  private val nginxAnchored = s"^(?:${TranscriptPipeline.nginxRegex})$$"

  /** Flagship: full pipeline on sf0.001 (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame = {
    val t = transcripts(spark, "/root/testdata/sf0.001")
    TranscriptPipeline.aggregates(TranscriptPipeline(t))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- sanity -----------------------------------------------------------
    "q1_agg" -> ((s, dir) => tbl(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))),

    // -- parsers (SURVEY §2.2) --------------------------------------------
    "regex_parse" -> { (s, dir) =>
      val parsed = ParseOps.RegexParser("text", TranscriptPipeline.nginxRegex,
        TranscriptPipeline.nginxKeys)(transcripts(s, dir))
      parsed.filter(col("ip").isNotNull)
        .select("conv_id", "turn_idx", "ip", "method", "path", "status", "bytes")
    },
    "json_parse" -> { (s, dir) =>
      val parsed = ParseOps.JsonParser("text", Seq("level", "code", "msg"))(
        transcripts(s, dir))
      parsed.filter(col("level").isNotNull)
        .select("conv_id", "turn_idx", "level", "code", "msg")
    },
    "kv_parse" -> { (s, dir) =>
      val t = transcripts(s, dir).filter(col("text").rlike("^tool=\\S+ status=\\d+"))
      ParseOps.KeyValueParser("text", " ", "=")
        .extract(t, Seq("status", "latency_ms"))
        .select("conv_id", "turn_idx", "status", "latency_ms")
    },
    "delimiter_parse" -> { (s, dir) =>
      val t = transcripts(s, dir)
        .filter(col("text").rlike("^[^,\"]+,\\d+,\"[^\"]*\",\\d+$"))
      ParseOps.DelimiterParser("text", ",",
        Seq("c_type", "c_status", "c_item", "c_bytes"), quote = Some("\""))(t)
        .select("conv_id", "turn_idx", "c_type", "c_status", "c_item", "c_bytes")
    },
    "grok_parse" -> { (s, dir) =>
      val grok = ParseOps.GrokParser("text", Seq(
        "%{IP:client} - %{USERNAME:ident} \\[%{HTTPDATE:http_time}\\] \"%{WORD:verb} %{URIPATHPARAM:request} HTTP/%{NUMBER:httpversion}\" %{NUMBER:response} %{NUMBER:sent_bytes} \"-\" \"graft/1.0\""))
      grok(transcripts(s, dir)).filter(col("client").isNotNull)
        .select("conv_id", "turn_idx", "client", "verb", "request", "response", "sent_bytes")
    },
    "timestamp_parse" -> { (s, dir) =>
      val t = transcripts(s, dir)
        .withColumn("ts_str", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      ParseOps.TimestampParser("ts_str", "yyyy-MM-dd HH:mm:ss", "ts_parsed")(t)
        .select("conv_id", "turn_idx", "ts_parsed")
    },
    "apsara_parse" -> { (s, _) => // rows-only: apsara lines exist in synth data
      val t = Transcripts.generate(s, 2000)
      ParseOps.ApsaraParser("text")(t)
        .filter(col("__LEVEL__").isNotNull)
        .select("conv_id", "turn_idx", "__LEVEL__", "__THREAD__", "__FILE__", "__LINE__")
    },

    // -- filters (SURVEY §2.3) ---------------------------------------------
    "filter_include" -> { (s, dir) =>
      val f1 = FilterOps.IncludeFilter(Map("role" -> "user|assistant"))
      val f2 = FilterOps.ExcludeFilter(Map("text" -> "\\?\\?.*"))
      f2(f1(transcripts(s, dir))).groupBy(col("role"))
        .agg(count(lit(1)).as("n"))
    },
    "filter_expression" -> { (s, dir) =>
      import FilterOps._
      val tree = Or(Seq(
        And(Seq(KeyRegex("role", "tool"), KeyRegex("tool", "search|bash"))),
        Not(KeyRegex("role", "user|assistant|system|tool"))))
      ExpressionFilter(tree)(transcripts(s, dir))
        .select("conv_id", "turn_idx", "role", "tool")
    },
    "fields_with_condition" -> { (s, dir) =>
      import FilterOps._
      val op = FieldsWithCondition(Seq(
        Case(Seq(FieldCond("role", Equals, "assistant")), allMustMatch = true,
          Map("speaker_kind" -> "model")),
        Case(Seq(FieldCond("role", StartWith, "t"),
          FieldCond("tool", Regexp, "^(?:search|browser)$")), allMustMatch = true,
          Map("speaker_kind" -> "retriever")),
        Case(Seq(FieldCond("role", Contains, "s")), allMustMatch = true,
          Map("speaker_kind" -> "sys"))))
      op(transcripts(s, dir)).groupBy(col("role"), col("tool"), col("speaker_kind"))
        .agg(count(lit(1)).as("n"))
    },
    "rate_limit" -> { (s, dir) =>
      FilterOps.RateLimit(Seq("role"), limit = 1, tsCol = "ts",
        bucket = "1 hour", tieBreak = Seq("conv_id", "turn_idx"))(
        transcripts(s, dir))
        .groupBy(col("role")).agg(count(lit(1)).as("n_kept"))
    },

    // -- field ops (SURVEY §2.4) --------------------------------------------
    "field_ops" -> { (s, dir) =>
      val d0 = transcripts(s, dir)
      val d1 = FieldOps.AddFields(Map("pipeline" -> "p1"))(d0)
      val d2 = FieldOps.Rename(Map("role" -> "speaker"))(d1)
      FieldOps.PickKey(include = Seq("conv_id", "turn_idx", "speaker", "pipeline"))(d2)
    },
    "desensitize" -> { (s, dir) =>
      val t = transcripts(s, dir).filter(col("text").startsWith("tool="))
      FieldOps.Desensitize("text", "latency_ms=", "\\d+")(t)
        .select("conv_id", "turn_idx", "text")
    },
    "string_replace" -> { (s, dir) =>
      FieldOps.StringReplace("text", "\\d+", "N", destKey = Some("text_norm"))(
        transcripts(s, dir).filter(col("text").startsWith("tool=")))
        .select("conv_id", "turn_idx", "text_norm")
    },
    "anchor" -> { (s, dir) =>
      val t = transcripts(s, dir)
        .filter(col("text").rlike("^[^,\"]+,\\d+,\"[^\"]*\",\\d+$"))
      FieldOps.Anchor("text", "item ", "\"", "item_id")(t)
        .select("conv_id", "turn_idx", "item_id")
    },
    "pack_json" -> { (s, dir) =>
      FieldOps.PackJson(Seq("role", "tool"), "packed")(transcripts(s, dir))
        .select("conv_id", "turn_idx", "packed")
    },
    "md5_field" -> { (s, dir) =>
      FieldOps.Md5("text", "text_md5")(transcripts(s, dir))
        .select("conv_id", "turn_idx", "text_md5")
    },

    // -- enrich / joins (SURVEY §2.4, §2.7) ----------------------------------
    "dict_map" -> { (s, dir) =>
      TranscriptPipeline.enrich(transcripts(s, dir))
        .groupBy(col("role"), col("role_class"), col("tool"), col("tool_family"))
        .agg(count(lit(1)).as("n"))
    },
    "range_lookup" -> { (s, dir) =>
      val sp = s
      import sp.implicits._
      val ranges = Seq((0.0, 5.0, "low"), (5.0, 15.0, "mid"),
        (15.0, 1e9, "high")).toDF("lo", "hi", "tier")
      EnrichOps.RangeLookup(ranges, "value")(tbl(s, dir, "events"))
        .groupBy(col("tier")).agg(count(lit(1)).as("n"))
    },

    // -- routing / grouping (SURVEY §2.5) ------------------------------------
    "router_first_match" -> { (s, dir) =>
      TranscriptPipeline.router(transcripts(s, dir))
        .select(col("conv_id"), col("turn_idx"), col("__sink__").as("sink"))
    },
    "router_multicast" -> { (s, dir) =>
      val mc = RouteOps.MulticastRouter(Seq(
        "all_tool" -> (col("role") === "tool"),
        "all_errorish" -> col("text").rlike("ERROR|\"code\":5\\d\\d"),
        "all_user" -> (col("role") === "user")))
      mc.explodeSinks(transcripts(s, dir))
        .groupBy(col("__sink__").as("sink")).agg(count(lit(1)).as("n"))
        .select("sink", "n")
    },
    "shardhash" -> { (s, dir) =>
      val sh = GroupOps.ShardHash(Seq("conv_id"), 16)
      transcripts(s, dir).withColumn("bucket", sh.bucketColumn)
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    },
    "content_value_group" -> { (s, dir) =>
      GroupOps.ContentValueGroup(Seq("role", "tool"))(transcripts(s, dir))
        .groupBy(col("__group__").as("grp")).agg(count(lit(1)).as("n"))
        .select("grp", "n")
    },

    // -- aggregates / windows (SURVEY §2.8, §2.10) ---------------------------
    "sink_agg" -> { (s, dir) =>
      val routed = TranscriptPipeline(transcripts(s, dir))
      TranscriptPipeline.aggregates(routed)
        .withColumnRenamed("__sink__", "sink")
    },
    "conv_stats" -> { (s, dir) =>
      AggOps.conversationStats(transcripts(s, dir))
    },
    "multiline_merge" -> { (s, _) => // rows-only: stack traces in synth data
      val t = Transcripts.generate(s, 2000)
      AggOps.MultilineMerge("^java\\.lang")(t)
        .filter(col("n_lines") > 1)
        .select("conv_id", "segment", "first_turn", "n_lines", "merged_text")
    },

    // -- training-data ops (prompt: dedup / text analysis / similarity) ------
    "dedup_exact" -> { (s, dir) =>
      tbl(s, dir, "documents")
        .groupBy(md5(col("text").cast("binary")).as("text_md5"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
    },
    "token_count" -> { (s, dir) =>
      tbl(s, dir, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("int").as("n_tokens"),
        length(col("text")).cast("int").as("n_chars_computed"))
    },
    "quality_score" -> { (s, dir) =>
      val toks = split(col("text"), " ")
      tbl(s, dir, "documents").select(
        col("doc_id"),
        round(size(array_distinct(toks)).cast("double") / size(toks), 4)
          .as("distinct_ratio"))
    },
    "lang_id" -> { (s, dir) =>
      val toks = split(col("text"), " ")
      val stopHits = size(filter(toks, x => x.isin("the", "a")))
      tbl(s, dir, "documents").select(
        col("doc_id"),
        when(stopHits.cast("double") / size(toks) > 0.05, "en")
          .otherwise("unk").as("lang_guess"))
    },
    "fingerprint" -> { (s, dir) =>
      tbl(s, dir, "documents").select(
        col("doc_id"),
        md5(regexp_replace(lower(col("text")), "\\s+", " ").cast("binary"))
          .as("fp"))
    },
    "ann_topk" -> { (s, dir) =>
      val e = tbl(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val dv = transform(col("embedding"), x => x.cast("double"))
      val qd = transform(col("qv"), x => x.cast("double"))
      val dot = aggregate(zip_with(dv, qd, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
      val nx = sqrt(aggregate(dv, lit(0.0), (acc, x) => acc + x * x))
      val ny = sqrt(aggregate(qd, lit(0.0), (acc, x) => acc + x * x))
      val scored = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .withColumn("cos", dot / (nx * ny))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
      scored.withColumn("rank",
          row_number().over(Window.orderBy(col("cos").desc, col("vec_id"))).cast("int"))
        .select("rank", "vec_id")
    }
  )

  def oracleSql: Map[String, String] = {
    import TranscriptView.withCte
    val nginxRx = """^(\S+) - (\S+) \[([^\]]+)\] "(\w+) (\S+) ([^"]+)" ([0-9]+) ([0-9]+) "([^"]*)" "([^"]*)"$"""
    val csvRx = """^([^,"]+),([0-9]+),"([^"]*)",([0-9]+)$"""
    Map(
      "q1_agg" ->
        "SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n FROM lineitem GROUP BY 1",

      "regex_parse" -> withCte(
        s"""SELECT conv_id, turn_idx,
           regexp_extract(text, '$nginxRx', 1) AS ip,
           regexp_extract(text, '$nginxRx', 4) AS method,
           regexp_extract(text, '$nginxRx', 5) AS path,
           regexp_extract(text, '$nginxRx', 7) AS status,
           regexp_extract(text, '$nginxRx', 8) AS bytes
           FROM transcripts WHERE regexp_matches(text, '$nginxRx')"""),

      "json_parse" -> withCte(
        """SELECT conv_id, turn_idx,
           json_extract_string(text, '$.level') AS level,
           json_extract_string(text, '$.code') AS code,
           json_extract_string(text, '$.msg') AS msg
           FROM transcripts WHERE text LIKE '{%'"""),

      "kv_parse" -> withCte(
        """SELECT conv_id, turn_idx,
           regexp_extract(text, 'status=([0-9]+)', 1) AS status,
           regexp_extract(text, 'latency_ms=([0-9]+)', 1) AS latency_ms
           FROM transcripts WHERE regexp_matches(text, '^tool=\S+ status=[0-9]+')"""),

      "delimiter_parse" -> withCte(
        s"""SELECT conv_id, turn_idx,
           regexp_extract(text, '$csvRx', 1) AS c_type,
           regexp_extract(text, '$csvRx', 2) AS c_status,
           regexp_extract(text, '$csvRx', 3) AS c_item,
           regexp_extract(text, '$csvRx', 4) AS c_bytes
           FROM transcripts WHERE regexp_matches(text, '$csvRx')"""),

      "grok_parse" -> withCte(
        s"""SELECT conv_id, turn_idx,
           regexp_extract(text, '$nginxRx', 1) AS client,
           regexp_extract(text, '$nginxRx', 4) AS verb,
           regexp_extract(text, '$nginxRx', 5) AS request,
           regexp_extract(text, '$nginxRx', 7) AS response,
           regexp_extract(text, '$nginxRx', 8) AS sent_bytes
           FROM transcripts WHERE regexp_matches(text, '$nginxRx')"""),

      "timestamp_parse" -> withCte(
        """SELECT conv_id, turn_idx, date_trunc('second', ts) AS ts_parsed
           FROM transcripts"""),

      "filter_include" -> withCte(
        """SELECT role, count(*) AS n FROM transcripts
           WHERE regexp_matches(role, '^(?:user|assistant)$')
             AND NOT regexp_matches(text, '^(?:\?\?.*)$')
           GROUP BY role"""),

      "filter_expression" -> withCte(
        """SELECT conv_id, turn_idx, role, tool FROM transcripts
           WHERE (regexp_matches(role, '^(?:tool)$') AND regexp_matches(tool, '^(?:search|bash)$'))
              OR NOT coalesce(regexp_matches(role, '^(?:user|assistant|system|tool)$'), false)"""),

      "fields_with_condition" -> withCte(
        """SELECT role, tool,
           CASE WHEN role = 'assistant' THEN 'model'
                WHEN role LIKE 't%' AND regexp_matches(tool, '^(?:search|browser)$') THEN 'retriever'
                WHEN contains(role, 's') THEN 'sys' END AS speaker_kind,
           count(*) AS n
           FROM transcripts GROUP BY 1, 2, 3"""),

      "rate_limit" -> withCte(
        """SELECT role, count(*) AS n_kept FROM (
             SELECT role, row_number() OVER (
               PARTITION BY date_trunc('hour', ts), role
               ORDER BY ts, conv_id, turn_idx) AS rn
             FROM transcripts) WHERE rn <= 1 GROUP BY role"""),

      "field_ops" -> withCte(
        """SELECT conv_id, turn_idx, role AS speaker, 'p1' AS pipeline
           FROM transcripts"""),

      "desensitize" -> withCte(
        """SELECT conv_id, turn_idx,
           regexp_replace(text, '(latency_ms=)[0-9]+', '\1********', 'g') AS text
           FROM transcripts WHERE text LIKE 'tool=%'"""),

      "string_replace" -> withCte(
        """SELECT conv_id, turn_idx,
           regexp_replace(text, '[0-9]+', 'N', 'g') AS text_norm
           FROM transcripts WHERE text LIKE 'tool=%'"""),

      "anchor" -> withCte(
        s"""SELECT conv_id, turn_idx,
           regexp_extract(text, 'item ([^"]*)"', 1) AS item_id
           FROM transcripts WHERE regexp_matches(text, '$csvRx')"""),

      "pack_json" -> withCte(
        """SELECT conv_id, turn_idx,
           printf('{"role":"%s","tool":"%s"}', role, tool) AS packed
           FROM transcripts"""),

      "md5_field" -> withCte(
        """SELECT conv_id, turn_idx, md5(text) AS text_md5 FROM transcripts"""),

      "dict_map" -> withCte(
        """SELECT role,
           CASE role WHEN 'user' THEN 'human' WHEN 'assistant' THEN 'model'
             WHEN 'system' THEN 'control' ELSE 'other' END AS role_class,
           tool,
           CASE tool WHEN 'search' THEN 'retrieval' WHEN 'browser' THEN 'retrieval'
             WHEN 'bash' THEN 'exec' WHEN 'python' THEN 'exec' WHEN 'sql' THEN 'exec'
             WHEN 'editor' THEN 'authoring' WHEN 'none' THEN 'n/a'
             ELSE 'misc' END AS tool_family,
           count(*) AS n
           FROM transcripts GROUP BY 1, 2, 3, 4"""),

      "range_lookup" ->
        """SELECT CASE WHEN value >= 0 AND value < 5 THEN 'low'
             WHEN value >= 5 AND value < 15 THEN 'mid'
             WHEN value >= 15 AND value < 1000000000 THEN 'high' END AS tier,
           count(*) AS n FROM events GROUP BY 1""",

      "router_first_match" -> withCte(
        """SELECT conv_id, turn_idx,
           CASE WHEN regexp_matches(role, '^(?:assistant)$') THEN 'sink_llm'
                WHEN regexp_matches(role, '^(?:tool|system)$') THEN 'sink_infra'
                WHEN regexp_matches(role, '^(?:t.*)$') THEN 'sink_never'
                ELSE 'sink_user' END AS sink
           FROM transcripts"""),

      "router_multicast" -> withCte(
        """SELECT sink, count(*) AS n FROM (
             SELECT unnest(list_filter([
               CASE WHEN role = 'tool' THEN 'all_tool' END,
               CASE WHEN regexp_matches(text, 'ERROR|"code":5[0-9][0-9]') THEN 'all_errorish' END,
               CASE WHEN role = 'user' THEN 'all_user' END], x -> x IS NOT NULL)) AS sink
             FROM transcripts) GROUP BY sink"""),

      "shardhash" -> withCte(
        """SELECT cast(cast(concat('0x', substr(md5(conv_id), 1, 8)) AS BIGINT) // 268435456 AS INT) AS bucket,
           count(*) AS n FROM transcripts GROUP BY 1"""),

      "content_value_group" -> withCte(
        """SELECT concat(coalesce(role, ''), '|', coalesce(tool, '')) AS grp,
           count(*) AS n FROM transcripts GROUP BY 1"""),

      "sink_agg" -> withCte(
        """SELECT CASE WHEN regexp_matches(role, '^(?:assistant)$') THEN 'sink_llm'
                WHEN regexp_matches(role, '^(?:tool|system)$') THEN 'sink_infra'
                ELSE 'sink_user' END AS sink,
           tool, date_trunc('hour', ts) AS bucket,
           count(*) AS n_events, count(DISTINCT conv_id) AS n_convs
           FROM transcripts GROUP BY 1, 2, 3"""),

      "conv_stats" -> withCte(
        """SELECT conv_id, count(*) AS n_turns, max(turn_idx) AS max_turn,
           cast(sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS BIGINT) AS role_repeats,
           min(ts) AS started_at, max(ts) AS ended_at
           FROM (SELECT *, lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
                 FROM transcripts)
           GROUP BY conv_id"""),

      "dedup_exact" ->
        """SELECT md5(text) AS text_md5, count(*) AS n_copies,
           min(doc_id) AS keep_id FROM documents GROUP BY 1""",

      "token_count" ->
        """SELECT doc_id, cast(len(str_split(text, ' ')) AS INT) AS n_tokens,
           cast(length(text) AS INT) AS n_chars_computed FROM documents""",

      "quality_score" ->
        """SELECT doc_id,
           round(cast(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
                 / len(str_split(text, ' ')), 4) AS distinct_ratio
           FROM documents""",

      "lang_id" ->
        """SELECT doc_id,
           CASE WHEN cast(len(list_filter(str_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
                     / len(str_split(text, ' ')) > 0.05
                THEN 'en' ELSE 'unk' END AS lang_guess
           FROM documents""",

      "fingerprint" ->
        """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
           FROM documents""",

      "ann_topk" ->
        """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
           z AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qv) AS y
                 FROM embeddings e, q WHERE e.vec_id <> 0),
           s AS (SELECT vec_id,
                   sum(cast(x AS DOUBLE) * cast(y AS DOUBLE)) AS dot,
                   sqrt(sum(cast(x AS DOUBLE) * cast(x AS DOUBLE))) AS nx,
                   sqrt(sum(cast(y AS DOUBLE) * cast(y AS DOUBLE))) AS ny
                 FROM z GROUP BY vec_id)
           SELECT cast(row_number() OVER (ORDER BY dot / (nx * ny) DESC, vec_id) AS INT) AS rank,
                  vec_id
           FROM s ORDER BY 1 LIMIT 10"""
    )
  }
}
