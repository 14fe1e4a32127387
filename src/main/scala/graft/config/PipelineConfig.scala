package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._
import graft.ops._

/** Config-driven pipeline builder — the Spark analog of the reference's
  * pipeline-config surface (`Pipeline::Init`,
  * `core/pipeline/Pipeline.cpp:71-198`: a YAML/JSON plugin list builds
  * the processor line + router + flushers; plugin registry
  * `pkg/pipeline/processor.go` + per-plugin `init()` registration, e.g.
  * `plugins/processor/regex/regex.go:131`).
  *
  * A config is YAML or JSON:
  * {{{
  * processors:
  *   - type: parse_regex
  *     sourceKey: text
  *     regex: '(\\S+) (\\d+)'
  *     keys: [name, value]
  *   - type: dict_map
  *     sourceKey: role
  *     destKey: role_class
  *     dict: {user: human}
  * router:
  *   sourceKey: role
  *   rules: [{regex: assistant, sink: sink_llm}]
  *   default: sink_user
  * }}}
  *
  * Each processor entry resolves through [[registry]] to a
  * `DataFrame => DataFrame` stage built from the operator library — the
  * whole configured pipeline stays ONE declarative Catalyst plan
  * (config parsing happens at plan-build time, never per row).
  */
object PipelineConfig {

  type Stage = DataFrame => DataFrame

  private def str(n: JsonNode, f: String): String = {
    require(n.hasNonNull(f), s"missing config field '$f'")
    n.get(f).asText
  }
  private def strOpt(n: JsonNode, f: String): Option[String] =
    if (n.hasNonNull(f)) Some(n.get(f).asText) else None
  private def strs(n: JsonNode, f: String): Seq[String] =
    if (n.hasNonNull(f)) n.get(f).elements.asScala.map(_.asText).toSeq else Nil
  private def strMap(n: JsonNode, f: String): Map[String, String] =
    if (n.hasNonNull(f))
      n.get(f).properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap
    else Map.empty
  private def bool(n: JsonNode, f: String, dflt: Boolean): Boolean =
    if (n.hasNonNull(f)) n.get(f).asBoolean else dflt

  /** Processor-type registry (SURVEY.md §2.12): name → stage factory. */
  val registry: Map[String, JsonNode => Stage] = Map(
    "parse_regex" -> { n =>
      ParseOps.RegexParser(str(n, "sourceKey"), str(n, "regex"),
        strs(n, "keys"),
        ParserOptions(keepingSourceWhenParseFail =
          bool(n, "keepSourceWhenParseFail", true)))
        .apply _
    },
    "parse_json" -> { n =>
      ParseOps.JsonParser(str(n, "sourceKey"), strs(n, "keys")).apply _
    },
    "parse_delimiter" -> { n =>
      ParseOps.DelimiterParser(str(n, "sourceKey"), str(n, "separator"),
        strs(n, "keys"), quote = strOpt(n, "quote")).apply _
    },
    "parse_kv" -> { n =>
      val p = ParseOps.KeyValueParser(str(n, "sourceKey"),
        strOpt(n, "delimiter").getOrElse(" "),
        strOpt(n, "separator").getOrElse("="))
      val keys = strs(n, "keys")
      df => if (keys.nonEmpty) p.extract(df, keys) else p(df)
    },
    "parse_timestamp" -> { n =>
      ParseOps.TimestampParser(str(n, "sourceKey"), str(n, "format"),
        strOpt(n, "destKey").getOrElse("ts_parsed")).apply _
    },
    "grok" -> { n =>
      ParseOps.GrokParser(str(n, "sourceKey"), strs(n, "match")).apply _
    },
    "filter_include" -> { n => FilterOps.IncludeFilter(strMap(n, "include")).apply _ },
    "filter_exclude" -> { n => FilterOps.ExcludeFilter(strMap(n, "exclude")).apply _ },
    "add_fields" -> { n =>
      FieldOps.AddFields(strMap(n, "fields"),
        ignoreIfExist = bool(n, "ignoreIfExist", false)).apply _
    },
    "rename" -> { n => FieldOps.Rename(strMap(n, "mapping")).apply _ },
    "drop" -> { n => FieldOps.Drop(strs(n, "keys")).apply _ },
    "pick" -> { n =>
      FieldOps.PickKey(include = strs(n, "include"),
        exclude = strs(n, "exclude")).apply _
    },
    "dict_map" -> { n =>
      EnrichOps.DictMap(strMap(n, "dict"), str(n, "sourceKey"),
        str(n, "destKey"), handleMissing = n.hasNonNull("missing"),
        missing = strOpt(n, "missing").getOrElse("")).apply _
    },
    "desensitize" -> { n =>
      FieldOps.Desensitize(str(n, "sourceKey"), str(n, "before"),
        str(n, "pattern")).apply _
    },
    "string_replace" -> { n =>
      FieldOps.StringReplace(str(n, "sourceKey"), str(n, "pattern"),
        str(n, "replacement"), destKey = strOpt(n, "destKey")).apply _
    },
    "base64_encode" -> { n =>
      FieldOps.Base64Encode(str(n, "sourceKey"), str(n, "destKey")).apply _
    },
    "base64_decode" -> { n =>
      FieldOps.Base64Decode(str(n, "sourceKey"), str(n, "destKey")).apply _
    },
    "md5" -> { n => FieldOps.Md5(str(n, "sourceKey"), str(n, "destKey")).apply _ },
    "pack_json" -> { n =>
      FieldOps.PackJson(strs(n, "sourceKeys"), str(n, "destKey")).apply _
    })

  final case class Spec(processors: Seq[Stage],
      router: Option[RouteOps.LogstoreRouter]) {
    /** The composed pipeline: processor line, then routing column. */
    def apply(df: DataFrame): DataFrame = {
      val processed = processors.foldLeft(df)((d, s) => s(d))
      router.fold(processed)(r => r(processed))
    }
  }

  def parse(text: String): Spec = {
    val mapper =
      if (text.trim.startsWith("{")) new ObjectMapper()
      else new ObjectMapper(new YAMLFactory())
    val root = mapper.readTree(text)
    val stages = Option(root.get("processors")).toSeq
      .flatMap(_.elements.asScala).map { p =>
        val kind = str(p, "type")
        registry.getOrElse(kind,
          throw new IllegalArgumentException(s"unknown processor type '$kind'"))
          .apply(p)
      }
    val router = Option(root.get("router")).filter(_.hasNonNull("sourceKey"))
      .map { r =>
        val rules = Option(r.get("rules")).toSeq.flatMap(_.elements.asScala)
          .map(x => RouteOps.Rule(str(x, "regex"), str(x, "sink")))
        RouteOps.LogstoreRouter(str(r, "sourceKey"), rules,
          defaultSink = strOpt(r, "default").getOrElse("default"),
          dropDisMatch = bool(r, "dropDisMatch", false))
      }
    Spec(stages, router)
  }
}
