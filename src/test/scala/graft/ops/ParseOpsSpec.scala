package graft.ops
// (vector fixtures below cite the reference's own unit tests)

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession._

/** Parser fixtures mirroring the reference unit tests
  * (core/unittest/processor/ProcessorParse*Unittest.cpp shapes):
  * same input → same output contents, including the failure paths. */
class ParseOpsSpec extends AnyFunSuite {

  private val nginxLine =
    """10.0.0.1 - alice [01/Jan/2025:00:00:00 +0000] "GET /idx HTTP/1.1" 200 512 "-" "ua""""
  private val rx =
    "(\\S+) - (\\S+) \\[([^\\]]+)\\] \"(\\w+) (\\S+) ([^\"]+)\" (\\d+) (\\d+) \"([^\"]*)\" \"([^\"]*)\""
  private val keys = Seq("ip", "user", "time", "method", "path", "proto",
    "status", "bytes", "ref", "ua")

  test("regex parse: full match extracts capture i -> keys(i)") {
    val out = ParseOps.RegexParser("text", rx, keys)(textDf(nginxLine))
    val m = collectMaps(out).head
    assert(m("ip") == "10.0.0.1" && m("user") == "alice" &&
      m("status") == "200" && m("ua") == "ua")
    // success + default opts: source erased
    assert(m("text") == null)
  }

  test("regex parse: full-match anchoring rejects partial matches") {
    val out = ParseOps.RegexParser("text", "(\\d+)", Seq("n"))(
      textDf("abc 123 def"))
    val m = collectMaps(out).head
    assert(m("n") == null) // parse failed: unanchored '123' is not a full match
    assert(m("text") == "abc 123 def") // KeepingSourceWhenParseFail default true
  }

  test("regex parse failure paths: keep / drop / raw-log / rename") {
    val bad = textDf("garbage")
    // default: keep source on fail
    assert(collectMaps(ParseOps.RegexParser("text", rx, keys)(bad))
      .head("text") == "garbage")
    // keepFail=false: row dropped (ShouldEraseEvent)
    assert(ParseOps.RegexParser("text", rx, keys,
      ParserOptions(keepingSourceWhenParseFail = false))(bad).count() == 0)
    // copingRawLog: __raw_log__ stamped on fail only
    val withRaw = ParseOps.RegexParser("text", rx, keys,
      ParserOptions(copingRawLog = true))(textDf("garbage", nginxLine))
    val ms = collectMaps(withRaw)
    assert(ms.find(_("ip") == null).get("__raw_log__") == "garbage")
    assert(ms.find(_("ip") != null).get("__raw_log__") == null)
    // renamedSourceKey moves the kept value
    val ren = ParseOps.RegexParser("text", rx, keys,
      ParserOptions(renamedSourceKey = Some("rawText")))(textDf("garbage"))
    val mr = collectMaps(ren).head
    assert(mr("rawText") == "garbage" && mr("text") == null)
  }

  test("regex parse: reference tab vector with keep-both + raw-log options") {
    // ProcessorParseRegexNativeUnittest.cpp:157-231 — (\w+)\t(\w+).* on
    // "value1\tvalue2", KeepingSourceWhenParseSucceed + CopingRawLog
    val out = ParseOps.RegexParser("text", "(\\w+)\\t(\\w+).*",
      Seq("key1", "key2"),
      ParserOptions(keepingSourceWhenParseSucceed = true, copingRawLog = true))(
      textDf("value1\tvalue2"))
    val m = collectMaps(out).head
    assert(m("key1") == "value1" && m("key2") == "value2")
    assert(m("text") == "value1\tvalue2") // source kept on success
    assert(m("__raw_log__") == null)      // raw log only on failure
  }

  test("regex parse: keepingSourceWhenParseSucceed keeps source") {
    val out = ParseOps.RegexParser("text", rx, keys,
      ParserOptions(keepingSourceWhenParseSucceed = true))(textDf(nginxLine))
    assert(collectMaps(out).head("text") == nginxLine)
  }

  test("regex parse: whole-line fast path (.*)") {
    val out = ParseOps.RegexParser("text", "(.*)", Seq("content"))(textDf("x y"))
    assert(collectMaps(out).head("content") == "x y")
  }

  test("regex parse: existing keys are not overwritten (AddLog semantics)") {
    val s = spark; import s.implicits._
    val df = Seq(("99", "7")).toDF("n", "text")
    val out = ParseOps.RegexParser("text", "(\\d+)", Seq("n"))(df)
    assert(collectMaps(out).head("n") == "99")
  }

  test("json parse: members stringified, nested re-serialized compactly") {
    // ProcessorParseJsonNative.cpp:30-52 — numbers/bools/nested objects
    // all become strings; nested objects compact-serialized.
    val line = """{"s":"v","i":42,"f":1.5,"b":true,"o":{"a":1},"arr":[1,2]}"""
    val out = ParseOps.JsonParser("text",
      Seq("s", "i", "f", "b", "o", "arr"))(textDf(line))
    val m = collectMaps(out).head
    assert(m("s") == "v" && m("i") == "42" && m("f") == "1.5" &&
      m("b") == "true" && m("o") == """{"a":1}""" && m("arr") == "[1,2]")
  }

  test("json parse: non-object / invalid json fails the parse") {
    val out = ParseOps.JsonParser("text", Seq("k"))(
      textDf("[1,2]", "not json", """{"k":"v"}"""))
    val ms = collectMaps(out)
    assert(ms.count(_("k") != null) == 1)
    assert(ms.filter(_("k") == null).forall(_("text") != null)) // kept on fail
  }

  test("delimiter parse: quote mode + overflow __columnN__ + shortened") {
    val out = ParseOps.DelimiterParser("text", ",",
      Seq("a", "b"), quote = Some("\""), extraColumns = 1,
      opts = ParserOptions())(textDf("""1,"x,y",3"""))
    val m = collectMaps(out).head
    assert(m("a") == "1" && m("b") == "x,y" && m("__column2__") == "3")

    val short = ParseOps.DelimiterParser("text", ",", Seq("a", "b", "c"),
      allowShortenedFields = true)(textDf("1,2"))
    val ms = collectMaps(short).head
    assert(ms("a") == "1" && ms("b") == "2" && ms("c") == null)

    // not allowed: parse fails, source kept
    val strict = ParseOps.DelimiterParser("text", ",", Seq("a", "b", "c"))(
      textDf("1,2"))
    assert(collectMaps(strict).head("a") == null)
  }

  test("kv parse: delimiter/separator split with extract") {
    val p = ParseOps.KeyValueParser("text", " ", "=")
    val out = p.extract(textDf("k1=v1 k2=v2"), Seq("k1", "k2"))
    val m = collectMaps(out).head
    assert(m("k1") == "v1" && m("k2") == "v2")
  }

  test("apsara parse: base fields + microtime + kv tail") {
    val line = "[2024-01-01 12:00:00.123456]\t[ERROR]\t[12]\t[file.cpp:45]\tk:v\tx:y"
    val out = ParseOps.ApsaraParser("text")(textDf(line))
    val m = collectMaps(out).head
    assert(m("__LEVEL__") == "ERROR" && m("__THREAD__") == "12" &&
      m("__FILE__") == "file.cpp" && m("__LINE__") == "45")
    assert(m("microtime") == "1704110400123456")
    assert(m("apsara_kv").asInstanceOf[Map[String, String]] ==
      Map("k" -> "v", "x" -> "y"))
  }

  test("timestamp parse: format + timezone offset") {
    val s = spark; import s.implicits._
    val df = Seq("2024-03-01 10:30:00").toDF("t")
    val out = ParseOps.TimestampParser("t", "yyyy-MM-dd HH:mm:ss", "ts",
      timezone = Some("GMT+02:00"))(df)
    assert(out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0) == "2024-03-01 08:30:00") // shifted to UTC
    // unparseable -> null (try_to_timestamp), row kept
    val bad = ParseOps.TimestampParser("t", "yyyy-MM-dd", "ts")(
      Seq("nope").toDF("t"))
    assert(bad.head().isNullAt(1))
  }

  test("grok parse: dictionary expansion + first-match-wins alternatives") {
    val g = ParseOps.GrokParser("text", Seq(
      "%{IP:client} %{WORD:method} %{URIPATHPARAM:request} %{NUMBER:bytes} %{NUMBER:duration}",
      "%{LOGLEVEL:level}: %{GREEDYDATA:message}"))
    val out = g(textDf(
      "10.0.0.7 GET /index.html 15824 0.043",
      "ERROR: boom happened",
      "no match at all ???"))
    val ms = collectMaps(out)
    val m0 = ms.find(_("client") != null).get
    assert(m0("method") == "GET" && m0("request") == "/index.html" &&
      m0("bytes") == "15824" && m0("duration") == "0.043")
    val m1 = ms.find(_("level") != null).get
    assert(m1("message") == "boom happened")
    val m2 = ms.find(m => m("client") == null && m("level") == null).get
    assert(m2("text") == "no match at all ???") // kept on fail
  }

  test("json expand: nested keys flatten with connector up to depth; scalars kept") {
    val df = textDf(
      """{"a":"1","b":{"c":"2","d":{"e":"3"}},"f":"4"}""",
      """not json""")
    val out = ParseOps.JsonExpand("text", depth = 2, connector = "_")(df)
    val maps = collectMaps(out.select(col("text"), col("expanded")))
    val m = maps.find(_("text").toString.startsWith("{")).get("expanded")
      .asInstanceOf[Map[String, String]]
    assert(m("a") == "1" && m("f") == "4")
    assert(m("b_c") == "2")
    // depth 2: b.d stays as its JSON text, not expanded further
    assert(m("b_d").replaceAll("\\s", "") == """{"e":"3"}""")
    // depth 3 expands it
    val deep = ParseOps.JsonExpand("text", depth = 3)(df)
    val dm = collectMaps(deep.select(col("text"), col("expanded")))
      .find(_("text").toString.startsWith("{")).get("expanded")
      .asInstanceOf[Map[String, String]]
    assert(dm("b_d_e") == "3")
    // non-json rows: expanded is null, row preserved
    assert(maps.exists(m => m("text") == "not json" && m("expanded") == null))
  }

  test("json expand ExpandArray: reference vector (k[i] keys, object elements recurse, [] vanishes)") {
    // jsonVal + expectations from processor_json_test.go:50,204-224
    // (connector '-', prefix 'js_key-', unlimited depth -> depth 6 here)
    val jsonVal =
      """{"k1":{"k2":{"k3":{"k4":{"k51":"51","k52":"52"},"k41":"41"}}},"k6":[{"x":"a"},{"x":"b"}],"k7":[]}"""
    val out = ParseOps.JsonExpand("text", depth = 6, connector = "-",
      prefix = "js_key-", expandArray = true)(textDf(jsonVal))
    val m = collectMaps(out).head("expanded").asInstanceOf[Map[String, String]]
    assert(m == Map(
      "js_key-k1-k2-k3-k4-k51" -> "51",
      "js_key-k1-k2-k3-k4-k52" -> "52",
      "js_key-k1-k2-k3-k41" -> "41",
      "js_key-k6[0]-x" -> "a",
      "js_key-k6[1]-x" -> "b"))
    // expandArray=false keeps arrays as raw JSON text (default)
    val keep = ParseOps.JsonExpand("text", depth = 6, connector = "-")(
      textDf("""{"k6":[1,2]}"""))
    val km = collectMaps(keep).head("expanded").asInstanceOf[Map[String, String]]
    assert(km("k6").replaceAll("\\s", "") == "[1,2]")
  }

  test("anchor FieldType json: anchored substring expands into prefixed map keys") {
    // anchor.go:50,180-193 — JSON between anchors expands with
    // FieldName + connector prefixes
    val line = """ts=1 payload={"code":"7","detail":{"msg":"hi"}} tail"""
    // depth 1 = top-level keys only, nested object stays raw JSON text
    val out = FieldOps.Anchor("text", "payload=", " tail", "pl",
      fieldType = "json", expandDepth = 1)(textDf(line))
    val m = collectMaps(out).head("pl").asInstanceOf[Map[String, String]]
    assert(m("pl_code") == "7")
    assert(m("pl_detail").replaceAll("\\s", "") == """{"msg":"hi"}""")
    val deep = FieldOps.Anchor("text", "payload=", " tail", "pl",
      fieldType = "json", expandDepth = 2)(textDf(line))
    val dm = collectMaps(deep).head("pl").asInstanceOf[Map[String, String]]
    assert(dm("pl_detail_msg") == "hi")
  }
}
