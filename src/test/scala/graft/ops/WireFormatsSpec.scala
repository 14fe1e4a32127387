package graft.ops
// (vector fixtures below cite the reference's own unit tests)

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession._

/** Influx line-protocol and statsd decode vectors mirroring the
  * reference decoder tests
  * (pkg/protocol/decoder/influxdb/decoder_test.go textFormat /
  * txtWithDotNames; statsd via the dogstatsd grammar). */
class WireFormatsSpec extends AnyFunSuite {

  private def influx(extend: Boolean, lines: String*) =
    collectMaps(WireFormats.InfluxLineParser("text", fieldsExtend = extend,
      defaultTimeNano = 7L)(textDf(lines: _*)))

  test("influx value types: int/float/bool renderings (textFormat)") {
    val out = influx(false,
      "cpu value=1i",
      "cpu_load value=1",
      "cpu_load value=1.0",
      "cpu_load value=1.2",
      "error fatal=true",
      "event msg=\"logged out\"") // string dropped without fieldsExtend
    assert(out.map(m => (m("__name__"), m("__value__"))) == Seq(
      ("cpu", "1"), ("cpu_load", "1"), ("cpu_load", "1"),
      ("cpu_load", "1.2"), ("error:fatal", "1")))
    assert(out.forall(_("__labels__") == ""))
    assert(out.forall(_("__time_nano__") == 7L))
  }

  test("influx multi-field points explode to one row per field") {
    val out = influx(false,
      "cpu load=10,alert=true,reason=\"value above maximum threshold\"")
    assert(out.map(m => (m("__name__"), m("__value__"))).toSet == Set(
      ("cpu:load", "10"), ("cpu:alert", "1"))) // string field dropped
  }

  test("influx tags: sorted #$# labels, escapes in idents (textFormat tail)") {
    val out = influx(false,
      "cpu,host=server01,region=uswest value=1 1434055562000000000",
      "cpu,host=server\\ 01,region=uswest value=1,msg=\"all systems nominal\"",
      "cpu,host=server\\ 01,region=us\\,west value_int=1i")
    assert(out(0)("__labels__") == "host#$#server01|region#$#uswest" &&
      out(0)("__time_nano__") == 1434055562000000000L &&
      out(0)("__name__") == "cpu")
    assert(out(1)("__labels__") == "host#$#server 01|region#$#uswest")
    assert(out(2)("__labels__") == "host#$#server 01|region#$#us,west" &&
      out(2)("__name__") == "cpu:value_int")
  }

  test("influx fieldsExtend: strings kept, __type__/__field__ emitted " +
    "(TestFieldsExtend txtWithDotNames)") {
    val out = influx(true,
      "cpu.load,host=server01,region=uswest value=1 1434055562000000000",
      "cpu.load,host.dd=server02,region=uswest tt=\"xx\",value=3 1434055562000010000")
    val rows = out.map(m => (m("__name__"), m("__value__"), m("__type__"),
      m("__field__"), m("__labels__"))).toSet
    assert(rows == Set(
      ("cpu.load", "1", "float", "value", "host#$#server01|region#$#uswest"),
      ("cpu.load:tt", "xx", "string", "tt", "host.dd#$#server02|region#$#uswest"),
      ("cpu.load", "3", "float", "value", "host.dd#$#server02|region#$#uswest")))
  }

  test("influx malformed lines drop") {
    val out = influx(false,
      "no_fields_here",
      ",missing=meas value=1",
      "ok value=2")
    assert(out.map(_("__name__")) == Seq("ok"))
  }

  test("hostile numerics survive ANSI mode: ts overflow drops the line, " +
    "huge/NaN floats render plainly, bad statsd rate drops the frame") {
    // int64-overflowing timestamp: line drops (reference rejects the
    // point on ParseInt error); must not throw under ANSI
    val ts = influx(false,
      "cpu value=1 99999999999999999999999",
      "cpu value=2 1434055562000000000")
    assert(ts.map(_("__value__")) == Seq("2"))
    // 1e300 / NaN / Infinity all pass the bare-value regex; plain
    // double→long cast would CAST_OVERFLOW — render via the non-integral
    // branch instead
    val big = influx(false, "m a=1e300,b=0.5")
    assert(big.map(m => (m("__name__"), m("__value__"))).toSet ==
      Set(("m:a", "1.0E300"), ("m:b", "0.5")))
    // rate matches [0-9.]+ but is not a number → frame drops, no throw
    val sd = collectMaps(WireFormats.StatsdParser("text")(textDf(
      "a:1|c|@1.2.3", "b:2|c|@0.25")))
    assert(sd.map(m => (m("__name__"), m("__rate__"))) == Seq(("b", 0.25)))
  }

  test("otlp/json logs: the reference textFormat vector " +
    "(decoder_test.go:39) — fields, sorted-attr JSON, resources") {
    val payload =
      """{"resourceLogs":[{"resource":{"attributes":[""" +
        """{"key":"service.name","value":{"stringValue":"OtlpExporterExample"}},""" +
        """{"key":"telemetry.sdk.language","value":{"stringValue":"java"}},""" +
        """{"key":"telemetry.sdk.name","value":{"stringValue":"opentelemetry"}},""" +
        """{"key":"telemetry.sdk.version","value":{"stringValue":"1.18.0"}}]},""" +
        """"scopeLogs":[{"scope":{"name":"io.opentelemetry.example"},"logRecords":[""" +
        """{"timeUnixNano":"1663904182348000000","severityNumber":9,"severityText":"INFO","body":{"stringValue":"log body1"},"attributes":[{"key":"k1","value":{"stringValue":"v1"}},{"key":"k2","value":{"stringValue":"v2"}}],"traceId":"","spanId":""},""" +
        """{"timeUnixNano":"1663904182348000000","severityNumber":9,"severityText":"INFO","body":{"stringValue":"log body2"},"attributes":[{"key":"k1","value":{"stringValue":"v1"}},{"key":"k2","value":{"stringValue":"v2"}}],"traceId":"","spanId":""}]}]}]}"""
    val out = collectMaps(WireFormats.OtlpLogParser("text")(textDf(
      payload,
      """{"level":"INFO","msg":"not otlp"}""", // JSON but no resourceLogs
      "plain text line")))
    assert(out.size == 2)
    assert(out.map(_("content")) == Seq("log body1", "log body2"))
    assert(out.forall(m =>
      m("time_unix_nano") == 1663904182348000000L &&
        m("severity_number") == 9L && m("severity_text") == "INFO" &&
        m("attributes") == """{"k1":"v1","k2":"v2"}""" &&
        m("resources") == """{"service.name":"OtlpExporterExample","telemetry.sdk.language":"java","telemetry.sdk.name":"opentelemetry","telemetry.sdk.version":"1.18.0"}"""))
  }

  test("otlp/json logs: mixed-type bodies and attributes, empty maps " +
    "render empty, attr escaping") {
    val payload =
      """{"resourceLogs":[{"resource":{},"scopeLogs":[{"logRecords":[""" +
        """{"timeUnixNano":"5","severityNumber":17,"severityText":"ERROR","body":{"intValue":"123"},"attributes":[""" +
        """{"key":"n","value":{"intValue":"42"}},{"key":"b","value":{"boolValue":true}},{"key":"s","value":{"stringValue":"a\"b"}}]},""" +
        """{"body":{"stringValue":"bare"}}]}]}]}"""
    val out = collectMaps(WireFormats.OtlpLogParser("text")(textDf(payload)))
    assert(out.size == 2)
    assert(out(0)("content") == "123")
    // keys sorted: b < n < s; int/bool bare, string quoted+escaped
    assert(out(0)("attributes") == """{"b":true,"n":42,"s":"a\"b"}""")
    assert(out(0)("resources") == "")
    // absent time/severity default to 0/""
    assert(out(1)("content") == "bare" && out(1)("time_unix_nano") == 0L &&
      out(1)("severity_number") == 0L && out(1)("severity_text") == "" &&
      out(1)("attributes") == "")
  }

  test("otlp/json logs: hostile non-numeric intValue can't splice " +
    "invalid JSON into the attributes column") {
    val payload =
      """{"resourceLogs":[{"resource":{},"scopeLogs":[{"logRecords":[""" +
        """{"body":{"stringValue":"x"},"attributes":[""" +
        """{"key":"bad","value":{"intValue":"12abc"}},""" +
        """{"key":"pad","value":{"intValue":"007"}}]}]}]}]}"""
    val out = collectMaps(WireFormats.OtlpLogParser("text")(textDf(payload)))
    // "12abc" is not an int64 → quoted-string fallback (valid JSON);
    // "007" canonicalizes to 7 as jsonpb would render the int64
    assert(out(0)("attributes") == """{"bad":"12abc","pad":7}""")
  }

  test("statsd frames: value/type/rate/tags") {
    val out = collectMaps(WireFormats.StatsdParser("text")(textDf(
      "page.views:1|c",
      "fuel.level:0.5|g",
      "song.length:240|h|@0.5",
      "users.online:1|c|@0.5|#country:china,city:hz",
      "not a statsd line")))
    assert(out.size == 4)
    assert(out(0)("__name__") == "page.views" && out(0)("__value__") == 1.0 &&
      out(0)("__stype__") == "c" && out(0)("__rate__") == 1.0)
    assert(out(1)("__value__") == 0.5 && out(1)("__stype__") == "g")
    assert(out(2)("__rate__") == 0.5)
    assert(out(3)("__labels__") == "city#$#hz|country#$#china")
  }
}
