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
