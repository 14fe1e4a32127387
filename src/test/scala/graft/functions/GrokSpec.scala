package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class GrokSpec extends AnyFunSuite {

  test("decapture rewrites capturing groups only") {
    assert(Grok.decapture("(a)(?:b)(?=c)\\(d[()]e") ==
      "(?:a)(?:b)(?=c)\\(d[()]e")
  }

  test("compile: aliases in group order, unaliased non-capturing") {
    val (rx, keys) = Grok.compile("%{IP:client} %{WORD} %{NUMBER:n}")
    assert(keys == Seq("client", "n"))
    val m = java.util.regex.Pattern.compile(rx)
      .matcher("10.1.2.3 go 42.5")
    assert(m.matches())
    assert(m.group(1) == "10.1.2.3" && m.group(2) == "42.5")
  }

  test("compile: type suffix dropped, custom patterns, unknown rejected") {
    val (_, keys) = Grok.compile("%{POSINT:pid:int}")
    assert(keys == Seq("pid"))
    val (rx, k2) = Grok.compile("%{MYPAT:x}", Map("MYPAT" -> "[abc]+"))
    assert(k2 == Seq("x") && "abc".matches(rx))
    intercept[IllegalArgumentException](Grok.compile("%{NOPE:x}"))
  }

  test("compile: recursive dictionary expansion (HTTPDATE)") {
    val (rx, keys) = Grok.compile("\\[%{HTTPDATE:t}\\]")
    assert(keys == Seq("t"))
    assert("[01/Jan/2025:00:00:00 +0000]".matches(rx))
  }

  test("combined apache log composite pattern parses a full access line") {
    import graft.SparkTestSession._
    import graft.ops.ParseOps
    val line = """10.1.2.3 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326 "http://ref/" "Mozilla/4.08""""
    val out = ParseOps.GrokParser("text", Seq("%{COMBINEDAPACHELOG}"))(
      textDf(line))
    val m = collectMaps(out).head
    assert(m("clientip") == "10.1.2.3" && m("auth") == "frank" &&
      m("verb") == "GET" && m("response") == "200" && m("bytes") == "2326" &&
      m("agent") == "\"Mozilla/4.08\"")
  }

  test("uuid / mac / email / syslog patterns match") {
    val cases = Seq(
      "%{UUID:u}" -> "123e4567-e89b-12d3-a456-426614174000",
      "%{MAC:m}" -> "aa:bb:cc:dd:ee:ff",
      "%{EMAILADDRESS:e}" -> "alice.b@example.org",
      "%{SYSLOGTIMESTAMP:t}" -> "Jan  7 04:05:06",
      "%{DATE_US:d}" -> "10/31/2025")
    cases.foreach { case (pat, s) =>
      val (rx, _) = Grok.compile(pat)
      assert(s.matches(rx), s"$pat should match '$s'")
    }
  }

  test("typed aliases: %{P:alias:type} yields cast columns") {
    import graft.SparkTestSession._
    import graft.ops.ParseOps
    val (_, typed) = Grok.compileTyped("%{INT:pid:int} %{NUMBER:dur:float} %{WORD:name}")
    assert(typed == Seq("pid" -> Some("int"), "dur" -> Some("float"),
      "name" -> None))
    val out = ParseOps.GrokParser("text",
      Seq("%{INT:pid:int} %{NUMBER:dur:float} %{WORD:name}"))(
      textDf("42 1.5 boot"))
    val schema = out.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("pid") == "long" && schema("dur") == "double" &&
      schema("name") == "string")
    val r = out.select("pid", "dur", "name").head()
    assert(r.getLong(0) == 42L && r.getDouble(1) == 1.5 &&
      r.getString(2) == "boot")
  }
}
