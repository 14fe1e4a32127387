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
