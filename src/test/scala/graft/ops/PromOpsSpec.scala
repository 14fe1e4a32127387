package graft.ops
// (vector fixtures below cite the reference's own unit tests)

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession._

/** Prometheus exposition parse + relabel, mirroring the reference unit
  * tests (core/unittest/prometheus/TextParserUnittest.cpp,
  * RelabelUnittest.cpp shapes). */
class PromOpsSpec extends AnyFunSuite {

  private def parse(lines: String*) =
    collectMaps(PromOps.TextParser("text")(textDf(lines: _*)))

  private def labels(m: Map[String, Any]): Map[String, String] =
    m("labels").asInstanceOf[Map[String, String]]

  test("parse success vectors (TestParseSuccess)") {
    val out = parse(
      "foobar 123",
      "foobar 123.456 789\n",
      "cassandra_token_ownership_ratio 78.9",
      """foo{bar="#1 az"} 24""",
      """mssql_sql_server_active_transactions_sec{loginname="domain\somelogin",env="develop"} 56""",
      """foo{bar="b\"a\\z"} -1.2""",
      """foo {bar="baz",aa="",x="y"} 1 2""",
      "\t foo\t {  } 0.3\t 2",
      """vm_accounting	{   name="vminsertRows", accountID = "1" , projectID=	"1"   } 277779100""",
      "abc 123 456 # foobar",
      "abc 123 456.789",
      "test_metric{k1=\"v1\", k2=\"v2\" } 9.9410452992e+10 1715829785083 # exemplars")
    assert(out.length == 12)
    assert(out(0)("name") == "foobar" && out(0)("value") == 123.0 &&
      out(0)("ts_sec") == 0L) // default timestamp
    assert(out(1)("value") == 123.456 && out(1)("ts_sec") == 789L)
    assert(out(2)("value") == 78.9)
    assert(labels(out(3))("bar") == "#1 az") // '#' inside label value
    // invalid escape \s keeps BOTH chars (real-world mssql case)
    assert(labels(out(4))("loginname") == "domain\\somelogin" &&
      labels(out(4))("env") == "develop")
    assert(labels(out(5))("bar") == "b\"a\\z" && out(5)("value") == -1.2)
    assert(labels(out(6)) == Map("bar" -> "baz", "aa" -> "", "x" -> "y") &&
      out(6)("ts_sec") == 2L)
    assert(out(7)("name") == "foo" && labels(out(7)).isEmpty &&
      out(7)("value") == 0.3 && out(7)("ts_sec") == 2L)
    assert(labels(out(8)) == Map("name" -> "vminsertRows",
      "accountID" -> "1", "projectID" -> "1"))
    assert(out(9)("ts_sec") == 456L) // exemplar after timestamp
    // float timestamp: 456.789 s → sec 456, ns 789e6
    assert(out(10)("ts_sec") == 456L && out(10)("ts_ns") == 789000000L)
    assert(out(11)("name") == "test_metric" &&
      out(11)("value") == 9.9410452992e10 &&
      out(11)("ts_sec") == 1715829785L && out(11)("ts_ns") == 83000000L)
  }

  test("openmetrics infinity / nan spellings") {
    val out = parse("foo Infinity", "bar +Infinity", "baz -infinity",
      "aaa +inf", "bbb -INF", "ccc INF", "ddd NaN")
    assert(out(0)("value") == Double.PositiveInfinity)
    assert(out(1)("value") == Double.PositiveInfinity)
    assert(out(2)("value") == Double.NegativeInfinity)
    assert(out(3)("value") == Double.PositiveInfinity)
    assert(out(4)("value") == Double.NegativeInfinity)
    assert(out(5)("value") == Double.PositiveInfinity)
    assert(out(6)("value").asInstanceOf[Double].isNaN)
  }

  test("comments, blanks, and failure vectors drop (TestParseFaliure)") {
    assert(parse(
      "# TYPE cassandra_token_ownership_ratio gauge", // comment
      "   ", // blank
      "", // empty
      "foo bar 124", // second name token
      "foo 123 bar", // invalid timestamp
      "{k=\"v\"} 1", // no metric name
      "foo{k=\"v\" 1", // unterminated block
      "foo{k=v} 1" // unquoted label value
    ).isEmpty)
  }

  test("stod prefix semantics: longest numeric prefix, junk ignored") {
    // trailing chars stay within IsValidNumberChar ('z' would reject
    // the whole line, as in the reference)
    val out = parse("m 12x3", "n 7.5e1aa")
    assert(out(0)("value") == 12.0 && out(1)("value") == 75.0)
  }

  test("hostile timestamps survive ANSI: nan / out-of-int64 drop the " +
    "line, not the job") {
    // grammar-valid lines whose timestamp token is NaN or overflows
    // int64 milliseconds — a plain cast("long") would CAST_OVERFLOW
    // and kill the whole job under ANSI
    assert(parse("m 1 nan", "m 1 99999999999999999999",
      "m 1 -99999999999999999999", "m 1 1e300").isEmpty)
    // and a hostile line doesn't take valid neighbors down
    val out = parse("ok 1 5", "m 1 nan")
    assert(out.length == 1 && out(0)("name") == "ok" &&
      out(0)("ts_sec") == 5L)
  }

  test("relabel: keep/drop/replace/lowercase/hashmod/labelmap/labeldrop") {
    val base = PromOps.TextParser("text")(textDf(
      """http_requests{job="api-server",instance="host1",__meta_dc="east"} 10""",
      """http_requests{job="db-server",instance="host2",__meta_dc="west"} 20""",
      """node_load{job="node",instance="host3"} 1.5"""))

    // keep only api/db servers (full-match semantics)
    val kept = PromOps.Relabel(Seq(PromOps.RelabelRule("keep",
      sourceLabels = Seq("job"), regex = "(api|db)-server")))(base)
    assert(kept.count() == 2)

    // drop by name via __name__
    val dropped = PromOps.Relabel(Seq(PromOps.RelabelRule("drop",
      sourceLabels = Seq("__name__"), regex = "node_.*")))(base)
    assert(dropped.count() == 2)

    // replace: extract the role from job into a new label
    val rep = collectMaps(PromOps.Relabel(Seq(PromOps.RelabelRule("replace",
      sourceLabels = Seq("job"), regex = "(.*)-server",
      targetLabel = "role", replacement = "$1-role")))(base)
      .orderBy("value"))
    // value order: 1.5 (node), 10 (api), 20 (db)
    assert(labels(rep(1))("role") == "api-role")
    assert(labels(rep(2))("role") == "db-role")
    assert(!labels(rep(0)).contains("role")) // no match → no-op

    // replace into __name__ rewrites the metric name
    val renamed = collectMaps(PromOps.Relabel(Seq(PromOps.RelabelRule(
      "replace", sourceLabels = Seq("job"), regex = "node",
      targetLabel = "__name__", replacement = "node_metric")))(base)
      .orderBy("value"))
    assert(renamed(0)("name") == "node_metric" &&
      renamed(2)("name") == "http_requests")

    // lowercase into a target label
    val low = collectMaps(PromOps.Relabel(Seq(PromOps.RelabelRule(
      "uppercase", sourceLabels = Seq("job"), targetLabel = "job_uc")))(base)
      .orderBy("value"))
    assert(labels(low(1))("job_uc") == "API-SERVER")

    // hashmod is deterministic and within modulus
    val hm = collectMaps(PromOps.Relabel(Seq(PromOps.RelabelRule("hashmod",
      sourceLabels = Seq("instance"), targetLabel = "shard",
      modulus = 8)))(base))
    assert(hm.forall(m => labels(m)("shard").toLong < 8))
    val hm2 = collectMaps(PromOps.Relabel(Seq(PromOps.RelabelRule("hashmod",
      sourceLabels = Seq("instance"), targetLabel = "shard",
      modulus = 8)))(base))
    assert(hm.map(labels(_)("shard")) == hm2.map(labels(_)("shard")))

    // labelmap: __meta_* copied without prefix; labeldrop then removes meta
    val mapped = collectMaps(PromOps.Relabel(Seq(
      PromOps.RelabelRule("labelmap", regex = "__meta_(.*)",
        replacement = "$1"),
      PromOps.RelabelRule("labeldrop", regex = "__meta_.*")))(base)
      .orderBy("value"))
    assert(labels(mapped(1))("dc") == "east" &&
      !labels(mapped(1)).contains("__meta_dc"))

    // final sweep removes remaining __ labels
    val swept = collectMaps(PromOps.Relabel(Nil)(base).orderBy("value"))
    assert(!labels(swept(1)).contains("__meta_dc"))

    // dropmetric by match list
    assert(PromOps.Relabel(Seq(PromOps.RelabelRule("dropmetric",
      matchList = Set("node_load"))))(base).count() == 2)
  }

  test("replace: default regex (.*) copies a label exactly once, " +
    "named groups count, first-only keeps prefix+suffix") {
    def labels(m: Map[String, Any]) =
      m("labels").asInstanceOf[Map[String, String]]
    val base = PromOps.TextParser("text")(textDf("""m{job="api"} 1"""))

    // the most common relabel config: plain label copy via defaults
    val copied = collectMaps(PromOps.Relabel(Seq(PromOps.RelabelRule(
      "replace", sourceLabels = Seq("job"), targetLabel = "env")))(base))
    assert(labels(copied(0)) == Map("job" -> "api", "env" -> "api"))

    // constant replacement must also fire exactly once
    val const = collectMaps(PromOps.Relabel(Seq(PromOps.RelabelRule(
      "replace", sourceLabels = Seq("job"), targetLabel = "env",
      replacement = "prod")))(base))
    assert(labels(const(0)) == Map("job" -> "api", "env" -> "prod"))

    // named groups are numbered groups: the $rest index must account
    // for them (boost substitution keeps the unmatched suffix in BOTH
    // the target name and the value)
    val named = collectMaps(PromOps.Relabel(Seq(PromOps.RelabelRule(
      "replace", sourceLabels = Seq("job"), targetLabel = "who",
      regex = "(?<v>ap)", replacement = "z")))(base))
    assert(labels(named(0)) == Map("job" -> "api", "whoi" -> "zi"))

    // first-only: prefix and suffix survive, later matches untouched
    val mid = PromOps.TextParser("text")(textDf("""m{job="xaxa"} 1"""))
    val fo = collectMaps(PromOps.Relabel(Seq(PromOps.RelabelRule(
      "replace", sourceLabels = Seq("job"), targetLabel = "out",
      regex = "a", replacement = "B")))(mid))
    assert(labels(fo(0))("xoutxa") == "xBxa")
  }

  test("duplicate label names: last occurrence wins, no crash") {
    val out = collectMaps(PromOps.TextParser("text")(textDf(
      """m{a="1",b="x",a="2"} 3""")))
    assert(out(0)("labels").asInstanceOf[Map[String, String]] ==
      Map("a" -> "2", "b" -> "x"))
  }
}
