package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession._

class FilterFieldEnrichSpec extends AnyFunSuite {

  private def df3 = {
    val s = spark; import s.implicits._
    Seq(
      ("user", "hello world", "none"),
      ("tool", "run: ls -la", "bash"),
      ("assistant", "ERROR boom", "none")
    ).toDF("role", "text", "tool")
  }

  test("include filter: ALL key->regex full-match required") {
    val out = FilterOps.IncludeFilter(Map(
      "role" -> "tool", "tool" -> "bash|python"))(df3)
    assert(out.count() == 1)
    // partial match must not pass (full-match anchoring)
    assert(FilterOps.IncludeFilter(Map("role" -> "oo"))(df3).count() == 0)
  }

  test("exclude filter: ANY match drops") {
    val out = FilterOps.ExcludeFilter(Map("role" -> "tool|assistant"))(df3)
    assert(collectMaps(out).map(_("role")) == Seq("user"))
  }

  test("expression tree AND/OR/NOT") {
    import FilterOps._
    val cond = Or(Seq(
      And(Seq(KeyRegex("role", "tool"), KeyRegex("tool", "bash"))),
      Not(KeyRegex("text", ".*world.*"))))
    assert(ExpressionFilter(cond)(df3).count() == 2)
  }

  test("fields with condition: first matching case wins; drop-if-not-match") {
    import FilterOps._
    val op = FieldsWithCondition(Seq(
      Case(Seq(FieldCond("role", Equals, "tool")), true, Map("kind" -> "t")),
      Case(Seq(FieldCond("text", Contains, "ERROR"),
        FieldCond("role", StartWith, "a")), true, Map("kind" -> "err")),
      Case(Seq(FieldCond("role", Regexp, "t.*")), true, Map("kind" -> "never"))))
    val ms = collectMaps(op(df3))
    assert(ms.find(_("role") == "tool").get("kind") == "t") // not 'never'
    assert(ms.find(_("role") == "assistant").get("kind") == "err")
    assert(ms.find(_("role") == "user").get("kind") == null)
    assert(op.copy(dropIfNotMatch = true)(df3).count() == 2)
  }

  test("rate limit: at most N rows per fields x bucket, deterministic") {
    val s = spark; import s.implicits._
    val df = (0 until 10).map(i =>
      ("k", i, java.sql.Timestamp.valueOf(f"2025-01-01 00:00:${i % 4}%02d")))
      .toDF("role", "i", "ts")
    val out = FilterOps.RateLimit(Seq("role"), limit = 1,
      bucket = "1 second", tieBreak = Seq("i"))(df)
    // 4 distinct seconds -> 4 kept
    assert(out.count() == 4)
    // deterministic: smallest i per second wins
    assert(collectMaps(out).map(_("i")).toSet == Set(0, 1, 2, 3))
  }

  test("field ops: add/rename/pick/appender") {
    val d1 = FieldOps.AddFields(Map("env" -> "prod"))(df3)
    assert(collectMaps(d1).forall(_("env") == "prod"))
    val d2 = FieldOps.AddFields(Map("role" -> "X"), ignoreIfExist = true)(df3)
    assert(collectMaps(d2).head("role") != "X")
    val d3 = FieldOps.Rename(Map("role" -> "speaker"))(df3)
    assert(d3.columns.contains("speaker") && !d3.columns.contains("role"))
    val d4 = FieldOps.Appender("tool", "|suffix")(df3)
    assert(collectMaps(d4).head("tool") == "none|suffix")
    val sorted = FieldOps.Appender("tool", "|aaa", sortLabels = true)(df3)
    assert(collectMaps(sorted).head("tool") == "aaa|none")
  }

  test("desensitize: const global mask and md5-of-content") {
    val s = spark; import s.implicits._
    val df = Seq("pwd=secret1 other pwd=secret2").toDF("text")
    val masked = FieldOps.Desensitize("text", "pwd=", "\\w+")(df)
    assert(collectMaps(masked).head("text") ==
      "pwd=******** other pwd=********")
    val hashed = FieldOps.Desensitize("text", "pwd=", "secret1",
      method = "md5")(df)
    val got = collectMaps(hashed).head("text").asInstanceOf[String]
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("secret1".getBytes).map("%02x".format(_)).mkString
    assert(got == s"pwd=$md5hex other pwd=secret2")
  }

  test("desensitize/string_replace: first-only mode (ReplaceAll=false)") {
    val s = spark; import s.implicits._
    val df = Seq("pwd=secret1 other pwd=secret2").toDF("text")
    val firstOnly = FieldOps.Desensitize("text", "pwd=", "\\w+",
      replaceAll = false)(df)
    assert(collectMaps(firstOnly).head("text") ==
      "pwd=******** other pwd=secret2")
    val sr = FieldOps.StringReplace("text", "secret\\d", "X",
      replaceAll = false)(df)
    assert(collectMaps(sr).head("text") == "pwd=X other pwd=secret2")
    // no match: row unchanged
    val none = FieldOps.Desensitize("text", "token=", "\\w+",
      replaceAll = false)(df)
    assert(collectMaps(none).head("text") == "pwd=secret1 other pwd=secret2")
  }

  test("appender: {{$env}} / {{__host__}} templates expand at plan time") {
    val s = spark; import s.implicits._
    val df = Seq("base").toDF("labels")
    val fakeEnv = Map("REGION" -> "eu-1").get _
    val out = FieldOps.Appender("labels", "|region={{$REGION}}|x={{$MISSING}}|k={{custom}}",
      env = fakeEnv)(df)
    assert(collectMaps(out).head("labels") == "base|region=eu-1|x=|k=custom")
    val host = FieldOps.Appender("labels", "|h={{__host__}}", env = fakeEnv)(df)
    val got = collectMaps(host).head("labels").asInstanceOf[String]
    assert(got.startsWith("base|h=") && got.length > "base|h=".length)
  }

  test("filter_key_regex: every include must match some key; any exclude match drops") {
    val s = spark; import s.implicits._
    // vectors per the reference's own test (filter_key_regex_test.go
    // TestMatch: Include content/key1/key2, Exclude keyd)
    val df = Seq(
      (1, Map("content" -> "x", "key1" -> "v1", "key2" -> "v2")),
      (2, Map("content" -> "x", "key1" -> "v1")), // include key2 unmet
      (3, Map("content" -> "x", "key1" -> "v1", "key2" -> "v2", "keyd1" -> "z")),
      (4, null.asInstanceOf[Map[String, String]])
    ).toDF("id", "m")
    val f = FilterOps.KeyRegexFilter("m",
      include = Seq("content", "key1", "key2"), exclude = Seq("keyd"))
    assert(f(df).select("id").collect().map(_.getInt(0)).toSeq == Seq(1))
    // exclude-only: a keyless (null) map has nothing to exclude -> kept
    val exOnly = FilterOps.KeyRegexFilter("m", exclude = Seq("keyd"))
    assert(exOnly(df).select("id").collect().map(_.getInt(0)).toSet == Set(1, 2, 4))
    // unanchored search semantics: "key" matches key1/keyd1
    val inc = FilterOps.KeyRegexFilter("m", include = Seq("key"))
    assert(inc(df).count() == 3)
  }

  test("string_replace first-only: capture-group refs in replacement stay aligned") {
    val s = spark; import s.implicits._
    val df = Seq("pwd=secret1 other pwd=secret2").toDF("text")
    // the wrapper pattern prepends one group; $1/$2 must still mean the
    // CALLER's groups
    val sr = FieldOps.StringReplace("text", "(secret)(\\d)", "$2-$1",
      replaceAll = false)(df)
    assert(collectMaps(sr).head("text") == "pwd=1-secret other pwd=secret2")
    // a literal \$ escape survives untouched
    val lit = FieldOps.StringReplace("text", "secret(\\d)", "\\$$1",
      replaceAll = false)(df)
    assert(collectMaps(lit).head("text") == "pwd=$1 other pwd=secret2")
    // Java appendReplacement greed: "$12" against a 2-group pattern is
    // group 1 then literal '2', and must stay that after the shift
    val greedy = FieldOps.StringReplace("text", "(secret)(\\d)", "$12",
      replaceAll = false)(df)
    assert(collectMaps(greedy).head("text") == "pwd=secret2 other pwd=secret2")
    // $0 = the whole user match (not the wrapper prefix)
    val whole = FieldOps.StringReplace("text", "secret\\d", "[$0]",
      replaceAll = false)(df)
    assert(collectMaps(whole).head("text") == "pwd=[secret1] other pwd=secret2")
    // leading zero: "$09" is group 0 then literal '9' (Java greed stops
    // when the extended number exceeds the pattern's group count)
    val zero = FieldOps.StringReplace("text", "(secret)(\\d)", "$09",
      replaceAll = false)(df)
    assert(collectMaps(zero).head("text") == "pwd=secret19 other pwd=secret2")
  }

  test("encrypt: aes_decrypt round-trips the plaintext (CBC/PKCS, iv-prefixed)") {
    val s = spark; import s.implicits._
    val keyHex = "00112233445566778899aabbccddeeff"
    val df = Seq("attack at dawn", "", "unicode €𝄞").toDF("text")
    val enc = FieldOps.Encrypt("text", keyHex,
      ivHex = "000102030405060708090a0b0c0d0e0f")(df)
    // ciphertext != plaintext, and decrypt(key) recovers it exactly
    val dec = enc.select(
      aes_decrypt(unbase64(col("text")), unhex(lit(keyHex)),
        lit("CBC"), lit("PKCS"), lit("".getBytes)).cast("string").as("back"))
      .collect().map(_.getString(0)).toSeq
    assert(dec == Seq("attack at dawn", "", "unicode €𝄞"))
    assert(!collectMaps(enc).map(_("text")).contains("attack at dawn"))
  }

  test("base64 round trip, md5, pack_json, anchor") {
    val s = spark; import s.implicits._
    val df = Seq(("abc", "start[MID]stop")).toDF("a", "b")
    val enc = FieldOps.Base64Encode("a", "e")(df)
    val dec = FieldOps.Base64Decode("e", "d")(enc)
    assert(collectMaps(dec).head("d") == "abc")
    val h = FieldOps.Md5("a", "h")(df)
    assert(collectMaps(h).head("h") == "900150983cd24fb0d6963f7d28e17f72")
    val pj = FieldOps.PackJson(Seq("a"), "j")(df)
    assert(collectMaps(pj).head("j") == """{"a":"abc"}""")
    val an = FieldOps.Anchor("b", "start[", "]stop", "mid")(df)
    assert(collectMaps(an).head("mid") == "MID")
  }

  test("dict map: overwrite vs fill vs missing default; broadcast plan") {
    val s = spark; import s.implicits._
    val df = Seq(("bash", "old"), ("nope", "old2"), (null, "old3"))
      .toDF("tool", "fam")
    val dict = Map("bash" -> "exec")
    val over = EnrichOps.DictMap(dict, "tool", "fam")(df)
    assert(collectMaps(over).map(_("fam")) == Seq("exec", "old2", "old3"))
    val fill = EnrichOps.DictMap(dict, "tool", "fam", mode = "fill")(df)
    assert(collectMaps(fill).map(_("fam")) == Seq("old", "old2", "old3"))
    val miss = EnrichOps.DictMap(dict, "tool", "fam2",
      handleMissing = true, missing = "Unknown")(df)
    assert(collectMaps(miss).map(_("fam2")) == Seq("exec", "Unknown", "Unknown"))
    // physical plan must be a broadcast join (never shuffle the fact side)
    val plan = over.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("range lookup is a broadcast range join") {
    val s = spark; import s.implicits._
    val facts = Seq(1L, 7L, 100L).toDF("v")
    val ranges = Seq((0L, 5L, "low"), (5L, 50L, "mid")).toDF("lo", "hi", "tier")
    val out = EnrichOps.RangeLookup(ranges, "v")(facts)
    assert(collectMaps(out).map(_("tier")) == Seq("low", "mid", null))
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    // an input column that happens to be named lo/hi survives the
    // lookup (only the ranges side's bound columns are dropped)
    val factsLo = Seq((1L, "keep")).toDF("v", "lo")
    val outLo = EnrichOps.RangeLookup(ranges, "v")(factsLo)
    assert(outLo.columns.count(_ == "lo") == 1)
    assert(collectMaps(outLo).head("lo") == "keep")
  }
}
