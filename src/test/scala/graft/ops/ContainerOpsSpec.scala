package graft.ops
// (vector fixtures below cite the reference's own unit tests)

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession._

/** Container stdout parse fixtures mirroring the reference unit tests
  * (core/unittest/processor/ProcessorParseContainerLogNativeUnittest.cpp):
  * same input line → same parsed contents, including every corner of the
  * flag grammar and the docker strict-three-string-keys rule.
  */
class ContainerOpsSpec extends AnyFunSuite {

  private val T = "2024-01-05T23:28:06.818486411+08:00"

  // --- CRI (containerd text) ------------------------------------------------

  test("cri corner grammar: flag only counts as a lone P/F plus space " +
    "(unittest TestContainerdLog corner block, cpp lines 765-880)") {
    val out = collectMaps(ContainerOps.CriParser("text")(textDf(
      s"$T stdout P ", // P flag, empty content
      s"$T stdout P", // no trailing space: content is the literal "P"
      s"$T stdout ", // no flag, empty content
      s"$T stdout", // no space after stream → parse failure
      s"${T}stdout" // no first space → parse failure
    )))
    assert(out(0)("_time_") == T && out(0)("_source_") == "stdout" &&
      out(0)("__partial__") == true && out(0)("content") == "")
    assert(out(1)("__partial__") == false && out(1)("content") == "P")
    assert(out(2)("__partial__") == false && out(2)("content") == "")
    // failures keep the raw source (KeepingSourceWhenParseFail default)
    assert(out(3)("_time_") == null && out(3)("text") == s"$T stdout")
    assert(out(4)("_time_") == null && out(4)("text") == s"${T}stdout")
  }

  test("cri: P/F flag content and multi-char pseudo-flags") {
    val out = collectMaps(ContainerOps.CriParser("text")(textDf(
      s"$T stdout P Exception", // partial
      s"$T stdout F  java.lang.NPE", // full; content keeps its leading space
      s"$T stderr PP 1", // "PP" is not a flag → content "PP 1"
      s"$T stdxxx F x" // invalid stream → failure
    )))
    assert(out(0)("__partial__") == true && out(0)("content") == "Exception")
    assert(out(1)("__partial__") == false &&
      out(1)("content") == " java.lang.NPE")
    assert(out(2)("__partial__") == false && out(2)("content") == "PP 1" &&
      out(2)("_source_") == "stderr")
    assert(out(3)("_source_") == null)
  }

  test("cri: ignoringStdout/ignoringStderr drop parsed rows of that stream " +
    "(unittest TestIgnoringStdoutStderr)") {
    val lines = textDf(
      s"$T stdout P Exception", s"$T stderr F  abc1", s"$T stdout F  abc4")
    assert(ContainerOps.CriParser("text", ignoringStdout = true,
      ignoringStderr = true)(lines).count() == 0)
    val noOut = collectMaps(
      ContainerOps.CriParser("text", ignoringStdout = true)(lines))
    assert(noOut.map(_("_source_")) == Seq("stderr"))
    val noErr = collectMaps(
      ContainerOps.CriParser("text", ignoringStderr = true)(lines))
    assert(noErr.map(_("_source_")).forall(_ == "stdout"))
  }

  test("cri + mergeByFlag: a partial run plus first full line is one record " +
    "concatenated without separators (MergeLogsByFlag)") {
    val s = spark
    import s.implicits._
    val lines = Seq(
      ("c1", 0L, s"$T stdout P Exception"),
      ("c1", 1L, s"$T stdout P  in thread"),
      ("c1", 2L, s"$T stdout P   'main'"),
      ("c1", 3L, s"$T stdout F  java.lang.NullPoinntterException"),
      ("c1", 4L, s"$T stderr F  abc1"),
      ("c1", 5L, s"$T stdout P tail-partial"), // trailing P run still merges
      ("c2", 0L, s"$T stdout F  abc4")
    ).toDF("conv_id", "turn_idx", "text")
    val merged = collectMaps(
      ContainerOps.mergeByFlag(ContainerOps.CriParser("text")(lines))
        .orderBy("conv_id", "record"))
    assert(merged.map(_("content")) == Seq(
      "Exception in thread  'main' java.lang.NullPoinntterException",
      " abc1",
      "tail-partial",
      " abc4"))
    // record metadata comes from the FIRST line of the run
    assert(merged.head("time_first") == T &&
      merged.head("source") == "stdout" && merged.head("n_lines") == 4L)
  }

  // --- Docker json-file -----------------------------------------------------

  private def docker(lines: String*) = collectMaps(
    ContainerOps.DockerJsonParser("text")(textDf(lines: _*)))

  test("docker json: valid line parses with unescape and ONE trailing " +
    "newline stripped (unittest TestDockerJsonLogLineParser)") {
    val out = docker(
      """{"log":"Exception in thread  \"main\" java.lang.NPE\n","stream":"stdout","time":"2024-02-19T03:49:37.793533014Z"}""",
      """{"log":"two\nlines\n\n","stream":"stderr","time":"t2"}""",
      """{"log":"","stream":"stdout","time":"t3"}""")
    assert(out(0)("content") == "Exception in thread  \"main\" java.lang.NPE")
    assert(out(0)("_source_") == "stdout" &&
      out(0)("_time_") == "2024-02-19T03:49:37.793533014Z")
    // only the LAST \n is stripped; interior ones survive
    assert(out(1)("content") == "two\nlines\n")
    assert(out(2)("content") == "") // empty log is valid
  }

  test("docker json strictness: missing/renamed key, non-string value, " +
    "extra key, bad stream, non-json all fail " +
    "(reference requires exactly three string-typed keys)") {
    val bads = Seq(
      """{"log1":"x\n","stream":"stdout","time":"t"}""", // renamed key
      """{"log":1,"stream":"stdout","time":"t"}""", // non-string log
      """{"log":"x\n","stream":"stdout","time":1}""", // non-string time
      """{"log":"x\n","stream":"std","time":"t"}""", // invalid stream
      """{"log":"x\n","stream":"stdout","time":"t","attrs":{"a":"b"}}""", // extra key
      """not json at all""",
      """{"log":"x\n","stream":"stdout","time":"t"} trailing""",
      // trailing junk that itself ends in '}' — the object must consume
      // the whole line (ParseDockerLog: closing '}' is the LAST byte)
      """{"log":"x\n","stream":"stdout","time":"t"} {"a":"b"}""",
      """{"log":"x\n","stream":"stdout","time":"t"} """, // trailing space
      """ {"log":"x\n","stream":"stdout","time":"t"}""") // leading space
    val out = docker(bads: _*)
    assert(out.forall(m => m("_time_") == null && m("content") == null))
    // failures keep the raw source by default …
    assert(out.map(_("text")) == bads)
    // … and are dropped with keepingSourceWhenParseFail=false
    assert(ContainerOps.DockerJsonParser("text",
      keepingSourceWhenParseFail = false)(textDf(bads: _*)).count() == 0)
  }

  test("docker json: key order does not matter (reference loop accepts " +
    "log/stream/time in any order)") {
    val out = docker(
      """{"time":"t","log":"x\n","stream":"stdout"}""")
    assert(out(0)("content") == "x" && out(0)("_source_") == "stdout")
  }
}
