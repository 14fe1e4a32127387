package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession._

/** Pyroscope groups-format profile decode
  * (pkg/protocol/decoder/pyroscope/decoder.go,
  * pkg/helper/profile/pyroscope/raw/profile.go,
  * pkg/helper/profile/meta.go). The first case replays the field
  * expectations of decoder_test.go:34-82 (the trie test — iteration
  * order aside, the per-stack callback and every emitted field are the
  * same code path the groups format drives). */
class PyroscopeOpsSpec extends AnyFunSuite {

  private def reqDf(rows: (String, String, String, String, String,
      String, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("body", "name", "from", "until", "sampleRate",
      "spyName", "units", "aggregationType")
  }

  // the decoder_test.go:63 request params
  private val testReq = (body: String) => reqDf(
    (body, "demo.cpu{a=b}", "1673495500", "1673495510", "100",
      "ebpfspy", "samples", "sum"))

  test("decoder_test.go field vector: name/stack split, samples → " +
    "nanoseconds scaling, .cpu rewrite, label merge, spy trim") {
    val out = collectMaps(PyroscopeOps.GroupsParser(
      tags = Map("cluster" -> "sls-mall"))(
      testReq("foo;bar;baz 1\nzoo;boo 1"))
      .orderBy("name"))
    assert(out.size == 2)
    val baz = out.find(_("name") == "baz").get
    assert(baz("stack") == "bar\nfoo") // reversed, \n-joined
    assert(baz("language") == "ebpf") // pyroscope-…spy trims
    assert(baz("type") == "profile_cpu")
    assert(baz("units") == "nanoseconds") // samples rewrite
    assert(baz("valueTypes") == "cpu")
    assert(baz("aggTypes") == "sum")
    assert(baz("dataType") == "CallStack")
    assert(baz("durationNs") == 10000000000L)
    assert(baz("labels") ==
      """{"__name__":"demo","a":"b","cluster":"sls-mall"}""")
    assert(baz("val") == "10000000.00") // 1 × (1e9 / 100)
    assert(baz("_ts_").toString.startsWith("2023-01-12"))
    assert(baz("stackID").asInstanceOf[String]
      .matches("[0-9a-f]{1,16}"))
    val boo = out.find(_("name") == "boo").get
    assert(boo("stack") == "zoo")
  }

  test("frame layout by spy language: PosFirst vs FunctionFirst vs " +
    "unmapped, first+last token selection (meta.go:178-204)") {
    // three tokens: middle drops; rbspy → rb is PosFirst (pos name)
    val rb = collectMaps(PyroscopeOps.GroupsParser()(reqDf(
      ("lib.rb:63 - tag_wrapper;child.rb:9 - f 2", "app{}", "1", "2",
        "100", "pyroscope-rbspy", "bytes", "avg"))))
    assert(rb.head("name") == "f child.rb:9" &&
      rb.head("stack") == "tag_wrapper lib.rb:63")
    // go → FunctionFirst (name pos)
    val go = collectMaps(PyroscopeOps.GroupsParser()(reqDf(
      ("compress.NewWriter mid /go/deflate.go 3", "app", "1", "2",
        "100", "gospy", "bytes", "avg"))))
    assert(go.head("name") == "compress.NewWriter /go/deflate.go")
    // unmapped spy → frame untouched
    val other = collectMaps(PyroscopeOps.GroupsParser()(reqDf(
      ("a b c 3", "app", "1", "2", "100", "mysteryspy", "bytes", "avg"))))
    assert(other.head("name") == "a b c")
    // frame without a space → untouched regardless of spy
    assert(go.head("language") == "go" && rb.head("language") == "rb")
  }

  test("line discipline: no-space lines and bad counts drop, trailing " +
    "';' frame trims, single-frame stack is empty, \\r stripped") {
    val out = collectMaps(PyroscopeOps.GroupsParser()(reqDf(
      ("noise\nfoo; 7\nsolo 3\r\nbad 12x\nx;y 2", "app", "1", "2",
        "100", "ebpfspy", "bytes", "avg"))).orderBy("name"))
    assert(out.map(_("name")) == Seq("foo", "solo", "y"))
    val solo = out.find(_("name") == "solo").get
    assert(solo("stack") == "" && solo("val") == "3.00")
    // 'foo;' → trailing empty frame trimmed → single frame foo
    assert(out.find(_("name") == "foo").get("stack") == "")
  }

  test("defaults and hostile metadata: missing params, zero rate, " +
    "null name, profile_id tag wins") {
    val s = spark
    import s.implicits._
    // only body+name present: spy unknown, units samples, agg sum,
    // rate 100, from/until null → null ts/duration
    val d1 = collectMaps(PyroscopeOps.GroupsParser()(
      Seq(("a;b 2", "demo.cpu")).toDF("body", "name")))
    assert(d1.head("language") == "unknown" &&
      d1.head("units") == "nanoseconds" &&
      d1.head("aggTypes") == "sum" &&
      d1.head("val") == "20000000.00" &&
      d1.head("durationNs") == null && d1.head("_ts_") == null &&
      d1.head("labels") == """{"__name__":"demo"}""")
    // deterministic uuid-shaped fallback profileID
    assert(d1.head("profileID").asInstanceOf[String]
      .matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
    // profile_id label wins over the fallback
    val d2 = collectMaps(PyroscopeOps.GroupsParser()(
      Seq(("a 1", "app{profile_id=p-7}")).toDF("body", "name")))
    assert(d2.head("profileID") == "p-7")
    // …but only from the segment-key BRACE labels: GetProfileID
    // (meta.go:121-130) runs before handler tags merge, so a static
    // tag named profile_id lands in labels yet never sets profileID
    val d2t = collectMaps(PyroscopeOps.GroupsParser(
      tags = Map("profile_id" -> "tag-id"))(
      Seq(("a 1", "app")).toDF("body", "name")))
    assert(d2t.head("profileID").asInstanceOf[String]
      .matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
    assert(d2t.head("labels") ==
      """{"__name__":"app","profile_id":"tag-id"}""")
    // zero sample rate with samples units: reference divides by zero;
    // here the line drops
    val d3 = PyroscopeOps.GroupsParser()(reqDf(
      ("a 1", "app", "1", "2", "0", "", "samples", "")))
    assert(d3.count() == 0)
    // null/empty name → request rejected (segment.ParseKey error)
    val d4 = PyroscopeOps.GroupsParser()(reqDf(
      ("a 1", null, "1", "2", "100", "", "samples", "")))
    assert(d4.count() == 0)
  }

  test("value-type and profile-type detection incl. the reference's " +
    "mem/mutex → profile_unknown quirk (meta.go:104-118)") {
    val mk = (units: String) => collectMaps(PyroscopeOps.GroupsParser()(
      reqDf(("a 5", "app", "1", "2", "100", "gospy", units, "avg")))).head
    val mem = mk("bytes")
    assert(mem("valueTypes") == "mem" && mem("type") == "profile_unknown"
      && mem("units") == "bytes" && mem("val") == "5.00")
    val mtx = mk("lock_nanoseconds")
    assert(mtx("valueTypes") == "mutex" && mtx("type") == "profile_unknown")
    val gor = mk("goroutines")
    assert(gor("valueTypes") == "goroutines" &&
      gor("type") == "profile_goroutines")
    val unk = mk("widgets")
    assert(unk("valueTypes") == "unknown" && unk("type") == "profile_unknown")
  }
}
