package graft.ops
// (semantics below cite the reference's decoders; wire bytes are
// produced by the hand-rolled encoder, the inverse of the reader)

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession._

/** Snappy+protobuf wire decoders on the mapPartitions seam:
  * prometheus remote-write (pkg/protocol/decoder/prometheus/
  * decoder.go:120-151) and SLS LogGroup (decoder/sls/decoder.go:30).
  */
class BinaryDecodersSpec extends AnyFunSuite {

  private def binDf(payloads: Array[Byte]*) = {
    val s = spark
    import s.implicits._
    payloads.zipWithIndex.map { case (p, i) => (i, p) }
      .toDF("pid", "payload")
  }

  test("remote-write: snappy WriteRequest → one metric-log row per " +
    "sample, sorted sanitized labels, ms → nanos") {
    val body = BinaryDecoders.Encode.writeRequest(Seq(
      ("cpu_usage", Seq("instance" -> "host-1", "zone.id" -> "a|b"),
        Seq((0.64, 1663904182000L), (2.0, 1663904183000L))),
      ("mem_free", Seq("instance" -> "host-2"), Seq((1.5, 1663904182000L)))))
    val payload = org.xerial.snappy.Snappy.compress(body)
    val out = collectMaps(
      BinaryDecoders.RemoteWriteParser("payload")(binDf(payload)))
    assert(out.size == 3)
    assert(out(0)("__name__") == "cpu_usage" &&
      // key 'zone.id' sanitizes to zone_id; value '|' → '_'
      out(0)("__labels__") == "instance#$#host-1|zone_id#$#a_b" &&
      out(0)("__time_nano__") == 1663904182000000000L &&
      out(0)("__value__") == "0.64")
    assert(out(1)("__value__") == "2") // FormatFloat shortest: no ".0"
    assert(out(2)("__name__") == "mem_free" && out(2)("__value__") == "1.5")
  }

  test("remote-write: uncompressed mode, hostile payloads drop rows " +
    "not jobs") {
    val body = BinaryDecoders.Encode.writeRequest(Seq(
      ("m", Nil, Seq((1.0, 7L))))) // 1-digit ts → float-scaled to 19
    val out = collectMaps(BinaryDecoders.RemoteWriteParser("payload",
      snappy = false)(binDf(body, Array[Byte](0x7f, 0x00, 0x11),
      Array.empty[Byte])))
    assert(out.size == 1 && out(0)("__time_nano__") == 7000000000000000000L)
    // and snappy mode rejects garbage that is not snappy-framed
    assert(BinaryDecoders.RemoteWriteParser("payload")(
      binDf(Array[Byte](1, 2, 3))).count() == 0)
  }

  test("remote-write: dotted metric names sanitize, stale-NaN keeps its " +
    "sentinel, truncated sub-messages drop the payload") {
    val body = BinaryDecoders.Encode.writeRequest(Seq(
      ("cpu.usage", Nil, Seq((1.0, 1663904182000L))),
      ("m", Nil, Seq((java.lang.Double.longBitsToDouble(
        0x7ff0000000000002L), 1663904182000L)))))
    val out = collectMaps(BinaryDecoders.RemoteWriteParser("payload",
      snappy = false)(binDf(body)))
    // formatNewMetricName: '.' → '_' (log_helper.go:339)
    assert(out(0)("__name__") == "cpu_usage")
    // prometheus staleness marker survives as the reference sentinel
    assert(out(1)("__value__") == "__STALE_NAN__")
    // a sample sub-message whose declared length cuts the double short
    // must fail bounds checks and drop the payload, not read siblings
    val good = BinaryDecoders.Encode.writeRequest(Seq(
      ("m", Nil, Seq((1.0, 1663904182000L)))))
    val truncated = good.clone()
    // find the sample length byte (tag 0x12 len ...) and shrink it
    val sampleIdx = truncated.lastIndexOf(0x12.toByte)
    truncated(sampleIdx + 1) = 4.toByte
    assert(BinaryDecoders.RemoteWriteParser("payload", snappy = false)(
      binDf(truncated)).count() == 0)
  }

  test("sls LogGroup: one row per Log, contents map (dup keys last-" +
    "wins), group envelope columns") {
    val g = BinaryDecoders.Encode.logGroup(
      topic = "topic-a", source = "10.0.0.1",
      tags = Seq("host" -> "h1", "env" -> "prod"),
      logs = Seq(
        (1663904182L, Seq("content" -> "line one", "level" -> "info",
          "level" -> "warn")),
        (1663904183L, Seq("content" -> "line two"))))
    val out = collectMaps(BinaryDecoders.SlsPbParser("payload")(binDf(g)))
    assert(out.size == 2)
    assert(out(0)("log_time") == 1663904182L &&
      out(0)("contents") == Map("content" -> "line one", "level" -> "warn") &&
      out(0)("topic") == "topic-a" && out(0)("source") == "10.0.0.1" &&
      out(0)("log_tags") == Map("host" -> "h1", "env" -> "prod") &&
      out(0)("time_ns") == null)
    assert(out(1)("log_time") == 1663904183L &&
      out(1)("contents") == Map("content" -> "line two"))
    // malformed group drops
    assert(BinaryDecoders.SlsPbParser("payload")(
      binDf(Array[Byte](0x0a, 0x7f))).count() == 0)
  }

  test("raw decoder: payload passthrough into content") {
    val out = collectMaps(BinaryDecoders.RawParser("payload")(
      binDf("cpu.load.short,host=server01 value=0.64"
        .getBytes("UTF-8"))))
    assert(out(0)("content") == "cpu.load.short,host=server01 value=0.64")
  }

  test("sls pb writer: packs rows into capped LogGroups and round-trips " +
    "through the decoder") {
    val s = spark
    import s.implicits._
    val rows = (0 until 23).map(i =>
      (1663904182L + i, s"c$i", if (i % 2 == 0) "info" else "warn"))
      .toDF("t", "content", "level").repartition(1)
    val w = BinaryDecoders.SlsPbWriter(timeKey = "t",
      contentKeys = Seq("content", "level"), topic = "tp", source = "sr",
      tags = Seq("host" -> "h1"), maxLogs = 10)
    val packed = w(rows).collect()
    // 23 rows at ≤10 logs/group in one partition → 10+10+3
    assert(packed.map(_.getInt(1)).sorted.toSeq == Seq(3, 10, 10))
    val back = collectMaps(
      BinaryDecoders.SlsPbParser("payload")(w(rows).select("payload")))
    assert(back.size == 23)
    assert(back.map(m => (m("log_time"), m("contents"), m("topic"),
      m("source"), m("log_tags"))).toSet ==
      (0 until 23).map(i => (1663904182L + i,
        Map("content" -> s"c$i",
          "level" -> (if (i % 2 == 0) "info" else "warn")),
        "tp", "sr", Map("host" -> "h1"))).toSet)
    // byte cap: two fat rows cannot share a group; a single oversized
    // row still ships alone
    val fat = Seq((1L, "x" * 3000), (2L, "y" * 3000))
      .toDF("t", "content").repartition(1)
    val byBytes = BinaryDecoders.SlsPbWriter(timeKey = "t",
      contentKeys = Seq("content"), maxBytes = 4000)(fat).collect()
    assert(byBytes.length == 2 && byBytes.forall(_.getInt(1) == 1))
    // round-trip row set is partition-independent
    val p4 = BinaryDecoders.SlsPbParser("payload")(
      w(rows.repartition(4)).select("payload"))
    assert(collectMaps(p4).map(_("contents")).toSet ==
      back.map(_("contents")).toSet)
    // null content values render as "" (never the literal "null");
    // the byte cap counts encoded UTF-8, so two 3-byte-per-char rows
    // that LOOK small in chars still split
    val nulls = Seq((1L, null: String), (2L, "實際的日誌內容" * 300))
      .toDF("t", "content").repartition(1)
    val nb = BinaryDecoders.SlsPbWriter(timeKey = "t",
      contentKeys = Seq("content"), maxBytes = 4000)(nulls).collect()
    assert(nb.length == 2) // 2100 chars ≈ 6300 UTF-8 bytes > cap
    val nback = collectMaps(BinaryDecoders.SlsPbParser("payload")(
      BinaryDecoders.SlsPbWriter(timeKey = "t",
        contentKeys = Seq("content"))(nulls).select("payload")))
    assert(nback.map(_("contents").asInstanceOf[Map[String, String]]
      .apply("content")).toSet.contains(""))
    // a hostile NON-NUMERIC string time column coerces to 0, never a
    // NumberFormatException killing the batch (writer stays total)
    val badT = Seq(("not-a-time", "x")).toDF("t", "content").repartition(1)
    val bt = collectMaps(BinaryDecoders.SlsPbParser("payload")(
      BinaryDecoders.SlsPbWriter(timeKey = "t",
        contentKeys = Seq("content"))(badT).select("payload")))
    assert(bt.size == 1 && bt.head("log_time") == 0L)
  }

  test("remote-write writer: <=limit series per payload, lexicographic " +
    "labels incl. __name__, empties dropped, stale-NaN and ms-aligned " +
    "times round-trip through the decoder") {
    val s = spark
    import s.implicits._
    val rows = (0 until 7).map(i =>
      (s"m_$i", s"AAA#$$#first|job#$$#j$i", 1663904182000000000L + i * 1000000L,
        if (i == 3) "__STALE_NAN__" else s"$i.5"))
      .toDF("__name__", "__labels__", "__time_nano__", "__value__")
      .repartition(1)
    val w = BinaryDecoders.RemoteWriteWriter(seriesLimit = 3)
    val packed = w(rows).collect()
    assert(packed.map(_.getInt(1)).sorted.toSeq == Seq(1, 3, 3))
    // label order on the wire: AAA < __name__ < job (spec order, not
    // name-first) — check the raw uncompressed bytes of one series
    val raw = org.xerial.snappy.Snappy.uncompress(
      packed.head.getAs[Array[Byte]](0))
    val first = BinaryDecoders.parseWriteRequest(raw)
    assert(first.nonEmpty)
    val back = collectMaps(BinaryDecoders.RemoteWriteParser("payload")(
      w(rows).select("payload")))
    assert(back.size == 7)
    assert(back.map(m => (m("__name__"), m("__labels__"),
      m("__time_nano__"), m("__value__"))).toSet ==
      (0 until 7).map(i => (s"m_$i", s"AAA#$$#first|job#$$#j$i",
        1663904182000000000L + i * 1000000L,
        if (i == 3) "__STALE_NAN__" else s"$i.5")).toSet)
    // empty label values drop on encode (remote-write spec MUST NOT)
    val empties = Seq(("m", "bad#$#|job#$#x", 1663904182000000000L, "1"))
      .toDF("__name__", "__labels__", "__time_nano__", "__value__")
    val eb = collectMaps(BinaryDecoders.RemoteWriteParser("payload")(
      BinaryDecoders.RemoteWriteWriter()(empties).select("payload")))
    assert(eb.head("__labels__") == "job#$#x")
    // row set is partition-independent
    val p4 = collectMaps(BinaryDecoders.RemoteWriteParser("payload")(
      w(rows.repartition(4)).select("payload")))
    assert(p4.map(_("__name__")).toSet == back.map(_("__name__")).toSet)
  }

  test("remote-write writer: readSortedLabels continuation — a '|' " +
    "inside a label value or key reaches the wire intact " +
    "(converter_sls_metric.go:101-160) instead of dropping the " +
    "continuation segment; the decoder then sanitizes per " +
    "helper.MetricLabels") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("m", "job#$#x|path#$#/a|/b", 1663904182000000000L, "1.5"),
      ("m2", "a|b#$#v", 1663904182000000000L, "2.5"))
      .toDF("__name__", "__labels__", "__time_nano__", "__value__")
      .repartition(1)
    val raws = BinaryDecoders.RemoteWriteWriter(snappy = false)(rows)
      .collect().map(_.getAs[Array[Byte]](0))
    val byName = raws.flatMap(BinaryDecoders.parseWriteRequest).map(sm =>
      sm.name -> sm.labels.filterNot(_._1 == "__name__")).toMap
    assert(byName("m") == Seq("job" -> "x", "path" -> "/a|/b"))
    assert(byName("m2") == Seq("a|b" -> "v"))
    // full round trip: the DECODER renders helper.MetricLabels, which
    // sanitizes '|' in values and non-word chars in keys to '_'
    val back = collectMaps(BinaryDecoders.RemoteWriteParser("payload")(
      BinaryDecoders.RemoteWriteWriter()(rows).select("payload")))
    assert(back.map(_("__labels__")).toSet ==
      Set("job#$#x|path#$#/a_/b", "a_b#$#v"))
  }

  test("binary decoders are total under fuzzed bytes: random payloads " +
    "drop rows, never kill the job") {
    val rnd = new scala.util.Random(42) // deterministic fuzz corpus
    val fuzz = (1 to 64).map { i =>
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      // bias half toward almost-valid: prepend a plausible field tag
      if (i % 2 == 0) Array[Byte](0x0a, 0x7f) ++ b else b
    }
    val df = binDf(fuzz: _*)
    // decode must complete; any row that survives parsed from noise is
    // fine (a random buffer CAN be a valid tiny message) — the contract
    // is totality, not rejection
    assert(BinaryDecoders.SlsPbParser("payload")(df).count() >= 0)
    assert(BinaryDecoders.RemoteWriteParser("payload")(df).count() >= 0)
    assert(BinaryDecoders.RemoteWriteParser("payload",
      snappy = false)(df).count() >= 0)
  }

  test("decoders compose declaratively: filters push around the seam") {
    val body = org.xerial.snappy.Snappy.compress(
      BinaryDecoders.Encode.writeRequest(Seq(
        ("a", Nil, Seq((1.0, 1663904182000L))),
        ("b", Nil, Seq((2.0, 1663904182000L))))))
    val out = BinaryDecoders.RemoteWriteParser("payload")(binDf(body))
      .where(col("__name__") === "b")
    assert(collectMaps(out).map(_("__value__")) == Seq("2"))
  }
}
