package graft.ops
// (vector fixtures below cite the reference's own unit tests)

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{expr, lit}
import graft.SparkTestSession._

/** OTLP/JSON metric + trace decoders, mirroring the reference decode
  * tests (pkg/protocol/decoder/opentelemetry/decoder_test.go:189-470
  * metric assertions over the metrics*OTLPFull fixtures at :1044-1264,
  * tracesOTLPFull at :1267; span-log field semantics
  * otlp_trace_parser.go:132-216). Wall-clock fixture timestamps are
  * pinned to 1663904182348000000 so expectations are literal.
  */
class OtlpOpsSpec extends AnyFunSuite {

  private val TS = "1663904182348000000"
  private val TraceId = "0102030405060708090a0b0c0d0e0f10"
  private val SpanId = "1112131415161718"

  private def attr(k: String, v: String) =
    s"""{"key":"$k","value":{$v}}"""
  private val pointAttrs = Seq(
    attr("string", "\"stringValue\":\"value\""),
    attr("bool", "\"boolValue\":true"),
    attr("int", "\"intValue\":\"1\""),
    attr("double", "\"doubleValue\":1.1"),
    attr("bytes", "\"bytesValue\":\"Zm9v\"")).mkString(",")
  private val resAttrs = Seq(
    attr("host.name", "\"stringValue\":\"testHost\""),
    attr("service.name", "\"stringValue\":\"testService\"")).mkString(",")
  private val exemplar =
    s"""{"filteredAttributes":[${attr("service.name",
        "\"stringValue\":\"testService\"")}],"timeUnixNano":"$TS",""" +
      s""""asDouble":99.3,"spanId":"$SpanId","traceId":"$TraceId"}"""

  private def metricsPayload(metricJson: String): String =
    s"""{"resourceMetrics":[{"resource":{"attributes":[$resAttrs]},""" +
      s""""scopeMetrics":[{"scope":{"name":"instrumentation name",""" +
      s""""version":"instrumentation version"},"metrics":[$metricJson]}]}]}"""

  private def parseMetrics(payloads: String*) =
    collectMaps(OtlpOps.OtlpMetricParser("text")(textDf(payloads: _*))
      .select("__name__", "__labels__", "__time_nano__", "__value__"))

  /** MetricLabels.String(): key-sorted `k#$#v|…` (ties by value). */
  private def lbl(pairs: (String, String)*): String =
    pairs.sorted.map { case (k, v) => s"$k#$$#$v" }.mkString("|")

  /** Go FormatFloat('g',-1,64) for the spec's value range. */
  private def goFmt(d: Double): String =
    if (d == d.toLong.toDouble && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private val baseAttrPairs = Seq("bool" -> "true", "bytes" -> "Zm9v",
    "double" -> "1.1", "host_name" -> "testHost", "int" -> "1",
    "service_name" -> "testService", "string" -> "value")

  test("sum vectors (TestDecoder_Decode_MetricsAll/sum): exemplar row " +
    "then per-point value rows, exact reference label strings") {
    val dp2Attrs = Seq(
      attr("string", "\"stringValue\":\"value2\""),
      attr("bool", "\"boolValue\":false"),
      attr("int", "\"intValue\":\"2\""),
      attr("double", "\"doubleValue\":2.2"),
      attr("bytes", "\"bytesValue\":\"YmFy\"")).mkString(",")
    val out = parseMetrics(metricsPayload(
      s"""{"name":"test sum","description":"test sum","unit":"unit",""" +
        s""""sum":{"aggregationTemporality":2,"isMonotonic":true,""" +
        s""""dataPoints":[{"attributes":[$pointAttrs],""" +
        s""""timeUnixNano":"$TS","asInt":"100","exemplars":[$exemplar]},""" +
        s"""{"attributes":[$dp2Attrs],"timeUnixNano":"$TS","asInt":"50"}]}}"""))
    assert(out.size == 3)
    // literal strings from decoder_test.go:349,357,365
    assert(out(0)("__name__") == "test_sum_exemplars" &&
      out(0)("__labels__") == "bool#$#true|bytes#$#Zm9v|double#$#1.1|host_name#$#testHost|int#$#1|otlp_metric_aggregation_temporality#$#Cumulative|otlp_metric_ismonotonic#$#true|service_name#$#testService|service_name#$#testService|spanId#$#1112131415161718|string#$#value|traceId#$#0102030405060708090a0b0c0d0e0f10" &&
      out(0)("__value__") == "99.3" &&
      out(0)("__time_nano__") == 1663904182L) // exemplars carry SECONDS
    assert(out(1)("__name__") == "test_sum" &&
      out(1)("__labels__") == "bool#$#true|bytes#$#Zm9v|double#$#1.1|host_name#$#testHost|int#$#1|otlp_metric_aggregation_temporality#$#Cumulative|otlp_metric_ismonotonic#$#true|service_name#$#testService|string#$#value" &&
      out(1)("__value__") == "100" &&
      out(1)("__time_nano__") == 1663904182348000000L)
    assert(out(2)("__value__") == "50" &&
      out(2)("__labels__") == "bool#$#false|bytes#$#YmFy|double#$#2.2|host_name#$#testHost|int#$#2|otlp_metric_aggregation_temporality#$#Cumulative|otlp_metric_ismonotonic#$#true|service_name#$#testService|string#$#value2")
  }

  test("gauge vectors: double value, exemplar, reference label string") {
    val out = parseMetrics(metricsPayload(
      s"""{"name":"test gauge","description":"test gauge",""" +
        s""""gauge":{"dataPoints":[{"attributes":[$pointAttrs],""" +
        s""""timeUnixNano":"$TS","asDouble":10.2,"exemplars":[$exemplar]}]}}"""))
    assert(out.size == 2)
    assert(out(0)("__name__") == "test_gauge_exemplars" &&
      out(0)("__value__") == "99.3")
    assert(out(1)("__name__") == "test_gauge" &&
      out(1)("__labels__") == "bool#$#true|bytes#$#Zm9v|double#$#1.1|host_name#$#testHost|int#$#1|service_name#$#testService|string#$#value" &&
      out(1)("__value__") == "10.2")
  }

  test("histogram vectors: sum/min/max/count, cumulative le buckets " +
    "with +Inf, exemplar") {
    val out = parseMetrics(metricsPayload(
      s"""{"name":"test Histogram","histogram":{"aggregationTemporality":2,""" +
        s""""dataPoints":[{"attributes":[$pointAttrs],"timeUnixNano":"$TS",""" +
        s""""count":"4","sum":345,"min":1663904182,"max":1663904183,""" +
        s""""bucketCounts":["1","1","2"],"explicitBounds":[10,100],""" +
        s""""exemplars":[$exemplar]}]}}"""))
    val hPairs = baseAttrPairs ++ Seq(
      "otlp_metric_aggregation_temporality" -> "Cumulative",
      "otlp_metric_histogram_type" -> "Histogram")
    assert(out.map(m => (m("__name__"), m("__value__"))) == Seq(
      ("test_Histogram_sum", "345"), ("test_Histogram_min", "1663904182"),
      ("test_Histogram_max", "1663904183"), ("test_Histogram_count", "4"),
      ("test_Histogram_exemplars", "99.3"),
      ("test_Histogram_bucket", "1"), ("test_Histogram_bucket", "2"),
      ("test_Histogram_bucket", "4")))
    assert(out(0)("__labels__") == lbl(hPairs: _*))
    assert(out(5)("__labels__") == lbl(hPairs :+ ("le" -> "10"): _*))
    assert(out(6)("__labels__") == lbl(hPairs :+ ("le" -> "100"): _*))
    assert(out(7)("__labels__") == lbl(hPairs :+ ("le" -> "+Inf"): _*))
  }

  test("exponential histogram vectors: scale-derived (lower,upper] " +
    "buckets, offset and zero.count rows") {
    val out = parseMetrics(metricsPayload(
      s"""{"name":"test ExponentialHistogram",""" +
        s""""exponentialHistogram":{"aggregationTemporality":2,""" +
        s""""dataPoints":[{"attributes":[$pointAttrs],"timeUnixNano":"$TS",""" +
        s""""count":"4","sum":345,"scale":1,"zeroCount":"5",""" +
        s""""positive":{"offset":2,"bucketCounts":["1","1","2"]},""" +
        s""""negative":{"offset":2,"bucketCounts":["1","1","2"]}}]}}"""))
    val base = math.pow(2, math.pow(2, -1))
    def le(i: Int, pos: Boolean): String = {
      val lower = math.pow(base, 2.0 + i); val upper = lower * base
      if (pos) s"(${goFmt(lower)},${goFmt(upper)}]"
      else s"[${goFmt(-upper)},${goFmt(-lower)})"
    }
    val ePairs = baseAttrPairs ++ Seq(
      "otlp_metric_aggregation_temporality" -> "Cumulative",
      "otlp_metric_histogram_type" -> "ExponentialHistogram")
    // sum, count, 3 positive buckets, positive.offset, zero.count,
    // 3 negative buckets, negative.offset = bucketLens(6) + 4 + sum(1)
    assert(out.size == 11)
    assert(out(0)("__value__") == "345" && out(1)("__value__") == "4")
    assert(out(2)("__labels__") == lbl(ePairs :+ ("le" -> le(0, pos = true)): _*)
      && out(2)("__value__") == "1")
    assert(out(4)("__labels__") == lbl(ePairs :+ ("le" -> le(2, pos = true)): _*)
      && out(4)("__value__") == "2")
    assert(out(5)("__labels__") == lbl(ePairs :+ ("le" -> "positive.offset"): _*)
      && out(5)("__value__") == "2")
    assert(out(6)("__labels__") == lbl(ePairs :+ ("le" -> "zero.count"): _*)
      && out(6)("__value__") == "5")
    assert(out(7)("__labels__") == lbl(ePairs :+ ("le" -> le(0, pos = false)): _*))
    assert(out(10)("__labels__") == lbl(ePairs :+ ("le" -> "negative.offset"): _*))
    assert(out.forall(_("__name__").toString.startsWith("test_ExponentialHistogram")))
  }

  test("summary vectors: _sum/_count then quantile rows") {
    val out = parseMetrics(metricsPayload(
      s"""{"name":"test summary","summary":{"dataPoints":[{""" +
        s""""attributes":[$pointAttrs],"timeUnixNano":"$TS","count":"100",""" +
        s""""sum":1000,"quantileValues":[{"quantile":0.5,"value":1.2}]}]}}"""))
    assert(out.map(m => (m("__name__"), m("__value__"))) == Seq(
      ("test_summary_sum", "1000"), ("test_summary_count", "100"),
      ("test_summary", "1.2")))
    assert(out(0)("__labels__") == lbl(baseAttrPairs: _*))
    assert(out(2)("__labels__") == lbl(baseAttrPairs :+ ("quantile" -> "0.5"): _*))
  }

  test("untyped metric (TestDecoder_Decode_MetricsUntyped): type string " +
    "as labels, description as value") {
    val out = parseMetrics(
      """{"resourceMetrics":[{"resource":{"attributes":[{"key":"host.name","value":{"stringValue":"testHost"}}]},"scopeMetrics":[{"scope":{"name":"name","version":"version"},"metrics":[{"name":"testMetric"}]}]}]}""")
    assert(out.size == 1)
    assert(out(0)("__name__") == "testMetric" &&
      out(0)("__labels__") == "Empty" && out(0)("__value__") == "" &&
      out(0)("__time_nano__") == 0L)
  }

  test("hostile numerics and non-OTLP payloads survive ANSI") {
    val out = parseMetrics(
      metricsPayload("""{"name":"m","gauge":{"dataPoints":[{"timeUnixNano":"not a number","asInt":"99999999999999999999999"}]}}"""),
      """{"level":"INFO"}""", "plain text")
    // overflowed asInt falls back to the (absent) double → "0";
    // unparseable ts → 0; junk payloads drop, the job survives
    assert(out.size == 1 && out(0)("__value__") == "0" &&
      out(0)("__time_nano__") == 0L)
  }

  test("trace vectors (tracesOTLPFull shape): span-log field set, " +
    "key-sorted JSON for attribute/links/logs, micro timestamps") {
    val spanAttrs = pointAttrs +
      "," + attr("array",
        """"arrayValue":{"values":[{"intValue":"1"},{"stringValue":"str"}]}""") +
      "," + attr("kvList",
        """"kvlistValue":{"values":[{"key":"int","value":{"intValue":"1"}},{"key":"string","value":{"stringValue":"string"}}]}""")
    val evAndLinkAttrs = pointAttrs
    val span1 =
      s"""{"traceId":"$TraceId","spanId":"$SpanId","parentSpanId":"$SpanId",""" +
        s""""name":"testSpan","kind":3,"traceState":"state",""" +
        s""""startTimeUnixNano":"1663904182348000000","endTimeUnixNano":"1663904182349000000",""" +
        s""""attributes":[$spanAttrs],""" +
        s""""events":[{"timeUnixNano":"1663904182348500000","name":"eventName","attributes":[$evAndLinkAttrs]}],""" +
        s""""links":[{"traceId":"$TraceId","spanId":"$SpanId","traceState":"state","attributes":[$evAndLinkAttrs]}],""" +
        s""""status":{"code":1,"message":"message"}}"""
    val payload =
      s"""{"resourceSpans":[{"resource":{"attributes":[$resAttrs]},""" +
        s""""scopeSpans":[{"scope":{"name":"scope name","version":"scope version"},""" +
        s""""spans":[$span1,{"name":"testSpan2"}]}]}]}"""
    val out = collectMaps(OtlpOps.OtlpTraceParser("text")(textDf(
      payload, "not otlp")))
    assert(out.size == 2)
    val s1 = out(0)
    assert(s1("host") == "testHost" && s1("service") == "testService" &&
      s1("resource") == "{}" && s1("otlp.name") == "scope name" &&
      s1("otlp.version") == "scope version")
    assert(s1("traceID") == TraceId && s1("spanID") == SpanId &&
      s1("parentSpanID") == SpanId && s1("kind") == "client" &&
      s1("name") == "testSpan" && s1("traceState") == "state")
    assert(s1("attribute") ==
      """{"array":[1,"str"],"bool":true,"bytes":"Zm9v","double":1.1,"int":1,"kvList":{"int":1,"string":"string"},"string":"value"}""")
    assert(s1("logs") ==
      """[{"attribute":{"bool":true,"bytes":"Zm9v","double":1.1,"int":1,"string":"value"},"name":"eventName","time":1663904182348500000}]""")
    assert(s1("links") ==
      s"""[{"attribute":{"bool":true,"bytes":"Zm9v","double":1.1,"int":1,"string":"value"},"spanID":"$SpanId","traceID":"$TraceId"}]""")
    assert(s1("start") == 1663904182348000L && s1("end") == 1663904182349000L &&
      s1("duration") == 1000L)
    assert(s1("statusCode") == "OK" && s1("statusMessage") == "message")
    val s2 = out(1)
    assert(s2("name") == "testSpan2" && s2("kind") == "" &&
      s2("traceID") == "" && s2("attribute") == "{}" &&
      s2("links") == "[]" && s2("logs") == "[]" &&
      s2("start") == 0L && s2("duration") == 0L &&
      s2("statusCode") == "UNSET" && s2("statusMessage") == "" &&
      s2("host") == "testHost")
  }

  test("trace enum-name kinds and status codes decode like numeric") {
    val payload =
      """{"resourceSpans":[{"resource":{},"scopeSpans":[{"spans":[""" +
        """{"name":"s","kind":"SPAN_KIND_SERVER","status":{"code":"STATUS_CODE_ERROR"}}]}]}]}"""
    val out = collectMaps(OtlpOps.OtlpTraceParser("text")(textDf(payload)))
    assert(out(0)("kind") == "server" && out(0)("statusCode") == "ERROR" &&
      out(0)("host") == "" && out(0)("resource") == "{}")
  }

  test("otlp metric writer: every family round-trips through the " +
    "metric parser with the converter's semantics (double datapoints, " +
    "counter=Delta sum, summary quantiles, histogram buckets, exp-" +
    "histogram sides); unknown types skipped") {
    val s = spark
    import s.implicits._
    val base = Seq(
      ("g1", "gauge", 1L, 2.5, "c-1"),
      ("c1", "counter", 2L, 3.5, "c-1"),
      ("u1", "meter", 3L, 9.9, "c-1")) // skipped (otlp.go:270)
      .toDF("mname", "metric_type", "ord", "value", "conv")
      .withColumn("tn", lit(1663904182000000000L))
    val packed = OtlpOps.OtlpMetricWriter(nameKey = "mname",
      timeKey = "tn", orderKey = "ord", groupKeys = Seq("conv"),
      attrKeys = Seq("metric_type"), tags = Map("src" -> "graft"))(base)
    assert(packed.count() == 1)
    assert(packed.collect().head.getAs[Int]("n_records") == 2) // meter gone
    val back = collectMaps(
      OtlpOps.OtlpMetricParser("payload")(packed.select("payload"))
        .select("__name__", "__labels__", "__time_nano__", "__value__"))
    assert(back.size == 2)
    val g = back.find(_("__name__") == "g1").get
    assert(g("__labels__") ==
      lbl("conv" -> "c-1", "src" -> "graft", "metric_type" -> "gauge"))
    assert(g("__time_nano__") == 1663904182000000000L)
    assert(g("__value__") == "2.5")
    val c = back.find(_("__name__") == "c1").get
    assert(c("__labels__") == lbl("conv" -> "c-1", "src" -> "graft",
      "metric_type" -> "counter",
      "otlp_metric_ismonotonic" -> "false",
      "otlp_metric_aggregation_temporality" -> "Delta"))
    assert(c("__value__") == "3.5")

    // summary: sum/count + quantile rows
    val sm = Seq(("s1", "summary", 1L, "c-2"))
      .toDF("mname", "metric_type", "ord", "conv")
      .withColumn("tn", lit(1663904182000000000L))
      .withColumn("m_sum", lit(10.5)).withColumn("m_count", lit(4L))
      .withColumn("quantiles", expr(
        "array(named_struct('quantile', 0.5D, 'value', 1.25D)," +
          "named_struct('quantile', 0.99D, 'value', 2.75D))"))
    val sb = collectMaps(OtlpOps.OtlpMetricParser("payload")(
      OtlpOps.OtlpMetricWriter(nameKey = "mname", timeKey = "tn",
        orderKey = "ord", groupKeys = Seq("conv"))(sm).select("payload"))
      .select("__name__", "__labels__", "__value__"))
    assert(sb.map(m => (m("__name__"), m("__value__"))).toSet == Set(
      ("s1_sum", "10.5"), ("s1_count", "4"), ("s1", "1.25"), ("s1", "2.75")))
    assert(sb.find(_("__value__") == "1.25").get("__labels__") ==
      lbl("conv" -> "c-2", "quantile" -> "0.5"))

    // histogram: count/sum + cumulative le buckets incl. +Inf
    val h = Seq(("h1", "histogram", 1L, "c-3"))
      .toDF("mname", "metric_type", "ord", "conv")
      .withColumn("tn", lit(1663904182000000000L))
      .withColumn("m_sum", lit(6.5)).withColumn("m_count", lit(7L))
      .withColumn("bounds", expr("array(1.0D, 2.5D)"))
      .withColumn("bucket_counts", expr("array(2L, 4L, 1L)"))
    val hb = collectMaps(OtlpOps.OtlpMetricParser("payload")(
      OtlpOps.OtlpMetricWriter(nameKey = "mname", timeKey = "tn",
        orderKey = "ord", groupKeys = Seq("conv"))(h).select("payload"))
      .select("__name__", "__labels__", "__value__"))
    val extras = Seq(
      "otlp_metric_aggregation_temporality" -> "Unspecified",
      "otlp_metric_histogram_type" -> "Histogram")
    assert(hb.map(m => (m("__name__"), m("__value__"))).toSet == Set(
      ("h1_sum", "6.5"), ("h1_count", "7"),
      ("h1_bucket", "2"), ("h1_bucket", "6"), ("h1_bucket", "7")))
    assert(hb.find(_("__value__") == "6").get("__labels__") ==
      lbl(Seq("conv" -> "c-3", "le" -> "2.5") ++ extras: _*))
    assert(hb.find(m => m("__name__") == "h1_bucket" &&
      m("__value__") == "7").get("__labels__") ==
      lbl(Seq("conv" -> "c-3", "le" -> "+Inf") ++ extras: _*))

    // exponential histogram: sides + zero count at the given scale
    val eh = Seq(("e1", "exp_histogram", 1L, "c-4"))
      .toDF("mname", "metric_type", "ord", "conv")
      .withColumn("tn", lit(1663904182000000000L))
      .withColumn("m_count", lit(5L)).withColumn("scale", lit(0L))
      .withColumn("zero_count", lit(1L))
      .withColumn("pos_offset", lit(1L))
      .withColumn("pos_counts", expr("array(3L)"))
      .withColumn("neg_offset", lit(0L))
      .withColumn("neg_counts", expr("array(1L)"))
    val eb = collectMaps(OtlpOps.OtlpMetricParser("payload")(
      OtlpOps.OtlpMetricWriter(nameKey = "mname", timeKey = "tn",
        orderKey = "ord", groupKeys = Seq("conv"))(eh).select("payload"))
      .select("__name__", "__labels__", "__value__"))
    // scale 0 -> base 2: positive offset 1 bucket = (2,4]
    val ehExtras = Seq(
      "otlp_metric_aggregation_temporality" -> "Unspecified",
      "otlp_metric_histogram_type" -> "ExponentialHistogram")
    assert(eb.exists(m => m("__name__") == "e1_bucket" &&
      m("__value__") == "3" && m("__labels__") ==
      lbl(Seq("conv" -> "c-4", "le" -> "(2,4]") ++ ehExtras: _*)))
    assert(eb.exists(m => m("__name__") == "e1_bucket" &&
      m("__labels__").asInstanceOf[String].contains("zero.count") &&
      m("__value__") == "1"))
    assert(eb.exists(m => m("__value__") == "5" &&
      m("__name__") == "e1_count"))
  }

  test("otlp trace writer: spans round-trip through the trace parser " +
    "(ids, kind, status, events/links, host/service shortcuts, scope)") {
    val s = spark
    import s.implicits._
    val spans = Seq(
      (TraceId, SpanId, "", "op_a", 2, 1L,
        1663904182000000000L, 1663904182000002000L, 1, "boom", "t-1"),
      (TraceId, "2122232425262728", SpanId, "op_b", 3, 2L,
        1663904182000000000L, 1663904182000005000L, 0, "", "t-1"))
      .toDF("trace_id", "span_id", "parent_span_id", "sname", "kind",
        "ord", "start_nano", "end_nano", "status_code", "status_message",
        "conv")
      .withColumn("host", lit("testHost"))
      .withColumn("service", lit("testService"))
      .withColumn("events", expr(
        "array(named_struct('name', 'ev1', 'time', 1663904182000001000L))"))
      .withColumn("links", expr(
        s"array(named_struct('traceId', '$TraceId', 'spanId', " +
          "'3132333435363738'))"))
      .withColumn("role", lit("user"))
    val packed = OtlpOps.OtlpTraceWriter(nameKey = "sname",
      orderKey = "ord", groupKeys = Seq("conv"),
      hostKey = "host", serviceKey = "service",
      scopeName = "scope-n", scopeVersion = "v1",
      attrKeys = Seq("role"), tags = Map("env" -> "prod"))(spans)
    assert(packed.count() == 1 &&
      packed.collect().head.getAs[Int]("n_records") == 2)
    val back = collectMaps(
      OtlpOps.OtlpTraceParser("payload")(packed.select("payload")))
    assert(back.size == 2)
    val a = back.find(_("name") == "op_a").get
    assert(a("traceID") == TraceId && a("spanID") == SpanId)
    assert(a("parentSpanID") == "" && a("kind") == "server")
    assert(a("host") == "testHost" && a("service") == "testService")
    assert(a("resource") == """{"conv":"t-1","env":"prod"}""")
    assert(a("otlp.name") == "scope-n" && a("otlp.version") == "v1")
    assert(a("start") == 1663904182000000L && a("end") == 1663904182000002L)
    assert(a("duration") == 2L)
    assert(a("statusCode") == "OK" && a("statusMessage") == "boom")
    assert(a("attribute") == """{"role":"user"}""")
    assert(a("logs") ==
      """[{"attribute":{},"name":"ev1","time":1663904182000001000}]""")
    assert(a("links") ==
      s"""[{"attribute":{},"spanID":"3132333435363738","traceID":"$TraceId"}]""")
    val b = back.find(_("name") == "op_b").get
    assert(b("kind") == "client" && b("parentSpanID") == SpanId)
    assert(b("statusCode") == "UNSET" && b("duration") == 5L)
  }

  test("otlp writers: byte-identical payloads across parallelism, " +
    "including orderKey ties that differ ONLY in a value column") {
    val s = spark
    import s.implicits._
    // two gauge rows tie on (orderKey, name, time, type) and differ
    // only in value — the tiebreak must hash the value column or the
    // collect order would follow shuffle placement
    val rows = Seq(
      ("m", "gauge", 1L, 1.5, "c-1"), ("m", "gauge", 1L, 2.5, "c-1"),
      ("m", "gauge", 1L, 0.5, "c-1"), ("n", "counter", 2L, 9.0, "c-1"))
      .toDF("mname", "metric_type", "ord", "value", "conv")
      .withColumn("tn", lit(1663904182000000000L))
    def payload(df: org.apache.spark.sql.DataFrame): String =
      OtlpOps.OtlpMetricWriter(nameKey = "mname", timeKey = "tn",
        orderKey = "ord", groupKeys = Seq("conv"))(df)
        .select("payload").collect().head.getString(0)
    val p1 = payload(rows.repartition(1))
    val p7 = payload(rows.repartition(7))
    assert(p1 == p7)
    // same determinism contract for the trace writer on duplicate ids
    val spans = Seq(
      (TraceId, SpanId, "a", 1, 0L, 10L, 20L, "t-1"),
      (TraceId, SpanId, "a", 1, 0L, 10L, 30L, "t-1")) // differs in end only
      .toDF("trace_id", "span_id", "sname", "kind", "ord",
        "start_nano", "end_nano", "conv")
    def tPayload(df: org.apache.spark.sql.DataFrame): String =
      OtlpOps.OtlpTraceWriter(nameKey = "sname", orderKey = "ord",
        groupKeys = Seq("conv"))(df)
        .select("payload").collect().head.getString(0)
    assert(tPayload(spans.repartition(1)) == tPayload(spans.repartition(5)))
  }

  test("otlp log writer: one ResourceLogs per group, null attrs absent, " +
    "escaped bodies round-trip through the decoder") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (10L, "c1", 0, "hello", "info", "curl"),
      (11L, "c1", 1, "wor\"ld", "warn", null),
      (12L, "c2", 0, "bye", "error", "wget"))
      .toDF("t", "conv", "idx", "content", "level", "tool")
    val packed = OtlpOps.OtlpLogWriter(timeKey = "t", orderKey = "idx",
      groupKeys = Seq("conv"), attrKeys = Seq("tool"),
      tags = Map("source" -> "graft"))(rows)
    assert(packed.count() == 2) // one payload per conversation
    assert(packed.where(col("conv") === "c1")
      .select("n_records").collect().head.getInt(0) == 2)
    val back = WireFormats.OtlpLogParser("payload")(packed.select("payload"))
      .select("time_unix_nano", "severity_text", "content",
        "attributes", "resources")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet
    assert(back == Set(
      (10000000000L, "info", "hello", """{"tool":"curl"}""",
        """{"conv":"c1","source":"graft"}"""),
      (11000000000L, "warn", "wor\"ld", "",
        """{"conv":"c1","source":"graft"}"""),
      (12000000000L, "error", "bye", """{"tool":"wget"}""",
        """{"conv":"c2","source":"graft"}""")))
  }
}
