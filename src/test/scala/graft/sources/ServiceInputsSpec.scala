package graft.sources

import java.io.PrintWriter
import java.net.ServerSocket
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ops.SyslogOps

/** ServiceInput adapters: the syslog parser composed over a line
  * stream, the deterministic mock generator, and the TCP socket input
  * against a real loopback server. */
class ServiceInputsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A ServiceInput backed by a MemoryStream — the test double for any
    * line-framed service source. */
  private final class MemoryLineInput(val mem: MemoryStream[String])
    extends ServiceInputs.ServiceInput {
    override def name = "memory"
    override def tags = Map("__source__" -> "memtest")
    override def stream(s: SparkSession): DataFrame =
      tagged(mem.toDF().select(current_timestamp().as("ts"),
        col("value").as("line")))
  }

  private def runToList(df: DataFrame)(feed: => Unit): Seq[Map[String, Any]] = {
    val qname = s"svc_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.ProcessingTime(0L)).start()
    try {
      feed
      q.processAllAvailable()
      graft.SparkTestSession.collectMaps(spark.table(qname))
    } finally q.stop()
  }

  test("syslog service input parses frames from a line stream and " +
    "keeps static tags") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[String](s)
    val input = ServiceInputs.SyslogInput(new MemoryLineInput(mem),
      SyslogOps.Auto(year = 2025))
    val out = runToList(input.stream(spark)) {
      mem.addData(
        "<60>Oct 09 14:36:47 hostname program: message",
        "<34>1 2003-10-11T22:14:15.003Z m.example su - ID47 - hi",
        "garbage"): Unit
    }
    assert(out.size == 3)
    val byContent = out.map(m => m("_content_") -> m).toMap
    assert(byContent("message")("_program_") == "program")
    assert(byContent("message")("__source__") == "memtest")
    assert(byContent("hi")("_message_id_") == "ID47")
    assert(byContent("garbage")("_priority_") == -1)
  }

  test("rate mock input generates deterministic indexed lines") {
    val input = ServiceInputs.RateMock(rowsPerSecond = 500)
    val df = input.stream(spark)
    assert(df.isStreaming)
    assert(df.columns.toSeq == Seq("ts", "line", "__mock__"))
    val qname = s"mock_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      // wait for at least one micro-batch with data
      var tries = 0
      while (spark.table(qname).isEmpty && tries < 100) {
        Thread.sleep(100); tries += 1
      }
      val rows = spark.table(qname).limit(5).collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getAs[String]("line").startsWith("mock log index:")))
      assert(rows.forall(_.getAs[String]("__mock__") == "true"))
    } finally q.stop()
  }

  test("socket input reads newline frames from a live TCP server") {
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    val lines = Seq(
      "<60>Oct 09 14:36:47 hostname program: one",
      "<61>Oct 09 14:36:48 hostname program: two")
    val writerThread = new Thread(() => {
      val sock = server.accept()
      val w = new PrintWriter(sock.getOutputStream, true)
      lines.foreach(w.println)
      w.flush()
      // keep the connection open until the query disconnects
      try { sock.getInputStream.read(): Unit } catch { case _: Exception => () }
    })
    writerThread.setDaemon(true)
    writerThread.start()
    try {
      val input = ServiceInputs.SyslogInput(
        ServiceInputs.SocketLines(port = port,
          tags = Map("__listen__" -> s"tcp:$port")),
        SyslogOps.Rfc3164(year = 2025))
      val qname = s"sock_${System.nanoTime()}"
      val q = input.stream(spark).writeStream.format("memory")
        .queryName(qname).outputMode("append").start()
      try {
        var tries = 0
        while (spark.table(qname).count() < 2 && tries < 150) {
          Thread.sleep(100); tries += 1
        }
        val got = graft.SparkTestSession.collectMaps(spark.table(qname))
        assert(got.size >= 2)
        assert(got.map(_("_content_")).toSet == Set("one", "two"))
        assert(got.forall(_("__listen__") == s"tcp:$port"))
        assert(got.forall(_("_program_") == "program"))
      } finally q.stop()
    } finally server.close()
  }

  test("wire decoder over the live socket source: streaming metric rows " +
    "equal the batch decoder on the same frames (http-input shape)") {
    // the reference's http-input deployment: a live listener feeding a
    // wire decoder; here the config-built statsd stage runs UNCHANGED
    // on the streaming frame — same plan as batch
    val frames = Seq(
      "page.views:1|c",
      "fuel.level:0.5|g",
      "users.online:2|c|@0.5|#country:china,city:hz",
      "not a statsd line")
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    val writerThread = new Thread(() => {
      val sock = server.accept()
      val w = new PrintWriter(sock.getOutputStream, true)
      frames.foreach(w.println)
      w.flush()
      try { sock.getInputStream.read(): Unit } catch { case _: Exception => () }
    })
    writerThread.setDaemon(true)
    writerThread.start()
    try {
      val stage = graft.config.PipelineConfig.parse(
        """{"processors":[{"type":"statsd_parse","sourceKey":"line"}]}""")
      val stream = stage(ServiceInputs.SocketLines(port = port).stream(spark))
      val qname = s"wire_${System.nanoTime()}"
      val q = stream.writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      try {
        var tries = 0
        while (spark.table(qname).count() < 3 && tries < 150) {
          Thread.sleep(100); tries += 1
        }
        val cols = Seq("__name__", "__value__", "__stype__", "__rate__",
          "__labels__", "__time_nano__")
        def canon(df: DataFrame): Seq[String] =
          df.select(cols.map(col): _*).collect()
            .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
        val batch = graft.ops.WireFormats.StatsdParser("line")(
          graft.SparkTestSession.textDf(frames: _*)
            .withColumnRenamed("text", "line"))
        assert(canon(spark.table(qname)) == canon(batch))
      } finally q.stop()
    } finally server.close()
  }
}
