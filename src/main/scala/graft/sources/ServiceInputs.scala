package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.SyslogOps

/** Service (push) inputs — the streaming analog of the reference's
  * `ServiceInput` plugin family (`pkg/pipeline/input.go:42-62`: Init /
  * Start(Collector) / Stop), where a long-running server pushes events
  * into the pipeline head.
  *
  * Spark already owns the lifecycle (Start/Stop = query start/stop,
  * Collector = the streaming DataFrame), so a service input here
  * reduces to: a `readStream` source producing the collector's event
  * shape, plus optional head-of-pipeline decoding. Everything
  * downstream (parse→enrich→route→fan-out) is shared with batch via
  * `StreamingRunner.routed` — the same property the reference gets from
  * its plugin runner.
  *
  * Event shape (the Go Collector.AddData contract,
  * `plugins/input/mock/input_mock.go:57-67`): a text payload plus
  * static tag columns; arrival time is stamped by the collector.
  *
  * Modeled inputs:
  *  - [[SocketLines]] — TCP line server (the service_syslog /
  *    service_udp shape: `plugins/input/syslog/syslog.go` listens and
  *    parses frames); pair with [[SyslogInput]] for the parser.
  *  - [[RateMock]] — deterministic generator at a fixed rate
  *    (`plugins/input/mock/input_mock.go`: Index counter + fixed
  *    fields/tags per tick).
  *  - [[SyslogInput]] — any line input + the RFC3164/5424/auto frame
  *    parser ([[SyslogOps]]), the composition `service_syslog` performs
  *    in `Start`.
  *
  * Kafka/HTTP-server inputs are the same adapter shape over
  * `readStream.format("kafka")` / a receiver — not constructible in
  * this sandbox (no brokers, no net egress); SocketLines is the live
  * wire-protocol representative.
  */
object ServiceInputs {

  /** A service input = a named streaming source with static tags.
    * `stream` returns (ts timestamp, line string, <tag columns…>). */
  trait ServiceInput {
    def name: String
    def tags: Map[String, String]
    def stream(spark: SparkSession): DataFrame
    protected final def tagged(df: DataFrame): DataFrame =
      tags.foldLeft(df) { case (d, (k, v)) => d.withColumn(k, lit(v)) }
  }

  /** TCP line-frame server input: one event per newline-delimited frame,
    * stamped with arrival (processing) time — the reference stamps
    * `time.Now()` at AddData (syslog.go:444). */
  final case class SocketLines(
      host: String = "127.0.0.1",
      port: Int,
      override val tags: Map[String, String] = Map.empty)
    extends ServiceInput {
    override def name: String = s"socket:$host:$port"
    override def stream(spark: SparkSession): DataFrame =
      tagged(spark.readStream
        .format("socket").option("host", host).option("port", port)
        .load()
        .select(current_timestamp().as("ts"), col("value").as("line")))
  }

  /** Deterministic mock generator (reference input_mock): rate source
    * supplies (timestamp, monotonic index); `lineOf` renders the
    * payload from the index. */
  final case class RateMock(
      rowsPerSecond: Int = 100,
      lineOf: Column => Column = ServiceInputs.defaultMockLine,
      override val tags: Map[String, String] = Map("__mock__" -> "true"))
    extends ServiceInput {
    override def name: String = s"mock:$rowsPerSecond/s"
    override def stream(spark: SparkSession): DataFrame =
      tagged(spark.readStream
        .format("rate").option("rowsPerSecond", rowsPerSecond.toLong)
        .load()
        .select(col("timestamp").as("ts"), lineOf(col("value")).as("line")))
  }

  /** input_mock's default payload: `content: mock log index:<Index>`
    * (input_mock.go:62-66 emits Index plus fixed Fields). */
  def defaultMockLine(index: Column): Column =
    concat(lit("mock log index:"), index)

  /** service_syslog: a line input + frame parser. `format` is the
    * reference's ParseProtocol config (rfc3164 / rfc5424 / auto;
    * parser.go:203-208), `ignoreParseFailure` its failure switch. */
  final case class SyslogInput(
      inner: ServiceInput,
      format: SyslogOps.Format = SyslogOps.Auto(),
      ignoreParseFailure: Boolean = true)
    extends ServiceInput {
    override def name: String = s"syslog(${inner.name})"
    override def tags: Map[String, String] = inner.tags
    override def stream(spark: SparkSession): DataFrame =
      format(inner.stream(spark), "line", ignoreParseFailure)
  }
}
