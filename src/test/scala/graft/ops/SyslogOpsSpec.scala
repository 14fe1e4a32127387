package graft.ops
// (vector fixtures below cite the reference's own unit tests)

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession._

/** Syslog frame parse vectors mirroring the reference's parser tests
  * (plugins/input/syslog/parser_test.go): same frame → same
  * parseResult fields, including the preset-hostname mode, RFC5424
  * nil values and structured data, and the auto-parser fallback.
  */
class SyslogOpsSpec extends AnyFunSuite {

  private def parse3164(hasHostname: Boolean, lines: String*) =
    collectMaps(SyslogOps.Rfc3164(hasHostname, defaultHostname = "presethost",
      year = 2025)(textDf(lines: _*), "text", ignoreParseFailure = true))

  test("rfc3164 vectors (parser_test.go TestRfc3164)") {
    val out = parse3164(true,
      "<60>Oct 09 14:36:47 hostname program: message",
      "<34>Aug  2 09:49:23 hostname program: message",
      "<86>Jul 31 13:14:22 rs1e13316 su: pam_unix(su:session): session closed for user nobody",
      "<13>Aug  1 14:32:44 ecs-test-yyh root: dfjksdfjkdlsfjsklf",
      "<85>Aug  1 14:31:58 ecs-test-yyh polkitd[457]: Registered Authentication Agent for unix-process:22755:258653719 (system bus name :1.10269 [/usr/bin/pkttyagent --notify-fd 5 --fallback], object path /org/freedesktop/PolicyKit1/AuthenticationAgent, locale en_US.UTF-8)",
      "<13>Aug 17 03:42:11 ecs-test-yyh LOGSTASH[-]: hello, a syslog from logstash")

    assert(out(0)("_hostname_") == "hostname" &&
      out(0)("_program_") == "program" && out(0)("_priority_") == 60 &&
      out(0)("_facility_") == 7 && out(0)("_severity_") == 4 &&
      out(0)("_content_") == "message" &&
      out(0)("_ts_").toString == "2025-10-09 14:36:47.0")
    assert(out(1)("_priority_") == 34 && out(1)("_facility_") == 4 &&
      out(1)("_severity_") == 2 &&
      out(1)("_ts_").toString == "2025-08-02 09:49:23.0")
    assert(out(2)("_hostname_") == "rs1e13316" && out(2)("_program_") == "su" &&
      out(2)("_facility_") == 10 && out(2)("_severity_") == 6 &&
      out(2)("_content_") == "pam_unix(su:session): session closed for user nobody")
    assert(out(3)("_content_") == "dfjksdfjkdlsfjsklf" &&
      out(3)("_priority_") == 13)
    assert(out(4)("_program_") == "polkitd" &&
      out(4)("_process_id_") == "457" &&
      out(4)("_content_").toString.startsWith("Registered Authentication Agent"))
    assert(out(5)("_program_") == "LOGSTASH" &&
      out(5)("_process_id_") == "-" &&
      out(5)("_content_") == "hello, a syslog from logstash" &&
      out(5)("_ts_").toString == "2025-08-17 03:42:11.0")
  }

  test("rfc3164 preset-hostname mode (TestRfc3164WithoutHostnameField)") {
    val out = parse3164(false,
      "<86>Apr 16 14:33:06 su: pam_unix(su:session): session opened for user root by (uid=0)")
    assert(out(0)("_hostname_") == "presethost" &&
      out(0)("_program_") == "su" && out(0)("_priority_") == 86 &&
      out(0)("_facility_") == 10 && out(0)("_severity_") == 6 &&
      out(0)("_content_") == "pam_unix(su:session): session opened for user root by (uid=0)" &&
      out(0)("_ts_").toString == "2025-04-16 14:33:06.0")
  }

  test("rfc3164 failure semantics: ignore keeps raw content with -1 " +
    "priorities; strict drops") {
    val bad = "Jul 29 06:20:01 host systemd: no pri header"
    val keep = parse3164(true, bad)
    assert(keep(0)("_priority_") == -1 && keep(0)("_facility_") == -1 &&
      keep(0)("_severity_") == -1 && keep(0)("_hostname_") == "" &&
      keep(0)("_program_") == "" && keep(0)("_content_") == bad &&
      keep(0)("_ts_") == null)
    val strict = collectMaps(SyslogOps.Rfc3164()(textDf(bad), "text",
      ignoreParseFailure = false))
    assert(strict.isEmpty)
  }

  test("rfc5424 vectors (TestRfc5424)") {
    val out = collectMaps(SyslogOps.Rfc5424()(textDf(
      "<29>1 2016-02-21T04:32:57+00:00 web1 someservice 2341 2 [origin][meta sequence=\"14125553\" service=\"someservice\"] \"GET /v1/ok HTTP/1.1\" 200 145 \"-\" \"hacheck 0.9.0\" 24306 127.0.0.1:40124 575",
      "<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - BOM'su root' failed for lonvick on /dev/pts/8",
      "Jul 29 06:20:01 ecs-test-yyh systemd: Started Session 4530 of user root."
    ), "text", ignoreParseFailure = true))

    assert(out(0)("_hostname_") == "web1" &&
      out(0)("_program_") == "someservice" && out(0)("_priority_") == 29 &&
      out(0)("_facility_") == 3 && out(0)("_severity_") == 5 &&
      out(0)("_process_id_") == "2341" && out(0)("_message_id_") == "2" &&
      out(0)("_structured_data_") ==
        "meta{sequence=14125553,service=someservice}origin{}" &&
      out(0)("_content_") ==
        "\"GET /v1/ok HTTP/1.1\" 200 145 \"-\" \"hacheck 0.9.0\" 24306 127.0.0.1:40124 575" &&
      out(0)("_ts_").toString == "2016-02-21 04:32:57.0")
    assert(out(1)("_hostname_") == "mymachine.example.com" &&
      out(1)("_program_") == "su" && out(1)("_process_id_") == null &&
      out(1)("_message_id_") == "ID47" &&
      out(1)("_structured_data_") == "" &&
      out(1)("_content_") == "BOM'su root' failed for lonvick on /dev/pts/8" &&
      out(1)("_ts_").toString == "2003-10-11 22:14:15.003")
    // the no-PRI rfc3164-style line fails rfc5424 parse (go test: nil)
    assert(out(2)("_priority_") == -1 && out(2)("_content_").toString
      .startsWith("Jul 29 06:20:01"))
  }

  test("rfc5424 structured-data escapes and empty message") {
    val out = collectMaps(SyslogOps.Rfc5424()(textDf(
      """<13>1 - - - - - [x k="a\"b" j="c\\d e\]f"]"""), "text",
      ignoreParseFailure = true))
    assert(out(0)("_structured_data_") == "x{j=c\\d e]f,k=a\"b}")
    assert(out(0)("_hostname_") == "" && out(0)("_ts_") == null &&
      out(0)("_content_") == "")
  }

  test("auto parser tries rfc3164 then rfc5424 (TestAuto shape)") {
    val out = collectMaps(SyslogOps.Auto(year = 2025)(textDf(
      "<60>Oct 09 14:36:47 hostname program: message",
      "<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - msg",
      "no syslog at all"
    ), "text", ignoreParseFailure = true))
    assert(out(0)("_program_") == "program" && out(0)("_message_id_") == null)
    assert(out(1)("_program_") == "su" && out(1)("_message_id_") == "ID47" &&
      out(1)("_ts_").toString == "2003-10-11 22:14:15.003")
    assert(out(2)("_priority_") == -1 &&
      out(2)("_content_") == "no syslog at all")
    val strict = collectMaps(SyslogOps.Auto(year = 2025)(textDf(
      "no syslog at all"), "text", ignoreParseFailure = false))
    assert(strict.isEmpty)
  }

  test("priority over 191 is invalid (jeromer parser bound)") {
    val out = parse3164(true, "<192>Oct 09 14:36:47 h p: m")
    assert(out(0)("_priority_") == -1)
  }

  test("hostile header timestamps survive ANSI: out-of-range date/time " +
    "is a parse failure, not an exception") {
    // the regex admits hour/day values make_timestamp range-errors on;
    // Go time.Parse fails these lines, so they must take the
    // parse-failure path (keep-raw or drop), never throw
    val hour99 = "<34>Aug  2 99:49:23 h su: x"
    val feb30 = "<34>Feb 30 09:49:23 h su: x"
    val keep = parse3164(true, hour99, feb30)
    assert(keep.length == 2 && keep.forall(m => m("_priority_") == -1 &&
      m("_ts_") == null))
    assert(keep(0)("_content_") == hour99 && keep(1)("_content_") == feb30)
    assert(collectMaps(SyslogOps.Rfc3164()(textDf(hour99, feb30), "text",
      ignoreParseFailure = false)).isEmpty)
    // the Auto path merges per-row: hostile 3164 header + valid 5424
    val auto = collectMaps(SyslogOps.Auto(year = 2025)(textDf(
      hour99,
      "<34>1 2003-10-11T22:14:15.003Z mymachine su - ID47 - msg"), "text",
      ignoreParseFailure = true))
    assert(auto(0)("_priority_") == -1 && auto(1)("_program_") == "su")
  }
}
