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

  test("combined apache log composite pattern parses a full access line") {
    import graft.SparkTestSession._
    import graft.ops.ParseOps
    val line = """10.1.2.3 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326 "http://ref/" "Mozilla/4.08""""
    val out = ParseOps.GrokParser("text", Seq("%{COMBINEDAPACHELOG}"))(
      textDf(line))
    val m = collectMaps(out).head
    assert(m("clientip") == "10.1.2.3" && m("auth") == "frank" &&
      m("verb") == "GET" && m("response") == "200" && m("bytes") == "2326" &&
      m("agent") == "\"Mozilla/4.08\"")
  }

  test("uuid / mac / email / syslog patterns match") {
    val cases = Seq(
      "%{UUID:u}" -> "123e4567-e89b-12d3-a456-426614174000",
      "%{MAC:m}" -> "aa:bb:cc:dd:ee:ff",
      "%{EMAILADDRESS:e}" -> "alice.b@example.org",
      "%{SYSLOGTIMESTAMP:t}" -> "Jan  7 04:05:06",
      "%{DATE_US:d}" -> "10/31/2025")
    cases.foreach { case (pat, s) =>
      val (rx, _) = Grok.compile(pat)
      assert(s.matches(rx), s"$pat should match '$s'")
    }
  }

  test("reference vectors: WORD/NUMBER basic parse incl. trailing newline + empty (processor_grok_test.go:120-155)") {
    import graft.SparkTestSession._
    import graft.ops.ParseOps
    val g = ParseOps.GrokParser("text",
      Seq("%{WORD:word1} %{NUMBER:request_time} %{WORD:word2}"))
    val out = collectMaps(g(textDf("begin 123.456 end", "", "begin 123.456 end\n")))
    val ok = out.filter(_("word1") != null)
    assert(ok.size == 2) // search semantics: trailing \n still matches
    assert(ok.forall(m => m("word1") == "begin" &&
      m("request_time") == "123.456" && m("word2") == "end"))
    assert(out.exists(m => m("word1") == null)) // empty line fails
  }

  test("reference vectors: unicode data + hyphenated alias (processor_grok_test.go:156-170)") {
    import graft.SparkTestSession._
    import graft.ops.ParseOps
    val g = ParseOps.GrokParser("text",
      Seq("%{WORD:english-word} %{GREEDYDATA:message}"))
    val m = collectMaps(g(textDf("hello こんにちは"))).head
    assert(m("english-word") == "hello" && m("message") == "こんにちは")
  }

  test("reference vectors: grok refs mixed with an inline (?P<name>) regex group (processor_grok_test.go:172-190)") {
    import graft.SparkTestSession._
    import graft.ops.ParseOps
    val g = ParseOps.GrokParser("text",
      Seq("%{WORD:english-word} %{GREEDYDATA:message} (?P<message2>.*)"))
    val m = collectMaps(g(textDf("hello こんにちは 你好"))).head
    assert(m("english-word") == "hello")
    assert(m("message") == "こんにちは")
    assert(m("message2") == "你好")
  }

  test("reference vectors: multiline thread-dump pattern with (?ms) flags (processor_grok_test.go:192-219)") {
    import graft.SparkTestSession._
    import graft.ops.ParseOps
    val record =
      "[2023-02-09T00:24:43.922554223+08:00] 1 \"BLOCKED_TEST pool-1-thread-2\" prio=6 tid=0x0000000007673800 nid=0x260c waiting for monitor entry [0x0000000008abf000]\n" +
      "java.lang.Thread.State: BLOCKED (on object monitor)\n" +
      "\t at com.nbp.theplatform.threaddump.ThreadBlockedState.monitorLock(ThreadBlockedState.java:43)"
    val pat = "\\[%{TIMESTAMP_ISO8601:time_local}\\] %{NUMBER:pid} %{QUOTEDSTRING:thread} prio=%{NUMBER:prio} tid=%{BASE16NUM:tid} nid=%{BASE16NUM:nid} %{DATA:func} \\[%{BASE16NUM:addr}\\]%{SPACE}(?s)%{GREEDYDATA:stack}"
    val m = collectMaps(ParseOps.GrokParser("text", Seq(pat))(textDf(record))).head
    assert(m("time_local") == "2023-02-09T00:24:43.922554223+08:00")
    assert(m("pid") == "1")
    assert(m("thread") == "\"BLOCKED_TEST pool-1-thread-2\"")
    assert(m("prio") == "6" && m("tid") == "0x0000000007673800")
    assert(m("nid") == "0x260c" && m("func") == "waiting for monitor entry")
    assert(m("addr") == "0x0000000008abf000")
    assert(m("stack").asInstanceOf[String].startsWith("java.lang.Thread.State: BLOCKED"))
  }

  test("reference vectors: multi-pattern first-match-wins with custom %{HTTP} (processor_grok_test.go:222-286)") {
    import graft.SparkTestSession._
    import graft.ops.ParseOps
    val g = ParseOps.GrokParser("text",
      Seq("%{HTTP}",
        "%{WORD:word1} %{NUMBER:request_time} %{WORD:word2}",
        "%{YEAR:year} %{MONTH:month} %{MONTHDAY:day} %{QUOTEDSTRING:motto}"),
      customPatterns = Map("HTTP" ->
        "%{IP:client} %{WORD:method} %{URIPATHPARAM:request} %{NUMBER:bytes} %{NUMBER:duration}"))
    val out = collectMaps(g(textDf(
      "begin 123.456 end",
      "2019 June 24 \"I am iron man\"",
      "WRONG LOG",
      "10.0.0.0 GET /index.html 15824 0.043")))
    val m1 = out.find(_("word1") != null).get
    assert(m1("request_time") == "123.456")
    val m2 = out.find(_("year") != null).get
    assert(m2("month") == "June" && m2("day") == "24" &&
      m2("motto") == "\"I am iron man\"")
    val m4 = out.find(_("client") != null).get
    assert(m4("method") == "GET" && m4("request") == "/index.html" &&
      m4("bytes") == "15824" && m4("duration") == "0.043")
    assert(out.exists(m => m("text") == "WRONG LOG")) // kept on fail
  }

  test("custom-pattern dictionary bodies accept Go-spelled (?P<name>) groups") {
    // the Go grok dialect allows (?P<...) inside CustomPatterns values;
    // the normalization must reach dictionary bodies, not just the
    // top-level pattern, or Java regex compilation throws
    val (rx, fields) = Grok.compileIndexed("%{REQ:r} %{INT:n}",
      Map("REQ" -> "(?P<verb>GET|POST) (?P<path>\\S+)"))
    val byName = fields.map(f => f._1 -> f._3).toMap
    assert(byName.keySet == Set("r", "verb", "path", "n"))
    val m = java.util.regex.Pattern.compile(rx).matcher("GET /api/x 42")
    assert(m.matches())
    assert(m.group(byName("r")) == "GET /api/x")
    assert(m.group(byName("verb")) == "GET")
    assert(m.group(byName("path")) == "/api/x")
    assert(m.group(byName("n")) == "42")
  }

  test("a custom-pattern named group cannot collide with internal alias markers") {
    // a dictionary body that names a group exactly like the default
    // marker prefix must not shadow the %{INT:a} alias
    val (rx, fields) = Grok.compileIndexed("%{INT:a} %{P}",
      Map("P" -> "(?<gk0>x+)"))
    val byName = fields.map(f => f._1 -> f._3).toMap
    assert(byName.keySet == Set("a", "gk0"))
    val m = java.util.regex.Pattern.compile(rx).matcher("42 xxx")
    assert(m.matches())
    assert(m.group(byName("a")) == "42")
    assert(m.group(byName("gk0")) == "xxx")
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

  test("full reference default dictionary: every pattern name from " +
    "processor_grok_default_patterns.go compiles to a valid Java regex") {
    val refNames = Seq(
      "BASE10NUM", "BASE16FLOAT", "BASE16NUM", "CISCOMAC",
      "COMBINEDAPACHELOG", "COMMONAPACHELOG", "COMMONMAC", "DATA", "DATE",
      "DATESTAMP", "DATESTAMP_EVENTLOG", "DATESTAMP_OTHER",
      "DATESTAMP_RFC2822", "DATESTAMP_RFC822", "DATE_EU", "DATE_US", "DAY",
      "EMAILADDRESS", "EMAILLOCALPART", "GREEDYDATA", "HOST", "HOSTNAME",
      "HOSTPORT", "HOUR", "HTTPD20_ERRORLOG", "HTTPD24_ERRORLOG",
      "HTTPDATE", "HTTPDERROR_DATE", "HTTPDUSER", "HTTPD_ERRORLOG", "INT",
      "IP", "IPORHOST", "IPV4", "IPV6", "ISO8601_SECOND",
      "ISO8601_TIMEZONE", "LOGLEVEL", "MAC", "MINUTE", "MONTH", "MONTHDAY",
      "MONTHNUM", "MONTHNUM2", "NONNEGINT", "NOTSPACE", "NUMBER", "PATH",
      "POSINT", "PROG", "QS", "QUOTEDSTRING", "SECOND", "SPACE",
      "SYSLOGBASE", "SYSLOGFACILITY", "SYSLOGHOST", "SYSLOGPROG",
      "SYSLOGTIMESTAMP", "TIME", "TIMESTAMP_ISO8601", "TTY", "TZ",
      "UNIXPATH", "URI", "URIHOST", "URIPARAM", "URIPATH", "URIPATHPARAM",
      "URIPROTO", "URN", "USER", "USERNAME", "UUID", "WINDOWSMAC",
      "WINPATH", "WORD", "YEAR")
    assert(refNames.size == 78)
    refNames.foreach { n =>
      val (rx, _) = Grok.compile(s"%{$n:x}")
      java.util.regex.Pattern.compile(rx) // throws on an invalid expansion
    }
    // and nothing beyond the reference set is silently missing
    assert(refNames.toSet.subsetOf(Grok.defaultPatterns.keySet))
  }

  test("new pattern families match: paths, uri/urn, ipv6, datestamps, " +
    "tty, syslog base, httpd error log") {
    def m(pat: String, s: String): Boolean = {
      val (rx, _) = Grok.compile(pat)
      java.util.regex.Pattern.compile(rx).matcher(s).matches()
    }
    assert(m("%{UNIXPATH:p}", "/var/log/app.log"))
    assert(m("%{WINPATH:p}", "C:\\Windows\\System32\\drivers"))
    assert(m("%{PATH:p}", "/usr/local/bin"))
    assert(m("%{IP:ip}", "2001:db8::8a2e:370:7334"))
    assert(m("%{IP:ip}", "192.168.0.1"))
    assert(m("%{URI:u}", "https://user@www.example.com:8080/a/b?x=1"))
    assert(m("%{URN:u}", "urn:ietf:rfc:2648"))
    assert(m("%{DATESTAMP:d}", "01/02/2024 15:04:05"))
    assert(m("%{DATESTAMP_RFC2822:d}", "Mon, 02 Jan 2006 15:04:05 +07:00"))
    assert(m("%{DATESTAMP_EVENTLOG:d}", "20240102150405"))
    assert(m("%{TTY:t}", "/dev/pts/3"))
    assert(m("%{SYSLOGBASE}", "Aug  1 14:31:58 host polkitd[457]:"))
    assert(!m("%{MONTHNUM2:n}", "9")) // zero-padded only, unlike MONTHNUM
    val (rx, fields) = Grok.compileIndexed("%{HTTPD24_ERRORLOG}")
    val mm = java.util.regex.Pattern.compile(rx).matcher(
      "[Fri Sep 09 10:42:29 2011] [core:error] [pid 35708:tid 4328636416]" +
        " [client 72.15.99.187:12345] File does not exist:" +
        " /usr/local/apache2/htdocs/favicon.ico")
    assert(mm.matches())
    val byName = fields.map { case (a, _, i) => a -> mm.group(i) }.toMap
    assert(byName("module") == "core" && byName("loglevel") == "error" &&
      byName("pid") == "35708" && byName("client") == "72.15.99.187" &&
      byName("errorcode") == "File does not exist" &&
      byName("message") == "/usr/local/apache2/htdocs/favicon.ico")
  }
}
