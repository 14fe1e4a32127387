package graft.functions

import scala.collection.mutable

/** Grok pattern → Java regex compiler, run at plan-build time so the
  * executing plan contains only `rlike`/`regexp_extract` (codegen'd,
  * UDF-free — the north star requirement).
  *
  * Reference semantics: `plugins/processor/grok/processor_grok.go:48-65`
  * (patterns recursively expanded and compiled once at Init) with the
  * public grok default dictionary
  * (`plugins/processor/grok/processor_grok_default_patterns.go`; the
  * patterns themselves are the standard public logstash set).
  *
  * `%{NAME:alias}` becomes a capturing group recorded under `alias`;
  * `%{NAME}` expands non-capturing; `%{NAME:alias:type}` drops the type
  * (casting is the caller's job — columns are typed downstream).
  * Capturing groups inside dictionary bodies are rewritten to
  * non-capturing so alias group indices stay dense and ordered.
  */
object Grok {

  /** Public default patterns (standard grok/logstash dictionary). */
  val defaultPatterns: Map[String, String] = Map(
    "USERNAME" -> "[a-zA-Z0-9._-]+",
    "USER" -> "%{USERNAME}",
    "INT" -> "(?:[+-]?(?:[0-9]+))",
    "BASE10NUM" -> "(?:[+-]?(?:[0-9]+(?:\\.[0-9]+)?)|\\.[0-9]+)",
    "NUMBER" -> "(?:%{BASE10NUM})",
    "BASE16NUM" -> "(?<![0-9A-Fa-f])(?:[+-]?(?:0x)?(?:[0-9A-Fa-f]+))",
    "BASE16FLOAT" -> "\\b(?<![0-9A-Fa-f.])(?:[+-]?(?:0x)?(?:(?:[0-9A-Fa-f]+(?:\\.[0-9A-Fa-f]*)?)|(?:\\.[0-9A-Fa-f]+)))\\b",
    "POSINT" -> "\\b(?:[1-9][0-9]*)\\b",
    "NONNEGINT" -> "\\b(?:[0-9]+)\\b",
    "WORD" -> "\\b\\w+\\b",
    "NOTSPACE" -> "\\S+",
    "SPACE" -> "\\s*",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "QUOTEDSTRING" -> "(?:\"(?:[^\"\\\\]|\\\\.)*\"|'(?:[^'\\\\]|\\\\.)*')",
    "QS" -> "%{QUOTEDSTRING}",
    "IPV4" -> "(?:[0-9]{1,3}\\.){3}[0-9]{1,3}",
    "IPV6" -> "((([0-9A-Fa-f]{1,4}:){7}([0-9A-Fa-f]{1,4}|:))|(([0-9A-Fa-f]{1,4}:){6}(:[0-9A-Fa-f]{1,4}|((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3})|:))|(([0-9A-Fa-f]{1,4}:){5}(((:[0-9A-Fa-f]{1,4}){1,2})|:((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3})|:))|(([0-9A-Fa-f]{1,4}:){4}(((:[0-9A-Fa-f]{1,4}){1,3})|((:[0-9A-Fa-f]{1,4})?:((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3}))|:))|(([0-9A-Fa-f]{1,4}:){3}(((:[0-9A-Fa-f]{1,4}){1,4})|((:[0-9A-Fa-f]{1,4}){0,2}:((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3}))|:))|(([0-9A-Fa-f]{1,4}:){2}(((:[0-9A-Fa-f]{1,4}){1,5})|((:[0-9A-Fa-f]{1,4}){0,3}:((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3}))|:))|(([0-9A-Fa-f]{1,4}:){1}(((:[0-9A-Fa-f]{1,4}){1,6})|((:[0-9A-Fa-f]{1,4}){0,4}:((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3}))|:))|(:(((:[0-9A-Fa-f]{1,4}){1,7})|((:[0-9A-Fa-f]{1,4}){0,5}:((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3}))|:)))(%.+)?",
    "IP" -> "(?:%{IPV6}|%{IPV4})",
    "HOSTNAME" -> "\\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*(\\.?|\\b)",
    "HOST" -> "%{HOSTNAME}",
    "IPORHOST" -> "(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT" -> "%{IPORHOST}:%{POSINT}",
    "URIPATH" -> "(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\\-]*)+",
    "URIPARAM" -> "\\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\\-\\[\\]<>]*",
    "URIPATHPARAM" -> "%{URIPATH}(?:%{URIPARAM})?",
    "MONTH" -> "\\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\\b",
    "MONTHDAY" -> "(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "YEAR" -> "(?:\\d\\d){1,2}",
    "HOUR" -> "(?:2[0123]|[01]?[0-9])",
    "MINUTE" -> "(?:[0-5][0-9])",
    "SECOND" -> "(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME" -> "(?:%{HOUR}:%{MINUTE}(?::%{SECOND})?)",
    "ISO8601_TIMEZONE" -> "(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "ISO8601_SECOND" -> "(?:%{SECOND}|60)",
    "TIMESTAMP_ISO8601" -> "%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "HTTPDATE" -> "%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "MONTHNUM2" -> "(?:0[1-9]|1[0-2])",
    "DAY" -> "(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "TZ" -> "(?:[PMCE][SD]T|UTC|GMT)",
    "DATE" -> "%{DATE_US}|%{DATE_EU}",
    "DATESTAMP" -> "%{DATE}[- ]%{TIME}",
    "DATESTAMP_RFC822" -> "%{DAY} %{MONTH} %{MONTHDAY} %{YEAR} %{TIME} %{TZ}",
    "DATESTAMP_RFC2822" -> "%{DAY}, %{MONTHDAY} %{MONTH} %{YEAR} %{TIME} %{ISO8601_TIMEZONE}",
    "DATESTAMP_OTHER" -> "%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{TZ} %{YEAR}",
    "DATESTAMP_EVENTLOG" -> "%{YEAR}%{MONTHNUM2}%{MONTHDAY}%{HOUR}%{MINUTE}%{SECOND}",
    "HTTPDERROR_DATE" -> "%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{YEAR}",
    "LOGLEVEL" -> "(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "UUID" -> "[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "MAC" -> "(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
    "CISCOMAC" -> "(?:[A-Fa-f0-9]{4}\\.){2}[A-Fa-f0-9]{4}",
    "WINDOWSMAC" -> "(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
    "COMMONMAC" -> "(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "DATE_US" -> "%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU" -> "%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "MONTHNUM" -> "(?:0?[1-9]|1[0-2])",
    "SYSLOGTIMESTAMP" -> "%{MONTH} +%{MONTHDAY} %{TIME}",
    "PROG" -> "[\\x21-\\x5a\\x5c\\x5e-\\x7e]+",
    "SYSLOGPROG" -> "%{PROG:program}(?:\\[%{POSINT:pid}\\])?",
    "SYSLOGHOST" -> "%{IPORHOST}",
    "SYSLOGFACILITY" -> "<%{NONNEGINT:facility}.%{NONNEGINT:priority}>",
    "SYSLOGBASE" -> "%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    "HTTPDUSER" -> "%{EMAILADDRESS}|%{USER}",
    "TTY" -> "(?:/dev/(pts|tty([pq])?)(\\w+)?/?(?:[0-9]+))",
    "WINPATH" -> "(?>[A-Za-z]+:|\\\\)(?:\\\\[^\\\\?*]*)+",
    "UNIXPATH" -> "(/([\\w_%!$@:.,~-]+|\\\\.)*)+",
    "PATH" -> "(?:%{UNIXPATH}|%{WINPATH})",
    "URIPROTO" -> "[A-Za-z]+(\\+[A-Za-z+]+)?",
    "URIHOST" -> "%{IPORHOST}(?::%{POSINT:port})?",
    "URI" -> "%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    "URN" -> "urn:[0-9A-Za-z][0-9A-Za-z-]{0,31}:(?:%[0-9a-fA-F]{2}|[0-9A-Za-z()+,.:=@;$_!*'/?#-])+",
    "HTTPD20_ERRORLOG" -> "\\[%{HTTPDERROR_DATE:timestamp}\\] \\[%{LOGLEVEL:loglevel}\\] (?:\\[client %{IPORHOST:clientip}\\] ){0,1}%{GREEDYDATA:errormsg}",
    "HTTPD24_ERRORLOG" -> "\\[%{HTTPDERROR_DATE:timestamp}\\] \\[%{WORD:module}:%{LOGLEVEL:loglevel}\\] \\[pid %{POSINT:pid}:tid %{NUMBER:tid}\\]( \\(%{POSINT:proxy_errorcode}\\)%{DATA:proxy_errormessage}:)?( \\[client %{IPORHOST:client}:%{POSINT:clientport}\\])? %{DATA:errorcode}: %{GREEDYDATA:message}",
    "HTTPD_ERRORLOG" -> "%{HTTPD20_ERRORLOG}|%{HTTPD24_ERRORLOG}",
    "EMAILLOCALPART" -> "[a-zA-Z0-9!#$%&'*+\\-/=?^_`{|}~]{1,64}(?:\\.[a-zA-Z0-9!#$%&'*+\\-/=?^_`{|}~]{1,62}){0,63}",
    "EMAILADDRESS" -> "%{EMAILLOCALPART}@%{HOSTNAME}",
    // composite Apache formats (the classic grok showcases)
    "COMMONAPACHELOG" -> "%{IPORHOST:clientip} %{NOTSPACE:ident} %{NOTSPACE:auth} \\[%{HTTPDATE:timestamp}\\] \"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" %{NUMBER:response} (?:%{NUMBER:bytes}|-)",
    "COMBINEDAPACHELOG" -> "%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}"
  )

  // alias names allow '-' (the Go dialect accepts e.g. english-word,
  // processor_grok_test.go:157)
  private val ref = "%\\{(\\w+)(?::([\\w.\\[\\]-]+))?(?::(\\w+))?\\}".r

  /** Make every capturing group in a dictionary body non-capturing.
    * Handles escaped parens and character classes. */
  private[graft] def decapture(rx: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < rx.length) {
      val c = rx.charAt(i)
      if (c == '\\' && i + 1 < rx.length) { sb.append(c).append(rx.charAt(i + 1)); i += 2 }
      else {
        if (c == '[' && !inClass) inClass = true
        else if (c == ']' && inClass) inClass = false
        if (c == '(' && !inClass && (i + 1 >= rx.length || rx.charAt(i + 1) != '?'))
          sb.append("(?:")
        else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Expand a grok expression to (javaRegex, orderedAliases). */
  def compile(pattern: String, custom: Map[String, String] = Map.empty): (String, Seq[String]) = {
    val (rx, typed) = compileTyped(pattern, custom)
    (rx, typed.map(_._1))
  }

  /** Like [[compile]] but preserves the optional type-cast suffix of
    * each alias (`%{POSINT:pid:int}` → ("pid", Some("int"))). */
  def compileTyped(pattern: String, custom: Map[String, String] = Map.empty)
      : (String, Seq[(String, Option[String])]) = {
    val (rx, idx) = compileIndexed(pattern, custom)
    (rx, idx.map { case (a, t, _) => (a, t) })
  }

  /** Full compilation: (javaRegex, (alias, castType, captureGroupIdx)).
    *
    * Beyond `%{NAME:alias}` refs this supports the Go grok dialect's
    * inline named groups — `(?P<name>…)` (Go/regexp2 spelling) and
    * `(?<name>…)` — which become extracted fields at their real group
    * position (`processor_grok_test.go:174`: grok refs and regex named
    * groups mix in one Match line). Unnamed user capture groups keep
    * their index but produce no field, like the reference, which only
    * surfaces named groups. All name syntax is stripped from the final
    * regex (fields extract by INDEX via `regexp_extract`), so names
    * never need to be Java-legal.
    * Reference: `plugins/processor/grok/processor_grok.go:48-65`
    * (compile-at-Init; alias types int/long/float/double/bool). */
  def compileIndexed(pattern: String, custom: Map[String, String] = Map.empty)
      : (String, Seq[(String, Option[String], Int)]) = {
    // normalize Go named-group spelling EVERYWHERE the expansion can
    // reach — the top-level pattern AND every dictionary body (a custom
    // pattern may itself contain `(?P<x>...)`, which Java regex rejects;
    // the Go grok dialect accepts it in custom patterns)
    val dict = (defaultPatterns ++ custom)
      .map { case (k, v) => k -> v.replace("(?P<", "(?<") }
    // pick a marker prefix that cannot collide with a user-written group
    // name ANYWHERE (decapture leaves named groups intact, so a custom
    // pattern like "(?<gk0>x)" would otherwise shadow a marker)
    val pre = pattern.replace("(?P<", "(?<")
    val nameCorpus = (pre +: dict.values.toSeq).mkString(" ")
    var pfx = "gk"
    while (nameCorpus.contains("?<" + pfx)) pfx += "z"
    val markers = mutable.Map.empty[String, (String, Option[String])]

    def expand(p: String, depth: Int): String = {
      require(depth < 50, s"grok recursion too deep in: $pattern")
      ref.replaceAllIn(p, m => {
        val name = m.group(1)
        val alias = Option(m.group(2))
        val castType = Option(m.group(3))
        val body = dict.getOrElse(name,
          throw new IllegalArgumentException(s"unknown grok pattern %{$name}"))
        val g = alias match {
          case Some(a) =>
            val mk = pfx + markers.size
            markers(mk) = (a, castType)
            s"(?<$mk>${expand(decapture(body), depth + 1)})"
          case None => s"(?:${expand(decapture(body), depth + 1)})"
        }
        java.util.regex.Matcher.quoteReplacement(g)
      })
    }
    val expanded = expand(pre, 0)

    // Final scan: number every capturing group left-to-right, resolve
    // marker/user named groups to field entries, strip name syntax.
    val out = new StringBuilder
    val fields = mutable.ArrayBuffer.empty[(String, Option[String], Int)]
    var i = 0
    var inClass = false
    var groupIdx = 0
    while (i < expanded.length) {
      val c = expanded.charAt(i)
      if (c == '\\' && i + 1 < expanded.length) {
        out.append(c).append(expanded.charAt(i + 1)); i += 2
      } else {
        if (c == '[' && !inClass) inClass = true
        else if (c == ']' && inClass) inClass = false
        if (c == '(' && !inClass) {
          val isNamed = i + 2 < expanded.length &&
            expanded.charAt(i + 1) == '?' && expanded.charAt(i + 2) == '<' &&
            i + 3 < expanded.length &&
            expanded.charAt(i + 3) != '=' && expanded.charAt(i + 3) != '!'
          if (isNamed) {
            val close = expanded.indexOf('>', i + 3)
            require(close > 0, s"unterminated group name in: $expanded")
            val name = expanded.substring(i + 3, close)
            groupIdx += 1
            fields += markers.get(name)
              .map { case (a, t) => (a, t, groupIdx) }
              .getOrElse((name, None, groupIdx))
            out.append('(')
            i = close + 1
          } else if (i + 1 >= expanded.length || expanded.charAt(i + 1) != '?') {
            groupIdx += 1 // unnamed capturing group: indexed, no field
            out.append(c); i += 1
          } else { out.append(c); i += 1 }
        } else { out.append(c); i += 1 }
      }
    }
    (out.toString, fields.toSeq)
  }
}
