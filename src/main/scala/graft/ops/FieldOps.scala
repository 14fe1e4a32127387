package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Scalar field manipulations (SURVEY.md §2.4) — all built-in,
  * codegen'd expressions. */
object FieldOps {

  /** Add constant fields; `ignoreIfExist` keeps a pre-existing value.
    * Reference: `plugins/processor/addfields/processor_add_fields.go:26-30`. */
  final case class AddFields(fields: Map[String, String], ignoreIfExist: Boolean = false) {
    def apply(df: DataFrame): DataFrame =
      fields.foldLeft(df) { case (d, (k, v)) =>
        if (d.columns.contains(k))
          if (ignoreIfExist) d.withColumn(k, coalesce(col(k), lit(v)))
          else d.withColumn(k, lit(v))
        else d.withColumn(k, lit(v))
      }
  }

  /** Rename columns. Reference: `plugins/processor/rename/
    * processor_rename.go:26-34`. */
  final case class Rename(mapping: Map[String, String]) {
    def apply(df: DataFrame): DataFrame = df.withColumnsRenamed(mapping)
  }

  /** Drop listed keys (content drop, not row drop).
    * Reference: `plugins/processor/drop/processor_drop.go:24-29`. */
  final case class Drop(keys: Seq[String]) {
    def apply(df: DataFrame): DataFrame = df.drop(keys: _*)
  }

  /** Projection: keep only include keys / remove exclude keys.
    * Reference: `plugins/processor/pickkey/processor_pick_key.go:26-37`. */
  final case class PickKey(include: Seq[String] = Nil, exclude: Seq[String] = Nil) {
    def apply(df: DataFrame): DataFrame =
      if (include.nonEmpty) df.select(include.map(col): _*)
      else df.drop(exclude: _*)
  }

  /** String replace: regex / const / dest-copy.
    * Reference: `plugins/processor/stringreplace/
    * processor_string_replace.go:30-40`. */
  final case class StringReplace(
      sourceKey: String,
      regex: String,
      replacement: String,
      destKey: Option[String] = None,
      // first-only mode wraps the pattern in a ^-anchored lazy prefix
      // group; $N refs in `replacement` are shifted so they still point
      // at the caller's groups
      replaceAll: Boolean = true) {
    def apply(df: DataFrame): DataFrame = {
      val out =
        if (replaceAll) regexp_replace(col(sourceKey), regex, replacement)
        else {
          // the user regex is wrapped in a CAPTURING group (group 2) so
          // a "$0" whole-match reference maps onto it; user groups
          // shift by 2 (prefix group + match group)
          val groups = java.util.regex.Pattern.compile(regex).matcher("")
            .groupCount()
          regexp_replace(col(sourceKey), s"(?s)^(.*?)($regex)",
            "$1" + FieldOps.shiftGroupRefs(replacement, by = 2,
              maxGroup = groups, zeroGroup = 2))
        }
      df.withColumn(destKey.getOrElse(sourceKey), out)
    }
  }

  /** Shift every unescaped `$N` capture-group reference in a Java-regex
    * replacement string by `by` (used when a wrapper pattern prepends
    * capture groups); `$0` maps to `zeroGroup` (the group capturing the
    * whole user match). `\$` escapes are left untouched. Digits are
    * read with Java's `Matcher.appendReplacement` greed: the first
    * digit is always consumed, later digits only while the number stays
    * a valid group of the ORIGINAL pattern (`maxGroup`) — so `"$12"`
    * against a 2-group pattern means group 1 then literal '2', and
    * `"$09"` means group 0 then literal '9', exactly as unwrapped Java
    * reads them. */
  private[ops] def shiftGroupRefs(repl: String, by: Int,
      maxGroup: Int, zeroGroup: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < repl.length) {
      val c = repl.charAt(i)
      if (c == '\\' && i + 1 < repl.length) {
        sb.append(c).append(repl.charAt(i + 1)); i += 2
      } else if (c == '$' && i + 1 < repl.length && repl.charAt(i + 1).isDigit) {
        var j = i + 1
        var num = 0
        var first = true
        // greedy-while-valid digit read (Matcher.appendReplacement)
        while (j < repl.length && repl.charAt(j).isDigit &&
          (first || num * 10 + (repl.charAt(j) - '0') <= maxGroup)) {
          num = num * 10 + (repl.charAt(j) - '0')
          first = false
          j += 1
        }
        sb.append('$').append(if (num == 0) zeroGroup else num + by)
        i = j
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Desensitize (mask) content after an anchor pattern.
    * Reference: `core/plugin/processor/ProcessorDesensitizeNative.cpp:
    * 57-117,203-207` — regex `(before)(target)`, replacement
    * `$1 + mask`; `Method` ∈ const/md5. Spark's `regexp_replace` is
    * global, matching the reference's `ReplaceAll=true` mode (first-only
    * is a documented divergence, SURVEY.md §2.4).
    */
  final case class Desensitize(
      sourceKey: String,
      beforePattern: String,
      contentPattern: String,
      method: String = "const", // const | md5
      replacingString: String = "********",
      replaceAll: Boolean = true) {
    def apply(df: DataFrame): DataFrame = {
      val src = col(sourceKey)
      // the mask is a LITERAL (quote $/\ so a "$5" mask can't be read
      // as a group reference by regexp_replace)
      val mask = java.util.regex.Matcher.quoteReplacement(replacingString)
      val out = method match {
        case "const" if replaceAll =>
          // Global replace == reference ReplaceAll=true (RE2
          // GlobalReplace, ProcessorDesensitizeNative.cpp:203-207).
          regexp_replace(src, s"($beforePattern)(?:$contentPattern)",
            "$1" + mask)
        case "const" =>
          // First-only (ReplaceAll=false): Spark's regexp_replace is
          // global, but a ^-anchored lazy prefix can match at most once.
          regexp_replace(src,
            s"(?s)^(.*?$beforePattern)(?:$contentPattern)",
            "$1" + mask)
        case "md5" =>
          // Replace the first occurrence's content with its md5:
          // decompose into (prefix-incl-anchor)(content)(rest) and
          // rebuild — regexp_replace cannot compute replacements.
          val rx3 = s"(?s)^(.*?$beforePattern)($contentPattern)(.*)$$"
          when(src.rlike(s"(?s)$beforePattern(?:$contentPattern)"),
            concat(
              regexp_extract(src, rx3, 1),
              md5(regexp_extract(src, rx3, 2).cast("binary")),
              regexp_extract(src, rx3, 3))
          ).otherwise(src)
        case other => throw new IllegalArgumentException(s"method $other")
      }
      df.withColumn(sourceKey, out)
    }
  }

  /** Base64 encode/decode a field into `destKey`.
    * Reference: `plugins/processor/base64/{encoding,decoding}`. */
  final case class Base64Encode(sourceKey: String, destKey: String) {
    def apply(df: DataFrame): DataFrame =
      // Spark's base64 is MIME-chunked (newline per 76 chars); the
      // reference is Go base64.StdEncoding (unchunked) — strip breaks
      df.withColumn(destKey,
        regexp_replace(base64(col(sourceKey).cast("binary")), "[\\r\\n]", ""))
  }
  final case class Base64Decode(sourceKey: String, destKey: String) {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(destKey, unbase64(col(sourceKey)).cast(StringType))
  }

  /** md5 of a field. Reference: `plugins/processor/md5/processor_md5.go`. */
  final case class Md5(sourceKey: String, destKey: String) {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(destKey, md5(col(sourceKey).cast("binary")))
  }

  /** AES encrypt fields (CBC), reference `plugins/processor/encrypt/
    * processor_encrypt.go` — built-in `aes_encrypt` (Spark ≥3.3). */
  final case class Encrypt(sourceKey: String, keyHex: String, ivHex: String) {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(sourceKey,
        base64(aes_encrypt(col(sourceKey).cast("binary"), unhex(lit(keyHex)),
          lit("CBC"), lit("PKCS"), unhex(lit(ivHex)), lit("".getBytes))))
  }

  /** Inverse of [[Encrypt]] (the consumer side of the reference's
    * encrypted sink): base64 → AES-CBC decrypt → string. CBC ciphertext
    * carries its IV in the leading block, so no IV parameter. */
  final case class Decrypt(sourceKey: String, keyHex: String,
      destKey: Option[String] = None) {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(destKey.getOrElse(sourceKey),
        aes_decrypt(unbase64(col(sourceKey)), unhex(lit(keyHex)),
          lit("CBC"), lit("PKCS"), lit("".getBytes)).cast(StringType))
  }

  /** Append a constant to an existing key, with `{{...}}` template
    * expansion at PLAN time (reference expands at Init,
    * `processor_appender.go:49-63,117-134`): `{{$NAME}}` → environment
    * variable, `{{__ip__}}`/`{{__host__}}` → local address/hostname,
    * anything else → the key text itself (platform-meta keys are
    * cloud-agent-specific — out of scope here, same fallback the
    * reference uses with no meta manager). `env` is injectable so tests
    * don't depend on the process environment. */
  final case class Appender(key: String, value: String,
      sortLabels: Boolean = false,
      env: String => Option[String] = sys.env.get) {
    private val expanded: String =
      "\\{\\{[^}]+\\}\\}".r.replaceAllIn(value, m => {
        val inner = m.matched.drop(2).dropRight(2)
        val res =
          if (inner.startsWith("$")) env(inner.drop(1)).getOrElse("")
          else inner match {
            case "__ip__" =>
              try java.net.InetAddress.getLocalHost.getHostAddress
              catch { case _: Exception => "" }
            case "__host__" =>
              try java.net.InetAddress.getLocalHost.getHostName
              catch { case _: Exception => "" }
            case other => other
          }
        java.util.regex.Matcher.quoteReplacement(res)
      })

    def apply(df: DataFrame): DataFrame = {
      val appended = concat(coalesce(col(key), lit("")), lit(expanded))
      val out =
        if (sortLabels) array_join(array_sort(split(appended, "\\|")), "|")
        else appended
      df.withColumn(key, out)
    }
  }

  /** Pack several columns into one JSON object column.
    * Reference: `plugins/processor/packjson/processor_packjson.go:26-33`. */
  final case class PackJson(sourceKeys: Seq[String], destKey: String) {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(destKey, to_json(struct(sourceKeys.map(col): _*)))
  }

  /** Substring extraction between start/stop anchors. `fieldType =
    * "json"` additionally JSON-expands the anchored substring into a
    * `map<string,string>` column of `destKey{connector}subkey` entries
    * (flattened to `expandDepth`), the reference's `FieldType: json` +
    * `ExpondJSON` mode.
    * Reference: `plugins/processor/anchor/anchor.go:46-98,180-193`. */
  final case class Anchor(
      sourceKey: String,
      start: String,
      stop: String,
      destKey: String,
      fieldType: String = "string",
      connector: String = "_",
      expandDepth: Int = 2) {
    def apply(df: DataFrame): DataFrame = {
      val rx = java.util.regex.Pattern.quote(start) + "(.*?)" +
        java.util.regex.Pattern.quote(stop)
      val extracted = regexp_extract(col(sourceKey), rx, 1)
      fieldType match {
        case "json" =>
          df.withColumn(destKey, graft.ops.ParseOps.flattenJson(extracted,
            expandDepth, connector, prefix = destKey + connector,
            expandArray = false))
        case _ => df.withColumn(destKey, extracted)
      }
    }
  }

  /** Time reformat + epoch extraction of a timestamp column.
    * Reference: `plugins/processor/gotime/processor_gotime.go:34-46`
    * (Go-layout src→dst reformat) and `strptime.go:59-72`
    * (`EnablePreciseTimestamp` epoch key). */
  final case class TimeReformat(
      tsKey: String,
      destKey: String,
      format: String,
      epochKey: Option[String] = None) {
    def apply(df: DataFrame): DataFrame = {
      val d = df.withColumn(destKey, date_format(col(tsKey), format))
      epochKey.fold(d)(k => d.withColumn(k, unix_timestamp(col(tsKey))))
    }
  }

  /** Log → metric-series reshape: label keys become one sorted
    * `k#$#v|…` label string, each (name, value) pair becomes a row.
    * Reference: `plugins/processor/logtoslsmetric/
    * processor_log_to_sls_metric.go:31-42` (MetricLabelKeys sorted label
    * string, MetricValues name→value pairs). */
  final case class LogToMetric(
      labelKeys: Seq[String],
      valueKeys: Seq[String],
      tsKey: String = "ts") {
    def apply(df: DataFrame): DataFrame = {
      val labels = array_join(
        array_sort(array(labelKeys.map(k => concat_ws("#$#", lit(k), col(k))): _*)),
        "|")
      val kvs = map(valueKeys.flatMap(k => Seq(lit(k), col(k))): _*)
      df.withColumn("labels", labels)
        .select(col("*"), explode(kvs).as(Seq("name", "value")))
        .filter(col("value").isNotNull)
        .select(col("labels"), col("name"), col("value"),
          col(tsKey).as("metric_ts"))
    }
  }

  /** Drop (null out) `dropKey` only when every `includeKeys` is present —
    * post-parse raw-field cleanup.
    * Reference: `plugins/processor/droplastkey/processor_drop_last_key.go`. */
  final case class DropLastKey(dropKey: String, includeKeys: Seq[String]) {
    def apply(df: DataFrame): DataFrame = {
      val allPresent = includeKeys.map(col(_).isNotNull).reduce(_ && _)
      df.withColumn(dropKey, when(allPresent, lit(null)).otherwise(col(dropKey)))
    }
  }
}
