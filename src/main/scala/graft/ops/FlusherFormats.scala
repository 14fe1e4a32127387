package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols
import graft.functions.Cols.{goFloat, optCol}

/** Generic flusher serialization protocols — the wire shapes the
  * reference's kafka/http flushers write, selected by the converter's
  * `Protocol` field (`pkg/protocol/converter/converter.go:168-204`):
  *
  *  - `custom_single`   — one JSON object per log:
  *    `{"contents":{…},"tags":{…},"time":N}`
  *    (`custom_single_log.go:32-62` ConvertToSingleProtocolLogs);
  *  - `custom_single_flatten` — contents+tags+time merged into one
  *    flat JSON object (`converter_single_log_flatten.go:23-60`);
  *  - `jsonline`        — the flatten objects, newline-joined at the
  *    sink (`jsonline.go:16-42`);
  *  - `influxdb`        — influx line protocol over metric-log rows
  *    (`influxdb_metric.go:32-86` + the metricReader of
  *    `converter_sls_metric.go:93-233`).
  *
  * Columnar re-derivation: a reference Log's contents are named
  * columns here, so `contentKeys`/`tagCols` name them explicitly and
  * the `__tag__:`-prefix sorting the reference does per-record
  * (`converter.go:230-283` convertLogToMap) becomes build-time
  * configuration. Kept exactly: the reserved-tag rename table
  * (`converter.go:79-91` tagConversionMap + `__log_topic__`),
  * `__user_defined_id__`/`__pack_id__` suppression, tagKeyRenameMap
  * (rename-to-empty drops the tag, `converter.go:309-315`),
  * protocolKeyRenameMap, OnlyContents, `host.ip` from Source and
  * `log.topic` from Topic, and Go `json.Marshal`'s sorted-key object
  * rendering (all keys are static at build time, so the sort happens
  * once here, not per row). Null column values render as ABSENT keys
  * (a reference Log simply lacks the content) — the one divergence.
  *
  * Everything is a per-row projection — one `to_json` (or string
  * concat) per row, no shuffle, no UDF: at 100 TB these encoders add
  * zero data movement over the rows they serialize.
  */
object FlusherFormats {

  /** `converter.go:79-91` + the `__log_topic__` special case
    * (`converter.go:233-235`); K8sFlag=false tier (the special
    * conversion map is a deploy-mode rename of three of these). */
  private val TagConversionMap = Map(
    "__path__" -> "log.file.path",
    "__hostname__" -> "host.name",
    "_node_ip_" -> "k8s.node.ip",
    "_node_name_" -> "k8s.node.name",
    "_namespace_" -> "k8s.namespace.name",
    "_pod_name_" -> "k8s.pod.name",
    "_pod_ip_" -> "k8s.pod.ip",
    "_pod_uid_" -> "k8s.pod.uid",
    "_container_name_" -> "container.name",
    "_container_ip_" -> "container.ip",
    "_image_name_" -> "container.image.name",
    "__log_topic__" -> "log.topic")

  private val SuppressedTags = Set("__user_defined_id__", "__pack_id__")

  /** convertLogToMap's tag-name pipeline for one key: strip the
    * `__tag__:` prefix, apply the reserved-name conversion, then the
    * user rename map (rename-to-empty → None = dropped). */
  private def tagName(raw: String,
      renameMap: Map[String, String]): Option[String] = {
    val base = raw.stripPrefix("__tag__:")
    if (SuppressedTags.contains(base)) None
    else {
      val converted = TagConversionMap.getOrElse(base, base)
      renameMap.get(converted) match {
        case Some("") => None
        case Some(newKey) => Some(newKey)
        case None => Some(converted)
      }
    }
  }

  /** `custom_single` / `custom_single_flatten` / `jsonline` JSON
    * serialization. One output row per input row with the JSON payload
    * in `destKey` (the sink writes one per line; `jsonline` is the
    * flatten tier newline-joined, which a text sink does for free).
    * All other columns pass through. */
  final case class CustomSingleWriter(
      timeKey: String, // unix seconds
      contentKeys: Seq[String],
      tagCols: Seq[String] = Nil, // tag columns, key = column name
      source: String = "", // → host.ip (converter.go:266)
      topic: String = "", // → log.topic (converter.go:267-269)
      tags: Map[String, String] = Map.empty, // static LogTags analog
      tagKeyRenameMap: Map[String, String] = Map.empty,
      protocolKeyRenameMap: Map[String, String] = Map.empty,
      flatten: Boolean = false,
      onlyContents: Boolean = false, // flatten tier only
      destKey: String = "payload") {
    require(contentKeys.nonEmpty, "need at least one content key")

    def apply(df: DataFrame): DataFrame = {
      val contents: Seq[(String, Column)] =
        contentKeys.map(k => k -> col(k).cast("string"))
      // insertion order mirrors convertLogToMap: content-derived tags,
      // then LogTags, then host.ip, then log.topic — last write wins
      val tagInserts: Seq[(String, Column)] =
        tagCols.flatMap(k =>
          tagName(k, tagKeyRenameMap).map(_ -> col(k).cast("string"))) ++
        tags.toSeq.sortBy(_._1).flatMap { case (k, v) =>
          tagName(k, tagKeyRenameMap).map(_ -> lit(v)) } ++
        (if (source.nonEmpty)
          tagName("host.ip", tagKeyRenameMap).map(_ -> lit(source))
        else None) ++
        (if (topic.nonEmpty)
          tagName("log.topic", tagKeyRenameMap).map(_ -> lit(topic))
        else None)
      val tagMap: Seq[(String, Column)] =
        tagInserts.foldLeft(Vector.empty[(String, Column)]) {
          case (acc, (k, v)) => acc.filterNot(_._1 == k) :+ (k -> v)
        }
      def pk(k: String): String = protocolKeyRenameMap.getOrElse(k, k)
      val timeCol = col(timeKey).cast("long")
      // Go json.Marshal sorts map keys — keys are static, sort once
      val fields: Seq[(String, Column)] =
        if (flatten) {
          // time participates in the same last-wins fold: a content or
          // tag column named like the time key would otherwise emit a
          // duplicate JSON key where the Go map insert overwrites
          (contents ++ (if (onlyContents) Nil else tagMap) :+
            (pk("time") -> timeCol))
            .foldLeft(Vector.empty[(String, Column)]) {
              case (acc, (k, v)) => acc.filterNot(_._1 == k) :+ (k -> v)
            }
        } else Seq(
          pk("contents") -> struct(contents.sortBy(_._1)
            .map { case (k, v) => v.as(k) }: _*),
          pk("tags") -> struct(tagMap.sortBy(_._1)
            .map { case (k, v) => v.as(k) }: _*),
          pk("time") -> timeCol)
      df.withColumn(destKey, to_json(struct(fields.sortBy(_._1)
        .map { case (k, v) => v.as(k) }: _*)))
    }
  }

  /** Catalyst twin of [[BinaryDecoders.readLabels]] — the reference's
    * `metricReader.readSortedLabels` scan
    * (`converter_sls_metric.go:101-160`) over the `k#$#v|…` string as a
    * per-row expression: `|` splits entries, but a segment WITHOUT
    * "#$#" is a CONTINUATION — it extends the previous label's VALUE
    * (the `|` restored), or the pending KEY before the first completed
    * label; key/value split on the FIRST "#$#" (substring_index(-1)
    * would take the LAST). The reference's manual scanner emits no
    * segment for a trailing `|` — drop the one trailing empty Spark's
    * split keeps. A dangling key at the end is the reference's error
    * case; total posture keeps the completed labels and drops the
    * dangling key. Returns `array<struct<k,v>>` in scan order
    * (unsorted — callers sort/dedup per their wire rules); the
    * property spec pins this expression to the Scala scanner on random
    * inputs so the two can never drift. */
  private[ops] def labelEntries(labels: Column): Column = {
    val segsAll = split(labels, "\\|", -1)
    val segs = when(element_at(segsAll, -1) === "",
      slice(segsAll, lit(1), size(segsAll) - 1)).otherwise(segsAll)
    aggregate(
      segs,
      struct(array().cast("array<struct<k:string,v:string>>").as("ls"),
        lit("").as("key")),
      (acc, seg) => {
        val ls = acc.getField("ls")
        val key = acc.getField("key")
        val i = instr(seg, "#$#")
        when(i === 0,
          when(size(ls) > 0, struct(
            concat(slice(ls, lit(1), size(ls) - 1), array(struct(
              element_at(ls, -1).getField("k").as("k"),
              concat(element_at(ls, -1).getField("v"), lit("|"), seg)
                .as("v")))).as("ls"),
            key.as("key")))
            .otherwise(struct(ls.as("ls"),
              when(key === "", seg)
                .otherwise(concat(key, lit("|"), seg)).as("key"))))
          .otherwise(struct(
            concat(ls, array(struct(
              when(key === "", seg.substr(lit(1), i - 1))
                .otherwise(concat(key, lit("|"),
                  seg.substr(lit(1), i - 1))).as("k"),
              seg.substr(i + lit(3), length(seg)).as("v")))).as("ls"),
            lit("").as("key")))
      },
      acc => acc.getField("ls"))
  }

  /** Influx line-protocol serialization of metric-log rows —
    * `ConvertToInfluxdbProtocolStream` (`influxdb_metric.go:32-86`)
    * over the metricReader's field contract
    * (`converter_sls_metric.go:211-233`):
    * `meas[,tag=v…] field=value[ ts]` per row, where
    *  - the measurement is `__name__` with its `:<field>` suffix
    *    stripped when `__field__` is set and ≠ "value"
    *    (readNames, `converter_sls_metric.go:93-99`);
    *  - labels come from the `k#$#v|…` string, sorted by key
    *    (readSortedLabels);
    *  - the value renders per `__type__`: int → `42i`, bool →
    *    true/false, string → quoted, default float shortest
    *    (readValue + lineprotocol.NewValue); a value the type cannot
    *    parse DROPS the row (the reference fails the whole batch — a
    *    batch table drops the point, the decoders' twin posture);
    *  - `__time_nano__` null/0 → no timestamp part (readTimestamp on
    *    an absent key returns the zero time, which EndLine omits).
    * Escaping is the exact inverse of [[WireFormats.InfluxLineParser]]:
    * `\,` `\ ` `\=` `\\` on identifiers (measurement keeps bare `=`,
    * as the Go encoder does), `\"` `\\` inside quoted strings — so
    * encode → decode is an identity on the row set. */
  final case class InfluxLineWriter(
      nameKey: String = "__name__",
      labelsKey: String = "__labels__",
      valueKey: String = "__value__",
      timeKey: String = "__time_nano__",
      typeKey: String = "__type__",
      fieldKey: String = "__field__",
      destKey: String = "line") {

    // identifier escapes (inverse of InfluxLineParser.unescapeIdent)
    private def escMeas(c: Column): Column =
      regexp_replace(c, "([,\\\\ ])", "\\\\$1")
    private def escIdent(c: Column): Column =
      regexp_replace(c, "([,=\\\\ ])", "\\\\$1")
    private def escStr(c: Column): Column =
      regexp_replace(c, "([\"\\\\])", "\\\\$1")

    def apply(df: DataFrame): DataFrame = {
      val name = col(nameKey).cast("string")
      val value = col(valueKey).cast("string")
      val vtype = coalesce(optCol(df, typeKey, "string"), lit("float"))
      val fieldRaw = coalesce(optCol(df, fieldKey, "string"), lit(""))
      val fieldName =
        when(fieldRaw === "" || fieldRaw === "value", "value")
          .otherwise(fieldRaw)
      // strings.TrimSuffix(name, ":"+field) — only when it matches
      val meas = when(fieldName === "value", name).otherwise(
        when(name.endsWith(concat(lit(":"), fieldName)),
          name.substr(lit(1), length(name) - length(fieldName) - 1))
          .otherwise(name))
      val labels = coalesce(optCol(df, labelsKey, "string"), lit(""))
      val folded = labelEntries(labels)
      // sort by RAW key (the reference sorts MetricLabels pre-escape)
      val tagPart = Cols.let(folded)(ls =>
        when(size(ls) === 0, lit("")).otherwise(
          concat(lit(","), array_join(transform(array_sort(ls),
            kv => concat(escIdent(kv.getField("k")), lit("="),
              escIdent(kv.getField("v")))), ","))))
      val boolVal = when(lower(value).isin("1", "t", "true"), "true")
        .when(lower(value).isin("0", "f", "false"), "false")
      // NaN/±Inf parse as doubles but lineprotocol.NewValue REJECTS
      // them (the reference errors the batch; the documented batch
      // posture here is drop-the-point) — null them so the rendered
      // line nulls out and the drop filter below removes the row
      val dv = value.try_cast("double")
      val finite = when(isnan(dv) ||
        abs(dv) === lit(Double.PositiveInfinity),
        lit(null).cast("double")).otherwise(dv)
      val rendered =
        when(vtype === "int",
          concat(value.try_cast("long").cast("string"), lit("i")))
          .when(vtype.isin("bool", "boolean"), boolVal)
          .when(vtype === "string",
            concat(lit("\""), escStr(value), lit("\"")))
          .otherwise(goFloat(finite))
      val tn = optCol(df, timeKey, "long").try_cast("long")
      val tsPart = when(tn.isNull || tn === 0L, lit(""))
        .otherwise(concat(lit(" "), tn.cast("string")))
      // withColumn REPLACES an existing destKey column; a rename from a
      // temp name would instead leave two same-named columns behind
      df.withColumn(destKey, concat(
          escMeas(meas), tagPart, lit(" "),
          escIdent(fieldName), lit("="), rendered, tsPart))
        .filter(col(destKey).isNotNull) // unparseable value → drop
    }
  }
}
