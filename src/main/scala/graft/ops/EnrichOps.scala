package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lookup enrichments (SURVEY.md §2.4/§2.7) — the reference's only
  * join-like operators, realized as broadcast joins so the big side
  * never shuffles (critical at 10^12 rows: the dict is tiny, the fact
  * table streams through map-side).
  */
object EnrichOps {

  /** Dictionary lookup enrichment — the north-star broadcast join.
    *
    * Reference: `plugins/processor/dictmap/processor_dict_map.go:30-41,
    * 58-74,127-132` — `MapDict` (dup keys rejected), `SourceKey` →
    * `DestKey`, `HandleMissing` + `Missing` default, `Mode` ∈
    * fill/overwrite (`:66-67`).
    *
    * `fill` keeps a pre-existing dest value and only fills gaps;
    * `overwrite` always takes the dict value when the key is found.
    */
  final case class DictMap(
      dict: Map[String, String],
      sourceKey: String,
      destKey: String,
      handleMissing: Boolean = false,
      missing: String = "Unknown",
      mode: String = "overwrite") {
    require(dict.nonEmpty, "empty dict")

    def apply(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val dictDf = dict.toSeq.toDF("__dict_key__", "__dict_val__")
      val joined = df.join(broadcast(dictDf),
        col(sourceKey) === col("__dict_key__"), "left")
      val mapped =
        if (handleMissing) coalesce(col("__dict_val__"), lit(missing))
        else col("__dict_val__")
      val existing: Option[Column] =
        if (df.columns.contains(destKey)) Some(col(destKey)) else None
      val out = (mode, existing) match {
        case ("fill", Some(prev)) => coalesce(prev, mapped)
        case ("overwrite", Some(prev)) => coalesce(mapped, prev)
        case _ => mapped
      }
      joined.withColumn(destKey, out).drop("__dict_key__", "__dict_val__")
    }
  }

  object DictMap {
    /** CSV dictionary tier (`DictFilePath`), mirroring the reference
      * loader `plugins/processor/dictmap/processor_dict_map.go:95-135`:
      * comma-separated CSV (quoting per Go `encoding/csv`), every row
      * exactly 2 fields, a duplicate key with a CONFLICTING value is a
      * config error ("hash crash"), a same-value duplicate is fine, and
      * rows past `maxDictSize` entries are silently ignored. The file is
      * config material read once on the driver; the resulting Map flows
      * into the usual broadcast join.
      */
    def loadCsv(path: String, maxDictSize: Int = 1000): Map[String, String] = {
      import com.univocity.parsers.csv.{CsvParser, CsvParserSettings}
      val settings = new CsvParserSettings
      settings.getFormat.setDelimiter(',')
      settings.setEmptyValue("")
      settings.setNullValue("")
      settings.setMaxColumns(16) // a valid dict row has 2; fail fast
      val reader = new java.io.InputStreamReader(
        new java.io.FileInputStream(path), java.nio.charset.StandardCharsets.UTF_8)
      val rows =
        try new CsvParser(settings).parseAll(reader)
        finally reader.close()
      require(!rows.isEmpty, s"empty dict file: $path")
      val dict = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val it = rows.iterator()
      var i = 0
      while (it.hasNext && dict.size < maxDictSize) {
        val row = it.next(); i += 1
        require(row.length == 2,
          s"illegal dict row $i in $path: length ${row.length}, want 2")
        dict.get(row(0)) match {
          case Some(prev) if prev != row(1) =>
            throw new IllegalArgumentException(
              s"hash crash in $path row $i: key '${row(0)}' redefined " +
                s"('$prev' vs '${row(1)}')")
          case _ => dict(row(0)) = row(1)
        }
      }
      dict.toMap
    }
  }

  /** Range-lookup enrichment (the geoip shape): broadcast theta join
    * `lo <= key AND key < hi` against a small range table.
    * Reference: `plugins/processor/geoip/processor_geoip.go` — MaxMind
    * ranges; we model the general broadcast range join.
    *
    * `ranges` columns: (lo: Long, hi: Long, attrs…). At scale the range
    * side stays broadcast (it is a dimension); the fact side never
    * shuffles.
    */
  final case class RangeLookup(
      ranges: DataFrame,
      keyCol: String,
      loCol: String = "lo",
      hiCol: String = "hi") {
    def apply(df: DataFrame): DataFrame = {
      // the bounds are join machinery, not enrichment output — but
      // df.drop(loCol) would drop EVERY column with that name, eating an
      // input column that happens to be called lo/hi; rename the ranges
      // side to reserved temp names and drop only those
      val r = ranges.withColumnRenamed(loCol, "__range_lo__")
        .withColumnRenamed(hiCol, "__range_hi__")
      df.join(broadcast(r),
        col(keyCol) >= col("__range_lo__") &&
          col(keyCol) < col("__range_hi__"), "left")
        .drop("__range_lo__", "__range_hi__")
    }
  }

  /** Static metadata stamping (cloud meta / tag native):
    * constant columns from job config.
    * Reference: `plugins/processor/cloudmeta/cloud_meta.go`,
    * `core/plugin/processor/inner/ProcessorTagNative.cpp:43-74`. */
  final case class StaticTags(tags: Map[String, String]) {
    def apply(df: DataFrame): DataFrame =
      tags.foldLeft(df) { case (d, (k, v)) => d.withColumn(k, lit(v)) }
  }
}
