package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-shaped table layer over parquet directories.
  *
  * No Iceberg runtime jar exists in this sandbox (verified against
  * /opt/spark/jars), so this layer supplies the Iceberg semantics the
  * pipeline actually relies on — partitioned appends, idempotent
  * overwrite-by-partition (the Iceberg `overwritePartitions` /
  * `replaceWhere` contract), snapshot-ish metadata via the lineage table
  * ([[Lineage]]) — behind one small surface, so a real Iceberg catalog
  * (`df.writeTo(t).overwritePartitions()`) drops in without touching
  * operator code.
  *
  * Batching parity with the reference sink
  * (`core/plugin/flusher/sls/FlusherSLS.cpp:46-59`: ≤4000 logs per
  * LogGroup): `maxRecordsPerFile` bounds rows per written file; parquet
  * zstd replaces the reference's LZ4 group compression
  * (`core/common/compression/`).
  */
final case class TableIO(root: String,
    maxRecordsPerFile: Long = 4000,
    compression: String = "zstd") {

  def path(table: String): String = s"$root/$table"

  private def writer(df: DataFrame) =
    df.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", compression)

  /** Plain append (new files, new data). */
  def append(df: DataFrame, table: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = writer(df).mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path(table))
  }

  /** Idempotent overwrite of exactly the partitions present in `df`
    * (dynamic partition overwrite — Iceberg's `overwritePartitions`).
    * Re-writing the same logical partition replaces, never duplicates:
    * this is what makes checkpoint resume exactly-once at the partition
    * granularity. */
  def overwritePartitions(df: DataFrame, table: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "overwritePartitions needs partition columns")
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // shuffle on the partition columns first: without it every writer
    // task emits one file into every partition dir it touches —
    // tasks × dirs tiny files (the banded-LSH index measured 60k files
    // for 2k vectors, 80 s build, 7 s reads; 1 file/dir reads in <1 s).
    // One AQE-coalesced shuffle per index build is the right trade at
    // any scale: readers pay file-open and listing cost forever.
    try
      writer(df.repartition(partitionCols.map(df.col): _*))
        .mode("overwrite").partitionBy(partitionCols: _*)
        .parquet(path(table))
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Full overwrite (small control tables only). */
  def overwrite(df: DataFrame, table: String): Unit =
    writer(df).mode("overwrite").parquet(path(table))

  /** Delete specific partition directories (bounded, driver-side — the
    * declared partition space is ≤ sinks × buckets). Dynamic partition
    * overwrite only replaces partitions PRESENT in the written data;
    * a run that owns a declared partition space must clear the
    * attempted-but-now-empty ones too, or stale rows from an earlier
    * run survive in them. `subdirs` appends deeper partition levels
    * (e.g. streaming's `__batch__=<id>`). Paths go through the Hadoop
    * FileSystem API (scheme-aware, no listFiles NPE) with Spark's own
    * Hive partition-value escaping, so the directory names match what
    * the writer produced even for special characters. */
  def deletePartitions(spark: SparkSession, table: String,
      pairs: Seq[(String, Int)],
      sinkCol: String = "__sink__", bucketCol: String = "__bucket__",
      subdirs: Seq[(String, String)] = Nil): Unit = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    val conf = spark.sparkContext.hadoopConfiguration
    pairs.foreach { case (s, b) =>
      val parts = Seq(s"$sinkCol=${escapePathName(s)}", s"$bucketCol=$b") ++
        subdirs.map { case (c, v) => s"$c=${escapePathName(v)}" }
      val target = new org.apache.hadoop.fs.Path(
        (path(table) +: parts).mkString("/"))
      val fs = target.getFileSystem(conf)
      if (fs.exists(target)) fs.delete(target, true): Unit
    }
  }

  /** Bucketed write (Hive-style layout via `saveAsTable`): rows are
    * hash-partitioned into `numBuckets` files per partition by
    * `bucketCols`, and the bucketing metadata lets Catalyst plan
    * co-located joins/aggregations on the bucket keys with NO exchange —
    * the at-rest analog of the reference's shard-hash routing
    * (`aggregator_shardhash.go:65-105`): at 100 TB, repeated joins on
    * conv_id against bucketed tables skip the dominant shuffle entirely.
    * Requires a session with a warehouse dir (any SparkSession default).
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = writer(df).mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .option("path", path(table))
      .format("parquet")
      .saveAsTable(tableName(table))
  }

  /** Read a bucketed table (bucket metadata preserved). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(tableName(table))

  private def tableName(table: String): String =
    "graft_" + table.replaceAll("[^A-Za-z0-9_]", "_") + "_" +
      Integer.toHexString(root.hashCode).replace("-", "m")

  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))

  def exists(spark: SparkSession, table: String): Boolean =
    new java.io.File(path(table)).exists()
}
