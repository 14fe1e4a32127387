package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** One shared local session for every suite (forked test JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(4)
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Rows of one string column named `text` (parser fixtures). */
  def textDf(lines: String*): DataFrame = {
    val s = spark
    import s.implicits._
    lines.toDF("text")
  }

  def collectMaps(df: DataFrame): Seq[Map[String, Any]] = {
    val cols = df.columns
    df.collect().toSeq.map(r => cols.zipWithIndex.map { case (c, i) =>
      c -> r.get(i)
    }.toMap)
  }
}
