package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ops.AggOps

/** File ingestion parity: glob discovery, per-file source tags, ordered
  * lines feeding multiline assembly (input_file analog). */
class LogFilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeFiles(files: (String, String)*): String = {
    val dir = Files.createTempDirectory("graft-logs")
    files.foreach { case (name, content) =>
      Files.writeString(dir.resolve(name), content)
    }
    dir.toString
  }

  test("lines: glob-discovered files, every line tagged with its path") {
    val dir = writeFiles(
      "a.log" -> "l1\nl2\n",
      "b.log" -> "m1\n",
      "skip.txt" -> "nope\n")
    val df = LogFiles.lines(spark, s"$dir/*.log")
    assert(df.count() == 3)
    val byFile = df.groupBy(col("__source__")).count().collect()
      .map(r => Paths.get(new java.net.URI(r.getString(0)).getPath)
        .getFileName.toString -> r.getLong(1)).toMap
    assert(byFile == Map("a.log" -> 2L, "b.log" -> 1L))
  }

  test("wholeFileLines: exact per-file line order, trailing newline discarded") {
    val dir = writeFiles("x.log" -> "first\nsecond\nthird\n")
    val out = LogFiles.wholeFileLines(spark, s"$dir/*.log")
      .orderBy("line_no").collect()
      .map(r => r.getInt(1) -> r.getString(2))
    assert(out.toSeq == Seq(0 -> "first", 1 -> "second", 2 -> "third"))
  }

  test("file source + multiline splitter: stack blocks re-segment per file") {
    val dir = writeFiles(
      "app1.log" -> "boot ok\njava.lang.Error: x\n\tat A.a(A.java:1)\n\tat B.b(B.java:2)\n",
      "app2.log" -> "java.lang.Error: y\n\tat C.c(C.java:3)\n")
    val linesDf = LogFiles.wholeFileLines(spark, s"$dir/*.log")
    val merged = AggOps.MultilineMerge(
      startPattern = Some("^java\\.lang"),
      convCol = "__source__", orderCol = "line_no")(linesDf)
    val texts = merged.collect().map(_.getAs[String]("merged_text")).toSet
    assert(texts.contains("java.lang.Error: x\n\tat A.a(A.java:1)\n\tat B.b(B.java:2)"))
    assert(texts.contains("java.lang.Error: y\n\tat C.c(C.java:3)"))
    assert(texts.contains("boot ok")) // unmatched prefix stays single-line
  }
}
