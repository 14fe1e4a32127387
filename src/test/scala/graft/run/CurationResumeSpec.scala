package graft.run

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.sink.TableIO

/** End-to-end curation: gate → exact dedup → near-dup resolution →
  * resumable survivor write. Fixture corpus has one planted instance of
  * every elimination path, so the survivor set pins each stage. */
class CurationResumeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** 20 distinct-word base docs + planted exact dups, near dups (a
    * 3-chain), a low-distinct-ratio doc, a repeated-bigram doc, and a
    * too-short doc. */
  private def corpus = {
    val s = spark
    import s.implicits._
    val base = (1 to 20).map { i =>
      (i.toLong, s"unique document number $i talks about topic$i " +
        s"with plenty of distinct words alpha$i beta$i gamma$i delta$i")
    }
    val exactDup = Seq(
      (21L, "identical content duplicated verbatim across many mirror sites of the corpus"),
      (22L, "identical content duplicated verbatim across many mirror sites of the corpus"))
    val near = "the quick brown fox jumps over the lazy dog while seven wizards brew potions quietly"
    val nearDup = Seq(
      (31L, near),
      (32L, near.replace("quietly", "loudly")),
      (33L, near + " indeed")) // one appended word: high-jaccard variant
    val lowQuality = Seq(
      (41L, Seq.fill(30)("spam").mkString(" ")), // distinct ratio 1/30
      (42L, Seq.fill(15)("lorem ipsum").mkString(" ")), // one bigram dominates
      (43L, "too short")) // under minWords
    (base ++ exactDup ++ nearDup ++ lowQuality).toDF("doc_id", "text")
  }

  test("survivor set eliminates exactly the planted losers") {
    val (surv, converged) = CurationPipeline.survivors(corpus)
    assert(converged)
    val ids = surv.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ((1 to 20).map(_.toLong).toSet + 21L + 31L))
    // 22 exact-dup loser; 32/33 near-dup losers; 41/42/43 gated
  }

  test("near-dup chain resolves to ONE component (transitivity, not just pairs)") {
    val pairs = CurationPipeline.Config().minhash
      .pairs(CurationPipeline.qualityGate(corpus))
    val ab = pairs.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 31-32 and 31-33 (and likely 32-33) are candidates; survivors keep
    // only the component minimum even if some direct pair is missing
    assert(ab.contains((31L, 32L)) && ab.contains((31L, 33L)))
  }

  test("kill mid-write, rerun same runId: identical survivors, no dup rows") {
    val dirA = Files.createTempDirectory("graft-cur").toString
    val dirB = Files.createTempDirectory("graft-cur").toString
    val clean = CurationPipeline.run(corpus, TableIO(dirA), "cur-clean",
      numBuckets = 8)
    assert(clean.bucketsWritten == 8 && clean.converged)
    // crash after 3 of 8 buckets
    val crash = CurationPipeline.run(corpus, TableIO(dirB), "cur-crash",
      numBuckets = 8, maxBuckets = 3)
    assert(crash.bucketsWritten == 3)
    val resume = CurationPipeline.run(corpus, TableIO(dirB), "cur-crash",
      numBuckets = 8)
    assert(resume.bucketsWritten == 5) // only the missing buckets
    def fingerprint(dir: String) = {
      val back = spark.read.parquet(s"$dir/documents_curated")
      val cols = back.columns.sorted.map(c => col(c).cast("string"))
      val r = back.select(xxhash64(cols: _*).as("h"))
        .agg(count(lit(1)), bit_xor(col("h"))).collect().head
      (r.getLong(0), r.getLong(1))
    }
    assert(fingerprint(dirA) == fingerprint(dirB))
    // survivor identity matches the direct computation
    val direct = CurationPipeline.survivors(corpus)._1
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val back = spark.read.parquet(s"$dirB/documents_curated")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(back == direct)
    // re-running a completed run is a no-op
    assert(CurationPipeline.run(corpus, TableIO(dirB), "cur-crash",
      numBuckets = 8).bucketsWritten == 0)
  }
}
