package graft.run

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.DedupOps
import graft.sink.{FanOutWriter, TableIO}

/** End-to-end training-data curation: the LLM-data operators composed
  * the way a real pre-training ingest run uses them —
  *
  *   [paragraph boilerplate removal] → quality/repetition gate →
  *   [benchmark decontamination] → exact dedup → MinHash-LSH near-dup
  *   candidates → duplicate-cluster resolution → survivor write through
  *   the resumable fan-out writer (bracketed stages optional via
  *   [[Config.paragraphDedup]] / [[Config.decontaminate]] + `bench`).
  *
  * Scale shape, stage by stage: the gate is a pure per-row projection
  * (every signal is a higher-order-function fold over the word array —
  * no explode, no shuffle); exact dedup is one hash aggregation on the
  * content hash; the only joins near-dup detection performs are the
  * bounded band-bucket self-join and the per-iteration label joins of
  * [[DedupOps.resolveDuplicatesDetailed]] (lineage-truncated); the
  * final write is the same single-pass partitioned write every other
  * pipeline uses, so a crash at any point resumes by lineage with
  * byte-identical survivors.
  */
object CurationPipeline {

  /** Tuned so each gate bites on the synthetic corpus; at production
    * scale these come from corpus calibration, not from this file.
    *
    * The two optional stages compose the full Dolma-shaped order when
    * enabled: paragraph-level boilerplate removal FIRST (so the quality
    * gate judges the cleaned text, not shared footers), benchmark
    * decontamination after the gate (cheapest corpus left when the
    * broadcast overlap join runs). Both ops must be configured with the
    * same id/text columns the pipeline uses. */
  final case class Config(
      minWords: Int = 10,
      minDistinctRatio: Double = 0.3,
      maxTopBigramFrac: Double = 0.12,
      minhash: DedupOps.MinHashLSH = DedupOps.MinHashLSH(
        numHashes = 16, bands = 4, shingleSize = 3, threshold = 0.5),
      maxIter: Int = 20,
      paragraphDedup: Option[DedupOps.ParagraphDedup] = None,
      decontaminate: Option[DedupOps.Decontaminate] = None)

  /** Largest repeat-count of any word bigram, as a per-row fold:
    * sort the bigram array, then count the longest equal run. The same
    * statistic as `TextOps.repetitionStats`' top_bigram count, but
    * computed WITHOUT explode+groupBy+join-back — at 10^12 docs the
    * difference between a projection and three shuffles. */
  private def maxBigramRun(w: Column): Column = {
    val bgs = when(size(w) >= 2,
      array_sort(transform(sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", slice(w, i, lit(2))))))
      .otherwise(array().cast("array<string>"))
    graft.functions.Cols.let(bgs) { sorted =>
      aggregate(sorted,
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (st, x) => {
          val run = when(x === st.getField("prev"), st.getField("run") + 1L)
            .otherwise(lit(1L))
          graft.functions.Cols.let(run)(r =>
            struct(x.as("prev"), r.as("run"),
              greatest(st.getField("best"), r).as("best")))
        },
        st => st.getField("best"))
    }
  }

  /** Quality/repetition gate — one codegen'd filter projection. */
  def qualityGate(docs: DataFrame, cfg: Config = Config(),
      textCol: String = "text"): DataFrame =
    docs.filter(graft.functions.Cols.let(DedupOps.words(col(textCol))) { w =>
      val nw = size(w)
      nw >= cfg.minWords &&
        size(array_distinct(w)).cast("double") / nw >= cfg.minDistinctRatio &&
        maxBigramRun(w).cast("double") / (nw - 1) <= cfg.maxTopBigramFrac
    })

  /** The curated survivor set plus the cluster-resolution convergence
    * flag. A document survives iff it passes the gate, is the smallest
    * id of its exact-duplicate group, and is the smallest id of its
    * near-duplicate component (docs in no component survive trivially).
    */
  def survivors(docs: DataFrame, cfg: Config = Config(),
      idCol: String = "doc_id", textCol: String = "text",
      bench: Option[DataFrame] = None): (DataFrame, Boolean) = {
    // optional stage 0: corpus-wide paragraph boilerplate removal
    // (the op preserves every non-text column and the textCol name)
    val cleaned = cfg.paragraphDedup.fold(docs)(pd =>
      pd(docs).drop("n_kept", "n_dropped"))
    val gated0 = qualityGate(cleaned, cfg, textCol)
    // optional stage 1.5: eval-set decontamination (broadcast overlap)
    val gated = (cfg.decontaminate, bench) match {
      case (Some(dc), Some(b)) => dc.survivors(gated0, b)
      case _ => gated0
    }
    val keepIds = gated
      .groupBy(md5(col(textCol).cast("binary")).as("__md5__"))
      .agg(min(col(idCol)).as(idCol)).select(idCol)
    val ex = gated.join(keepIds, Seq(idCol), "left_semi")
    val pairs = cfg.minhash.pairs(ex, idCol, textCol)
    val (resolved, converged) =
      DedupOps.resolveDuplicatesDetailed(pairs, maxIter = cfg.maxIter)
    val losers = resolved.filter(!col("keep")).select(col("id").as(idCol))
    (ex.join(losers, Seq(idCol), "left_anti"), converged)
  }

  final case class RunResult(runId: String, bucketsWritten: Int,
      survivorCount: Long, converged: Boolean)

  /** Full curation run with resumable lineage: survivors land in the
    * `curated` sink of `documents_curated`, partitioned by content
    * bucket; re-running the same runId after a crash completes only the
    * missing buckets with identical rows (survivor determinism is why
    * the resume contract holds — every stage is a deterministic
    * function of the input corpus).
    *
    * `maxBuckets` truncates the write for crash-simulation tests.
    */
  def run(docs: DataFrame, io: TableIO, runId: String,
      cfg: Config = Config(), numBuckets: Int = 16,
      maxBuckets: Int = Int.MaxValue,
      bench: Option[DataFrame] = None): RunResult = {
    val (surv, converged) = survivors(docs, cfg, bench = bench)
    // the survivor plan is consumed twice (write + lineage read-back
    // guard); persisting it would also work, but the plan is cheap to
    // re-derive relative to caching the full text at scale
    val routed = surv.withColumn("__sink__", lit("curated"))
    val writer = FanOutWriter(io, table = "documents_curated",
      numBuckets = numBuckets, bucketKeys = Seq("doc_id"),
      sinks = Seq("curated"))
    val written = writer.write(routed, runId, maxBuckets)
    val count =
      if (maxBuckets == Int.MaxValue) io.read(docs.sparkSession,
        "documents_curated").count()
      else -1L
    RunResult(runId, written, count, converged)
  }
}

/** spark-submit / sbt entry point:
  * {{{ runMain graft.run.Curate <docsParquetDirOrFile> <sinkRoot> <runId> }}}
  */
object Curate {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: Curate <documentsParquet> <sinkRoot> <runId> [numBuckets]")
    val spark = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString).toInt)
      .appName(s"graft-curate-${args(2)}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(args(0))
    val res = CurationPipeline.run(docs, TableIO(args(1)), args(2),
      numBuckets = args.lift(3).map(_.toInt).getOrElse(16))
    println(s"""{"runId":"${res.runId}","bucketsWritten":${res.bucketsWritten},""" +
      s""""survivors":${res.survivorCount},"converged":${res.converged}}""")
    spark.stop()
  }
}
