package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Text-analysis operators for training-data curation over a
  * `documents`-shaped table. All pure Catalyst projections — each is a
  * per-row expression, so the whole family fuses into the scan
  * projection with zero shuffles at any scale.
  */
object TextOps {

  /** BPE-ish tokenization: letter runs, digit runs, single punctuation —
    * the shape (not the merges) of a GPT-style pre-tokenizer. */
  val bpeTokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def bpeTokens(textCol: Column): Column =
    regexp_extract_all(textCol, lit(bpeTokenPattern), lit(0))

  /** Whitespace + BPE-ish token counts per document. */
  def tokenCounts(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(col(idCol),
      size(split(col(textCol), "\\s+")).cast("int").as("ws_tokens"),
      size(bpeTokens(col(textCol))).cast("int").as("bpe_tokens"),
      length(col(textCol)).cast("int").as("n_chars"))

  /** Corpus-level top-k word n-grams by document frequency — the
    * vocabulary/contamination-audit statistic (which boilerplate
    * phrases dominate; what to feed a BPE trainer). Distinct per doc
    * (document frequency, not raw term frequency), partially-aggregated
    * groupBy then `orderBy.limit(k)` = TakeOrderedAndProject — never a
    * row_number over an unpartitioned window (CLAUDE.md). Deterministic
    * tiebreak: count desc, gram asc. */
  def topNgrams(df: DataFrame, n: Int = 3, k: Int = 100,
      textCol: String = "text"): DataFrame =
    df.select(explode(
        DedupOps.shingles(DedupOps.words(col(textCol)), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("gram"))
      .limit(k)

  /** Quality-scoring feature vector: the standard cheap heuristics a
    * corpus filter computes (length, word stats, punctuation/alpha
    * ratios, type-token ratio). */
  def qualityFeatures(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // materialize the word array in its own projection: it feeds three
    // output columns, and CollapseProject keeps non-cheap multi-use
    // aliases in a separate (single-evaluation) stage
    df.select(col(idCol), t, DedupOps.words(t).as("__w__"))
      .select(
        col(idCol),
        length(t).cast("int").as("n_chars"),
        size(col("__w__")).cast("int").as("n_words"),
        round(length(t).cast("double") / size(col("__w__")), 4)
          .as("mean_word_len"),
        round(size(array_distinct(col("__w__"))).cast("double")
          / size(col("__w__")), 4).as("type_token_ratio"),
        // try_divide: empty text yields null ratios instead of an ANSI
        // divide-by-zero failure (parsers must be total)
        round(try_divide(length(t).cast("double")
          - length(regexp_replace(t, "[^a-zA-Z0-9\\s]", "")),
          length(t).cast("double")), 4).as("punct_ratio"),
        round(try_divide(length(regexp_replace(t, "[^a-zA-Z]", "")),
          length(t).cast("double")), 4).as("alpha_ratio"))
  }

  /** Tiny per-language marker-word lists for the n-gram/stopword
    * language-ID heuristic. Deterministic argmax with fixed tie-break
    * order (en > es > de > zh > unk). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Language-ID: argmax of marker-word hit counts over the word array;
    * `unk` when no marker hits at all. */
  def langId(textCol: Column): Column =
    // let-bind the word array AND the score vector: the when-chain
    // references each score several times (and `best` references all
    // of them), which would re-run the split per reference
    graft.functions.Cols.let(DedupOps.words(textCol)) { w =>
      val scoreArr = array(langMarkers.map { case (_, marks) =>
        size(filter(w, x => x.isin(marks.map(lit): _*)))
      }: _*)
      graft.functions.Cols.let(scoreArr) { sc =>
        val scores = langMarkers.zipWithIndex.map { case ((lang, _), i) =>
          lang -> element_at(sc, i + 1)
        }
        val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
        // first language (declared order) achieving the max; unk if 0
        scores.foldLeft(when(best <= 0, "unk"): Column) {
          case (acc, (lang, s)) => acc.when(s === best, lang)
        }.otherwise("unk")
      }
    }

  /** Gopher-style repetition signals (public Rae et al. 2021 quality
    * rules): Shannon entropy (bits) of the token distribution and the
    * fraction of token bigrams taken by the single most frequent bigram
    * — boilerplate/looping text shows low entropy and a high top-bigram
    * share. Shape: one explode + two-level hash aggregation per signal
    * (map-side partials; the shuffle key is (doc, gram), never a
    * cross-doc join), so it scales like any groupBy.
    *
    * entropy = log2(N) − Σ c·log2(c) / N over token counts c.
    */
  def repetitionStats(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = df.select(col(idCol), DedupOps.words(col(textCol)).as("__w__"))
    val uni = base
      .select(col(idCol), explode(col("__w__")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        round(log2(sum(col("c")))
          - try_divide(sum(col("c") * log2(col("c"))), sum(col("c"))), 4)
          .as("token_entropy"))
    // NON-distinct bigrams (shingles() dedups — frequency matters here)
    val bigrams = base.select(col(idCol), explode(
      graft.functions.Cols.let(col("__w__")) { w =>
        when(size(w) >= 2,
          transform(sequence(lit(1), size(w) - 1),
            i => concat_ws(" ", slice(w, i, lit(2)))))
          .otherwise(array().cast("array<string>"))
      }).as("bg"))
    val top = bigrams
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        round(try_divide(max(col("c")), sum(col("c"))), 4)
          .as("top_bigram_frac"))
    uni.join(top, Seq(idCol), "left")
  }

  /** Bottom-k document fingerprint over character `k`-gram hashes — a
    * winnowing-style sketch: order-invariant under small edits, cheap to
    * compare via set overlap. Returns an array<long> of `sketchSize`
    * smallest 32-bit gram hashes (portable md5 tier).
    */
  final case class BottomKFingerprint(gram: Int = 8, sketchSize: Int = 8,
      portable: Boolean = true) {
    private def h(s: Column): Column =
      if (portable) PortableHash.md32(s) else PortableHash.fast32(s, 0)

    def sketch(textCol: Column): Column =
      // let-bind the normalization: referenced per gram otherwise, the
      // regexp_replace would run once per character position. One
      // fused position→hash pass (no intermediate gram array) — HOF
      // lambdas evaluate interpreted, so every avoided pass counts.
      graft.functions.Cols.let(
        regexp_replace(lower(textCol), "\\s+", " ")) { norm =>
        slice(array_sort(array_distinct(transform(
          sequence(lit(1), greatest(length(norm) - (gram - 1), lit(1))),
          i => h(norm.substr(i, lit(gram)))))), 1, sketchSize)
      }

    def apply(df: DataFrame, idCol: String = "doc_id",
        textCol: String = "text"): DataFrame =
      df.select(col(idCol), sketch(col(textCol)).as("fp"))
  }
}
