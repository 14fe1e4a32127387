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

  /** Quality-scoring feature vector: the standard cheap heuristics a
    * corpus filter computes (length, word stats, punctuation/alpha
    * ratios, type-token ratio). */
  def qualityFeatures(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val w = DedupOps.words(t)
    val chars = length(t).cast("double")
    df.select(
      col(idCol),
      length(t).cast("int").as("n_chars"),
      size(w).cast("int").as("n_words"),
      round(chars / size(w), 4).as("mean_word_len"),
      round(size(array_distinct(w)).cast("double") / size(w), 4)
        .as("type_token_ratio"),
      round((chars - length(regexp_replace(t, "[^a-zA-Z0-9\\s]", "")))
        / chars, 4).as("punct_ratio"),
      round(length(regexp_replace(t, "[^a-zA-Z]", "")) / chars, 4)
        .as("alpha_ratio"))
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
  def langId(textCol: Column): Column = {
    val w = DedupOps.words(textCol)
    val scores = langMarkers.map { case (lang, marks) =>
      lang -> size(filter(w, x => x.isin(marks.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in declared order) achieving the max; unk if max==0
    scores.foldLeft(when(best <= 0, "unk"): Column) {
      case (acc, (lang, s)) => acc.when(s === best, lang)
    }.otherwise("unk")
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

    def sketch(textCol: Column): Column = {
      val norm = regexp_replace(lower(textCol), "\\s+", " ")
      val grams = transform(
        sequence(lit(1), greatest(length(norm) - (gram - 1), lit(1))),
        i => norm.substr(i, lit(gram)))
      slice(array_sort(array_distinct(transform(grams, g => h(g)))),
        1, sketchSize)
    }

    def apply(df: DataFrame, idCol: String = "doc_id",
        textCol: String = "text"): DataFrame =
      df.select(col(idCol), sketch(col(textCol)).as("fp"))
  }
}
