package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting, and
  * shingling for the dedup family. All pure `Column` expressions
  * (codegen'd, shuffle-free, scale linearly with the scan) — the
  * per-document math never leaves the executor.
  */
object TextFunctions {

  /** Whitespace tokens; empty/blank text → empty array (not [""]). */
  def tokens(c: Column): Column =
    when(trim(c) === "" || c.isNull, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: word-pieces + digits + punctuation as
    * separate tokens (a cheap deterministic proxy for a real tokenizer's
    * token count — the regex splits off punctuation and digit runs).
    */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(c, lit("""[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"""), lit(0)))

  /** Characters of punctuation. */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, """[\.,;:!\?'"\(\)\[\]\{\}-]""", ""))

  /** Ratio of alphabetic chars to all chars (0 for empty). */
  def alphaRatio(c: Column): Column = {
    val total = length(c)
    val alpha = length(regexp_replace(c, "[^A-Za-z]", ""))
    when(total === 0 || total.isNull, lit(0.0))
      .otherwise(alpha.cast("double") / total.cast("double"))
  }

  /** Mean word length (0 for empty). */
  def meanWordLen(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(toks).cast("double"))
  }

  /** Per-language stopword inventories for the n-gram/stopword language-ID
    * heuristic. Deliberately small + public-knowledge word lists.
    */
  val StopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "une"),
    "es" -> Seq("el", "los", "las", "es", "en", "por", "para", "una"))

  /** Count of stopword hits for one language. Native single-pass kernel
    * (equivalent to size(regexp_extract_all(lower(c), "\\b(w|..)\\b")) —
    * which materializes the match list per row just to count it).
    */
  def stopwordHits(c: Column, words: Seq[String]): Column =
    TextExprs.stopwordHits(c, words)

  /** Stopword ratio against token count (quality signal). */
  def stopwordRatio(c: Column, words: Seq[String] = StopwordsByLang.head._2): Column = {
    val n = tokenCount(c)
    when(n === 0, lit(0.0))
      .otherwise(stopwordHits(c, words).cast("double") / n.cast("double"))
  }

  /** CJK character count (script detection beats stopwords for zh/ja/ko). */
  def cjkCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[\\x{4E00}-\\x{9FFF}]"), lit(0)))

  /** Language-ID heuristic: CJK script check first, then first-listed
    * argmax of stopword hits (all-zero → "und"). Native single-pass
    * kernel ([[WordMatchOps.langId]]): the per-language
    * regexp_extract_all formulation rescanned the document once per
    * language and allocated each match list — at 100 TB this is one
    * codegen'd token scan over the text, no shuffle, no UDF.
    */
  def langId(c: Column): Column = TextExprs.langId(c, StopwordsByLang)

  /** Document fingerprint: lowercase, collapse whitespace, md5. Used by
    * exact dedup; identical function exists in DuckDB for the oracle.
    */
  def fingerprint(c: Column): Column =
    md5(lower(regexp_replace(trim(c), "\\s+", " ")).cast("binary"))

  /** Word n-gram shingles (ordered-distinct), the dedup family's unit of
    * comparison. Delegates to the native single-pass kernel
    * ([[TextExprs.wordShingles]]) — the equivalent
    * transform+slice+concat_ws formulation pays per-element lambda
    * interpretation and was the dominant cost of the dedup pipeline.
    */
  def wordShingles(c: Column, n: Int): Column = TextExprs.wordShingles(c, n)
}
