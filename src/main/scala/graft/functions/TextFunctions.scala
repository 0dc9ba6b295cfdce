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

  /** Split a document into overlapping token-window chunks — the
    * context-window preprocessing step for training corpora (size `w`
    * tokens, stride `s`, so consecutive chunks overlap by `w - s`).
    * Pure builtin Column arithmetic (split/sequence/slice/concat_ws,
    * all codegen'd): a generator expansion, narrow, output inherits
    * input partitioning. Chunk i covers tokens [i·s+1, i·s+w]; the
    * chunk count is 1 + ceil(max(n-w, 0)/s), so a short document is
    * exactly one chunk and the final chunk may be partial.
    *
    * Input must have (idCol, textCol). Output:
    * (id, chunk_idx, chunk_text, n_chunk_tokens).
    */
  def chunkByTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, w: Int, s: Int): org.apache.spark.sql.DataFrame = {
    require(w > 0 && s > 0 && s <= w, s"need 0 < stride <= window: w=$w s=$s")
    df.select(col(idCol).as("id"),
        split(trim(col(textCol)), "\\s+").as("toks"))
      .withColumn("n", size(col("toks")))
      // integer ceil-div via (x + s - 1) div s — `div` is integer in
      // Spark SQL and `//` is its ANSI-engine floor-div counterpart
      .withColumn("last_idx",
        expr(s"(greatest(n - $w, 0) + ${s - 1}) div $s"))
      .select(col("id"), col("toks"), col("n"),
        explode(sequence(lit(0), col("last_idx"))).as("chunk_idx"))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ",
          slice(col("toks"), col("chunk_idx") * s + 1, lit(w)))
          .as("chunk_text"),
        least(lit(w), col("n") - col("chunk_idx") * s)
          .cast("long").as("n_chunk_tokens"))
  }
}
