package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExprs

/** Corpus-quality operators for training-data curation, beyond the
  * per-document ratio signals in [[graft.functions.TextFunctions]]:
  *
  *  - repetition: Gopher/MassiveText-style repetition rules (Rae et al.
  *    2021 §A1.1, public) — top unigram/bigram/trigram multiplicity per
  *    document from ONE native-kernel scan (no per-n-gram explode, no
  *    shuffle).
  *  - PII/URL redaction: codegen'd regexp_replace chain + pre-redaction
  *    match counts. Patterns are deliberately RE2-compatible (no
  *    backrefs/lookarounds), the common-denominator regex dialect of
  *    distributed engines.
  *  - corpus frequency scores: the two-pass "how ordinary are this
  *    document's tokens" signal — pass 1 aggregates the corpus unigram
  *    vocabulary (output is vocabulary-sized, NOT corpus-sized), pass 2
  *    broadcast-joins frequencies back to tokens and aggregates per
  *    document. At 100 TB the vocabulary table is MBs — the join is a
  *    broadcast, the only big shuffle is the per-document aggregate,
  *    which map-side-combines on doc_id (explode preserves document
  *    locality, so partial aggregation collapses most of it pre-shuffle).
  */
object TextQuality {

  /** Per-doc repetition stats: (id, n_tokens, distinct_tokens,
    * top_token_count, top_bigram_count, top_trigram_count,
    * top_trigram_frac). All counts from one kernel pass.
    */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextExprs.repetitionStats(col(textCol)).as("r"))
      .select(col(idCol),
        col("r.n_tokens").cast("long").as("n_tokens"),
        col("r.distinct_tokens").cast("long").as("distinct_tokens"),
        col("r.top_token_count").cast("long").as("top_token_count"),
        col("r.top_bigram_count").cast("long").as("top_bigram_count"),
        col("r.top_trigram_count").cast("long").as("top_trigram_count"),
        // fraction of tokens covered by repeats of the top trigram;
        // integer-multiply THEN cast-double, the exact parenthesization
        // the oracle mirrors (a bare 3.0 literal is DECIMAL in DuckDB)
        ((col("r.top_trigram_count") * lit(3)).cast("double") /
          col("r.n_tokens")).as("top_trigram_frac"))

  /** RE2-compatible patterns — identical semantics under Java regex and
    * RE2-family engines (no backreferences, no lookaround).
    */
  val UrlPattern = "https?://[A-Za-z0-9./?=&_%+#:~-]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9() -]{6,}[0-9]"

  /** Redact URLs → [URL], emails → [EMAIL], phone-like runs → [PHONE]
    * (in that order: URLs first so their digits can't half-match the
    * phone pattern). All three are builtin regexp_replace — fully
    * codegen'd, no custom kernel needed.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlPattern, "[URL]"),
        EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")

  /** (id, redacted, n_urls, n_emails, n_phones) — counts are measured on
    * the ORIGINAL text (pre-redaction), so they report what was found.
    */
  def scrub(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      redactPii(col(textCol)).as("redacted"),
      regexp_count(col(textCol), lit(UrlPattern)).cast("long").as("n_urls"),
      regexp_count(col(textCol), lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(PhonePattern)).cast("long").as("n_phones"))

  /** Corpus-frequency fluency signals per document:
    * (id, n_tokens, sum_freq, hapax_tokens, min_freq, mean_token_freq).
    * A document whose tokens are all corpus-hapaxes (min_freq = 1) is
    * likely noise; very high mean_token_freq flags boilerplate. Integer
    * sums + one exact double division keep the output engine-exact
    * (no float accumulation order sensitivity).
    */
  def corpusFrequencyScores(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(trim(col(textCol)), "\\s+")).as("w"))
    val freq = toks.groupBy(col("w")).agg(count(lit(1)).as("freq"))
    toks.join(broadcast(freq), "w")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("freq")).as("sum_freq"),
        count(when(col("freq") === 1, lit(1))).as("hapax_tokens"),
        min(col("freq")).as("min_freq"))
      .select(col(idCol), col("n_tokens"), col("sum_freq"),
        col("hapax_tokens"), col("min_freq"),
        (col("sum_freq").cast("double") / col("n_tokens"))
          .as("mean_token_freq"))
  }

  /** Per-document characteristic terms: top `k` tokens by term
    * frequency, rarest-in-corpus first on ties (tf DESC, df ASC, term
    * ASC) — the integer-exact core of tf-idf ranking (the float idf
    * log is left to consumers; the ORDER is already idf's order on a
    * tf tie, so the gate stays engine-exact).
    *
    * Shape: one explode feeds both aggregates — tf partial-aggregates
    * on (doc, term); df counts distinct docs per term. The df table is
    * |vocab| rows joined back on term (hash join on the term key — at
    * corpus scale vocab is heavy-tailed, and the join key distribution
    * matches the tf table's, so no broadcast assumption). The final
    * top-k window partitions by DOCUMENT — bounded groups (a doc's
    * distinct terms), so no single-task risk at any corpus size.
    */
  def topTermsTfDf(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(trim(col(textCol)), "\\s+")).as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("rank"))
  }

  /** Corpus-level boilerplate removal: drop every non-overlapping
    * `chunkTokens`-token block whose corpus-wide occurrence count is
    * ≥ `minFreq` from every document — the block analogue of the
    * line-level "remove lines duplicated across the crawl" pass of
    * CCNet (Wenzek et al. 2019) / RefinedWeb (Penedo et al. 2023),
    * for corpora whose documents carry no line structure. Repeated
    * headers, footers, navigation chrome, and license blurbs are
    * exactly the blocks that recur verbatim across documents.
    *
    * Output: (id, clean_text, n_blocks, n_removed) — `clean_text` is
    * the surviving blocks re-joined in document order ("" when every
    * block was boilerplate), so the operator composes directly with
    * the rest of the curation pipeline.
    *
    * Shape: two-pass, like [[corpusFrequencyScores]]. Pass 1 counts
    * block occurrences with a hash AGGREGATE (map-side partial — NOT a
    * window partitioned by block, which would concentrate every copy
    * of a hot block into one task: boilerplate blocks are hot by
    * definition, so the window form is a guaranteed straggler at
    * scale); only blocks crossing `minFreq` survive, a
    * boilerplate-mass-sized table that BROADCASTS back onto the chunk
    * explode (the span-family measured-policy hint). Pass 2 reassembles
    * per document — one id-keyed shuffle whose rows carry (idx, keep,
    * block) with the block bounded at `chunkTokens` tokens — never the
    * document, never unbounded strings. When block strings dominate
    * that shuffle, use [[removeFrequentBlocksHashed]]; the string key
    * is kept here because it is engine-portable (the DuckDB oracle
    * replays it verbatim).
    *
    * Token-less documents (empty/blank text) have no blocks and produce
    * no output row — a blank document IS all boilerplate.
    *
    * ALIGNMENT ASSUMPTION: blocks are counted on the fixed i·c token
    * grid, so two copies of the same boilerplate block only match when
    * they sit at the same phase of that grid — a copy preceded by a
    * different-length prefix lands off-grid and escapes the frequency
    * count. The overlapping-window span family
    * ([[removeDuplicatedSpans]]) catches shifted copies at k-window
    * granularity, and [[removeFrequentBlocksCDC]] is the block-level
    * operator whose chunk boundaries are content-defined and therefore
    * shift-invariant — use one of those when copies aren't
    * grid-aligned (e.g. headers after variable-length titles).
    */
  def removeFrequentBlocks(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 10, minFreq: Long = 3): DataFrame = {
    Tune.ensureShufflePartitions(df, Tune.TextSpanShuffleExpansion)
    val ch = df.select(col(idCol),
        posexplode(TextExprs.wordChunks(col(textCol), chunkTokens))
          .as(Seq("idx", "blk")))
    val frequent = ch.groupBy(col("blk"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minFreq)
      .select(col("blk"), lit(true).as("freq"))
    ch.join(broadcast(frequent), Seq("blk"), "left")
      .withColumn("keep", col("freq").isNull)
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ",
          transform(
            filter(array_sort(collect_list(struct(col("idx"), col("keep"),
              col("blk")))), x => x.getField("keep")),
            x => x.getField("blk"))).as("clean_text"),
        count(lit(1)).as("n_blocks"),
        count(when(!col("keep"), lit(1))).as("n_removed"))
  }

  /** [[removeFrequentBlocks]] with the 100 TB shuffle layout: the
    * corpus-wide frequency pass shuffles `xxhash64(block)` (8 bytes)
    * instead of the block string (~6 bytes/token), and documents are
    * rebuilt locally by the [[graft.functions.TextExprs.scrubCovered]]
    * kernel from the removed CHUNK indexes (chunk i covers tokens
    * [i*c, i*c+c) — exactly a scrub window start at i*c with k = c).
    * Only documents that LOSE a block appear on the probe side of the
    * final id equi-join (a heavy-boilerplate corpus makes that side
    * corpus-sized, so it is NOT broadcast-hinted — an id-keyed shuffle
    * join is the honest worst case, never a product).
    *
    * Identical output to the string-keyed operator unless two distinct
    * blocks collide in xxhash64 (collision mass ~(distinct blocks)²/2⁶⁴
    * — at 10¹⁰ blocks that is ~0.005 expected false merges, each of
    * which only costs over-removal of one block occurrence set). The
    * string-keyed form remains the reference semantics; this is the
    * shape to run when block strings dominate the shuffle.
    */
  def removeFrequentBlocksHashed(df: DataFrame, idCol: String,
      textCol: String, chunkTokens: Int = 10, minFreq: Long = 3): DataFrame = {
    Tune.ensureShufflePartitions(df, Tune.TextSpanShuffleExpansion)
    val ch = df.select(col(idCol),
        posexplode(TextExprs.wordChunks(col(textCol), chunkTokens))
          .as(Seq("idx", "blk")))
      .select(col(idCol), col("idx"), xxhash64(col("blk")).as("h"))
    val frequent = ch.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minFreq)
      .select(col("h"))
    val removed = ch.join(broadcast(frequent), Seq("h"))
      .groupBy(col(idCol))
      .agg(collect_list((col("idx") * chunkTokens).cast("int")).as("starts"))
    df.join(removed, Seq(idCol), "left")
      .select(col(idCol),
        TextExprs.scrubCovered(col(textCol),
          coalesce(col("starts"), array().cast("array<int>")), chunkTokens)
          .as("r"),
        coalesce(size(col("starts")), lit(0)).cast("long").as("n_removed"))
      // block count from the token count: ceil(n_tokens / c)
      .select(col(idCol),
        col("r.clean_text").as("clean_text"),
        ((col("r.n_tokens") + chunkTokens - 1) / chunkTokens)
          .cast("long").as("n_blocks"),
        col("n_removed"))
      // string-operator parity: token-less documents have no blocks
      // and no output row there either
      .filter(col("n_blocks") > 0)
  }

  /** [[removeFrequentBlocks]] with CONTENT-DEFINED chunk boundaries —
    * the shift-robust layout: a chunk closes after any token whose
    * md5-prefix hash is ≡ 0 mod `p` (or after `maxTokens`, the bound on
    * cut-free runs; [[graft.functions.TextExprs.wordChunksCDC]]), so a
    * boilerplate block repeated at DIFFERENT token offsets across
    * documents still yields identical interior chunks and crosses the
    * frequency threshold. The fixed-grid operator misses exactly those
    * copies (its doc states the alignment assumption); this is the
    * variant to run on corpora where boilerplate follows
    * variable-length content — headers after titles, footers after
    * bodies. The junction chunks (prefix tail + block head up to the
    * first in-block cut, and symmetric at the tail) differ per
    * document and are correctly kept: content-defined removal recovers
    * the block's interior, not its first few tokens — the standard CDC
    * trade (Muthitacharoen et al. 2001).
    *
    * Same two-pass shape, same output contract, same
    * empty-document semantics as [[removeFrequentBlocks]]: (id,
    * clean_text, n_blocks, n_removed), no row for token-less docs.
    * Expected chunk length ~min(p, maxTokens) tokens; frequency pass is
    * the map-side-combinable hash aggregate, frequent set broadcasts
    * back, one id-keyed reassembly shuffle with rows bounded at
    * `maxTokens` tokens.
    */
  def removeFrequentBlocksCDC(df: DataFrame, idCol: String,
      textCol: String, p: Int = 10, maxTokens: Int = 20,
      minFreq: Long = 3): DataFrame = {
    Tune.ensureShufflePartitions(df, Tune.TextSpanShuffleExpansion)
    val ch = df.select(col(idCol),
        posexplode(TextExprs.wordChunksCDC(col(textCol), p, maxTokens))
          .as(Seq("idx", "blk")))
    val frequent = ch.groupBy(col("blk"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minFreq)
      .select(col("blk"), lit(true).as("freq"))
    ch.join(broadcast(frequent), Seq("blk"), "left")
      .withColumn("keep", col("freq").isNull)
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ",
          transform(
            filter(array_sort(collect_list(struct(col("idx"), col("keep"),
              col("blk")))), x => x.getField("keep")),
            x => x.getField("blk"))).as("clean_text"),
        count(lit(1)).as("n_blocks"),
        count(when(!col("keep"), lit(1))).as("n_removed"))
  }

  /** Cross-document duplicated k-token spans: every OVERLAPPING k-token
    * window (distinct within a document) that appears in at least
    * `minDocs` documents, with its document frequency. The span-level
    * discovery half of exact-substring training-data dedup (Lee et al.
    * 2021, "Deduplicating Training Data Makes Language Models Better",
    * public) at word-window granularity — a k-token window is the
    * fixed-length proxy for "duplicated substring ≥ k tokens", which
    * keeps the operator a hash aggregation instead of a suffix array.
    * A document with 1..k-1 tokens contributes its whole text as one
    * span (window semantics of
    * [[graft.functions.TextExprs.wordShingles]]).
    *
    * Shape: ONE shuffle. [[graft.functions.TextExprs.wordShingles]] is
    * per-ROW distinct, so the per-span count after explode is row
    * frequency — equal to document frequency under this operator's
    * input contract of ONE ROW PER DOCUMENT (the documents-table shape
    * every caller here feeds). An input carrying the same document as
    * several rows counts each row; de-duplicate rows first if that is
    * not the intent. The contract is what keeps the operator one
    * map-side-combinable shuffle — a true count(DISTINCT id) would
    * shuffle (span, id) pairs before counting, doubling the pass for an
    * input shape the pipeline never produces. Shuffle rows are (span,
    * partial count): bounded at k tokens each, never the document.
    */
  def duplicatedSpans(df: DataFrame, textCol: String,
      k: Int = 8, minDocs: Long = 2): DataFrame = {
    Tune.ensureShufflePartitions(df, Tune.TextSpanShuffleExpansion)
    df.select(explode(TextExprs.wordShingles(col(textCol), k)).as("span"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Per-document duplicated-span contamination: how much of each
    * document is verbatim-shared with at least `minDocs - 1` OTHER
    * documents — the doc-level filter signal built on
    * [[duplicatedSpans]] (drop or down-weight documents whose
    * `dup_frac` exceeds a threshold; the MassiveText/RefinedWeb
    * duplicate-content rule at span granularity).
    *
    * Output: (id, n_spans, n_dup_spans, dup_frac) where `n_spans`
    * counts the document's distinct k-token windows. Window semantics
    * follow [[graft.functions.TextExprs.wordShingles]]: a document with
    * 1..k-1 tokens contributes its whole text as ONE span (two
    * identical short documents ARE duplicated content), and a blank
    * document has no spans (n_spans 0, NULL frac).
    *
    * Shape: two passes over the corpus, like [[corpusFrequencyScores]].
    * Pass 1 builds the duplicated-span table — it grows with the
    * corpus's DUPLICATED content, not the corpus — and pass 2 joins it
    * back with an EXPLICIT broadcast hint: the hint is measured policy,
    * not an assumption (70 MB of dup table at 500k docs already exceeds
    * AQE's default threshold, and letting it fall to a sort-merge join
    * re-shuffles the 46M-row exploded side — 1.8× slower in the
    * same-session A/B at 500k, a gap that grows with the corpus since
    * the avoided shuffle is corpus-sized while the broadcast is only
    * duplicated-content-sized; BASELINE.md round-11). The hint holds to
    * Spark's 8 GB broadcast cap, which fails LOUDLY; a corpus whose
    * duplicated content overflows that drops the hint and eats the
    * shuffle. Pass 2 is ONE
    * corpus-wide shuffle: the per-document aggregate, which
    * partial-aggregates map-side because explode preserves document
    * locality. `explode_outer` (not explode) keeps span-less documents
    * in the output without a corpus-wide join-back.
    */
  def spanDupStats(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minDocs: Long = 2): DataFrame = {
    val dup = duplicatedSpans(df, textCol, k, minDocs)
      .select(col("span"), lit(1L).as("is_dup"))
    df.select(col(idCol), TextExprs.wordShingles(col(textCol), k).as("sp"))
      .select(col(idCol), size(col("sp")).as("n_sp"),
        explode_outer(col("sp")).as("span"))
      .join(broadcast(dup), Seq("span"), "left")
      .groupBy(col(idCol))
      .agg(max(col("n_sp")).cast("long").as("n_spans"),
        count(col("is_dup")).as("n_dup_spans"))
      .select(col(idCol), col("n_spans"), col("n_dup_spans"),
        when(col("n_spans") > 0,
          col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
          .as("dup_frac"))
  }

  /** The REMOVAL half of exact-substring dedup (Lee et al. 2021) at
    * word-window granularity: every token covered by a k-token window
    * that appears in ≥ `minDocs` documents is dropped from every
    * document; survivors re-join in order. Overlapping duplicated
    * windows merge into one removed region, so a long shared passage
    * disappears wholesale — the substring-level complement of document
    * dedup (near-identical DOCUMENTS are dedup's job; long shared
    * PASSAGES inside otherwise-distinct documents are this operator's).
    *
    * Output: (id, clean_text, n_tokens, n_removed) — every input
    * document appears, untouched documents with n_removed 0.
    * Cross-document only: a span repeated many times WITHIN one
    * document but nowhere else is repetition ([[repetition]]), not
    * duplication. Documents shorter than k tokens have no k-window and
    * pass through unchanged.
    *
    * Shape: discovery is [[duplicatedSpans]] (one shuffle over distinct
    * windows); the duplicated-span table broadcasts onto the POSITIONAL
    * window explode (non-distinct — every occurrence must be scrubbed),
    * which therefore never shuffles. The explicit hint is measured
    * policy (see [[spanDupStats]]: un-hinted SMJ re-shuffles the
    * exploded corpus, 2.9× slower in the same-session A/B at 500k
    * docs) and holds to Spark's 8 GB broadcast cap, which fails loudly
    * rather than degrading. The
    * per-document covered-start list is one id-keyed aggregate over
    * MATCHED positions only (documents with no duplicated span
    * contribute nothing), and the rebuild is a single codegen'd kernel
    * pass ([[graft.functions.TextExprs.scrubCovered]]).
    */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minDocs: Long = 2): DataFrame = {
    val dup = duplicatedSpans(df, textCol, k, minDocs)
      .select(col("span"))
    val starts = df.select(col(idCol),
        posexplode(TextExprs.wordSpansPos(col(textCol), k))
          .as(Seq("pos", "span")))
      .join(broadcast(dup), Seq("span"))
      .groupBy(col(idCol))
      .agg(collect_list(col("pos")).as("starts"))
    df.join(starts, Seq(idCol), "left")
      .select(col(idCol),
        TextExprs.scrubCovered(col(textCol),
          coalesce(col("starts"), array().cast("array<int>")), k).as("r"))
      .select(col(idCol),
        col("r.clean_text").as("clean_text"),
        col("r.n_tokens").cast("long").as("n_tokens"),
        col("r.n_removed").cast("long").as("n_removed"))
  }

}
