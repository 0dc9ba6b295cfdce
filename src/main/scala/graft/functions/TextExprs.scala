package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ExprBridge.{toColumn => toCol, toExpression => toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels. Spark's higher-order functions (`transform`,
  * `aggregate`) interpret their lambda per element — on a 100 TB text
  * corpus that interpretation dominates the scan. These expressions do
  * the same work in one static-kernel pass (profiled 8.8s → sub-second
  * for minhash signatures over sf0.1).
  */
object TextOps {

  private val Ws = "\\s+".r

  /** Whitespace tokens of a document (empty/blank → empty array). */
  def tokenize(text: UTF8String): Array[String] = {
    val s = text.toString.trim
    if (s.isEmpty) Array.empty[String] else Ws.split(s)
  }

  /** Distinct ≤k-deletion variants of a string, itself included —
    * deterministic order (original first, then depth-first by deletion
    * position). Neighborhood size is O(len^k); callers
    * keep k ≤ 2. Equal-budget invariant: a variant's remaining budget
    * is k minus (len(original) - len(variant)), a pure function of its
    * length, so the first visit always explores with the full budget
    * and the seen-set prune is lossless.
    */
  def deletionVariants(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    val seen = new java.util.LinkedHashSet[String]
    def rec(cur: String, left: Int): Unit = {
      if (!seen.add(cur) || left == 0) return
      var i = 0
      while (i < cur.length) {
        rec(cur.substring(0, i) + cur.substring(i + 1), left - 1)
        i += 1
      }
    }
    rec(s, math.max(k, 0))
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Hash bucket of a term: the top 60 bits of md5(term) (= the first
    * 15 hex chars of the digest string, the repo's established
    * SQL-replayable hash — DuckDB: `('0x'||substr(md5(w),1,15))::BIGINT
    * % buckets`), mod the bucket count. Non-negative by construction.
    * A production deployment that doesn't need cross-engine replay
    * would swap murmur3/xxhash here AND train with the same hash — the
    * hash is part of the model artifact, not of the kernel contract.
    */
  def hashBucket(term: String, buckets: Int): Int = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var k = 0
    while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    h = (h << 4) | ((d(7) & 0xffL) >>> 4)
    (h % buckets).toInt
  }

  /** fastText-style LINEAR text score over hashed word n-grams: one
    * token scan; every unigram (and, with `bigrams`, every adjacent
    * pair) hashes to a bucket of the broadcast weight vector and its
    * quantized weight joins an exact BIGINT accumulation — order-free,
    * so the sum is bit-identical across engines and partitionings
    * (the float-summation-order trap the centroid kernels also avoid).
    * Returns (n_terms, score_q); the caller divides ONCE for the real-
    * valued score. Weights are fixed-point at 1e7 like the embedding
    * quantization.
    */
  def linearScore(text: UTF8String, weights: Array[Long],
      bigrams: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = tokenize(text)
    val b = weights.length
    var score = 0L
    var terms = 0
    var i = 0
    while (i < toks.length) {
      score += weights(hashBucket(toks(i), b))
      terms += 1
      if (bigrams && i + 1 < toks.length) {
        score += weights(hashBucket(toks(i) + " " + toks(i + 1), b))
        terms += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](terms, score))
  }

  /** The exact term stream [[linearScore]] accumulates — every unigram
    * plus (with `bigrams`) every adjacent pair, in order, WITH
    * multiplicity. The trainer tokenizes through THIS kernel so
    * training and scoring share one term definition by construction
    * (a tokenizer drift between the two would silently skew every
    * weight).
    */
  def scoreTerms(text: UTF8String, bigrams: Boolean): ArrayData = {
    val toks = tokenize(text)
    if (toks.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](
      if (bigrams) toks.length * 2 - 1 else toks.length)
    var i = 0
    var o = 0
    while (i < toks.length) {
      out(o) = UTF8String.fromString(toks(i)); o += 1
      if (bigrams && i + 1 < toks.length) {
        out(o) = UTF8String.fromString(toks(i) + " " + toks(i + 1)); o += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[hashBucket]] over the engine's native string type — the codegen
    * entry point of [[graft.functions.HashBucketExpr]]. */
  def hashBucketU(term: UTF8String, buckets: Int): Int =
    hashBucket(term.toString, buckets)

  /** Ordered-distinct word n-gram shingles; < n tokens → one whole-doc
    * shingle (matches the Column formulation in TextFunctions exactly).
    */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.isEmpty) return new GenericArrayData(Array.empty[Any])
    if (toks.length < n)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(toks.mkString(" "))))
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString): Unit
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Non-overlapping c-token chunks in document order (last chunk may
    * be short); empty/blank → empty array. Positional, NOT distinct —
    * the same block twice in one doc is two chunks, so a corpus-wide
    * `count(*)` over chunks is occurrence frequency, which is what
    * boilerplate detection thresholds on.
    */
  def wordChunks(text: UTF8String, c: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.isEmpty) return new GenericArrayData(Array.empty[Any])
    val nChunks = (toks.length + c - 1) / c
    val out = new Array[Any](nChunks)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nChunks) {
      sb.setLength(0)
      var j = i * c
      val end = math.min(j + c, toks.length)
      while (j < end) {
        if (j > i * c) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** CONTENT-DEFINED chunks in document order: a chunk closes after any
    * token whose 60-bit md5 prefix ([[VecOps.md5Base60]] — the
    * SQL-replicable base hash every signature here uses) is ≡ 0 mod
    * `p`, or after `maxLen` tokens since the last cut, whichever comes
    * first. Cut points depend on CONTENT, not position — the
    * LBFS/rsync chunking idea (Muthitacharoen et al. 2001, public) at
    * token granularity — so a block repeated at DIFFERENT offsets in
    * different documents still yields identical interior chunks, where
    * the fixed i·c grid of [[wordChunks]] only aligns copies that land
    * on the same grid phase. Expected chunk length is ~min(p, maxLen)
    * tokens; `maxLen` bounds the no-cut-token worst case (and splits
    * long boundary-free runs on a fixed sub-grid anchored at the last
    * content cut — still shift-invariant, because the anchor is).
    * No minimum length: a cut token always closes its chunk, so a hot
    * cut token yields short chunks — acceptable for frequency
    * thresholding, and what keeps the definition stateless enough for
    * a SQL engine to replay with two window functions.
    */
  def wordChunksCDC(text: UTF8String, p: Int, maxLen: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](toks.length / math.min(p, maxLen) + 1)
    val sb = new java.lang.StringBuilder(64)
    var curLen = 0
    var i = 0
    while (i < toks.length) {
      if (curLen > 0) sb.append(' ')
      sb.append(toks(i))
      curLen += 1
      if (curLen >= maxLen ||
          VecOps.md5Base60(UTF8String.fromString(toks(i))) % p == 0L) {
        out.add(UTF8String.fromString(sb.toString))
        sb.setLength(0)
        curLen = 0
      }
      i += 1
    }
    if (curLen > 0) out.add(UTF8String.fromString(sb.toString))
    new GenericArrayData(out.toArray)
  }

  /** Positional (NON-distinct) overlapping k-token windows in document
    * order — entry i is the window starting at token i, so
    * `posexplode` yields (start, span) pairs. Unlike [[wordShingles]]
    * there is NO whole-doc fallback: <k tokens → empty array (a short
    * document has no k-window to scrub; whole-document duplication is
    * exact dedup's job).
    */
  def wordSpansPos(text: UTF8String, k: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val n = toks.length - k + 1
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Rebuild a document with the k-token windows starting at `starts`
    * removed: tokens covered by ANY listed window are dropped,
    * survivors re-join in order (single-space normalized, the
    * [[wordChunks]] reassembly convention). One pass, overlapping
    * windows merge for free via the boolean cover array. Returns
    * (clean_text, n_tokens, n_removed).
    */
  def scrubCovered(text: UTF8String, starts: ArrayData, k: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val toks = tokenize(text)
    val n = toks.length
    val covered = new Array[Boolean](n)
    var si = 0
    while (si < starts.numElements()) {
      if (!starts.isNullAt(si)) {
        val s = starts.getInt(si)
        var p = math.max(s, 0)
        val end = math.min(s.toLong + k, n.toLong).toInt
        while (p < end) { covered(p) = true; p += 1 }
      }
      si += 1
    }
    val sb = new java.lang.StringBuilder(text.numBytes())
    var kept = 0
    var i = 0
    while (i < n) {
      if (!covered(i)) {
        if (kept > 0) sb.append(' ')
        sb.append(toks(i))
        kept += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(sb.toString), n, n - kept))
  }

  /** Per-document repetition statistics (Gopher/MassiveText-style
    * quality rules, Rae et al. 2021 §A1.1, public): token count,
    * distinct tokens, and the multiplicity of the most-repeated
    * unigram/bigram/trigram — ONE tokenize pass, three count maps, no
    * per-n-gram column materialization. High top-n-gram multiplicity
    * flags boilerplate/spam documents.
    */
  def repetitionStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = tokenize(text)
    val n = toks.length
    val uni = new java.util.HashMap[String, Integer](n * 2)
    val bi = new java.util.HashMap[String, Integer](n * 2)
    val tri = new java.util.HashMap[String, Integer](n * 2)
    var maxU = 0; var maxB = 0; var maxT = 0
    var i = 0
    while (i < n) {
      val cu = uni.merge(toks(i), 1, (a, b) => a + b)
      if (cu > maxU) maxU = cu
      if (i + 1 < n) {
        val cb = bi.merge(toks(i) + " " + toks(i + 1), 1, (a, b) => a + b)
        if (cb > maxB) maxB = cb
      }
      if (i + 2 < n) {
        val ct = tri.merge(toks(i) + " " + toks(i + 1) + " " + toks(i + 2), 1,
          (a, b) => a + b)
        if (ct > maxT) maxT = ct
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, uni.size(), maxU, maxB, maxT))
  }

  /** Fused shingle→minhash: signature WITHOUT materializing shingle
    * strings as a column (used when only the signature is needed).
    */
  def minhashOfText(text: UTF8String, n: Int, k: Int, seed: Int): ArrayData =
    VecOps.minhashSig(wordShingles(text, n), k, seed)

  /** Set Jaccard of two string arrays (distinct semantics) WITHOUT
    * materializing intersection/union arrays: hash-set the smaller side,
    * probe the larger. `size(array_intersect)/size(array_union)` builds
    * and discards both arrays per row — at 300k candidate pairs that was
    * the dedup pipeline's single biggest cost.
    */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = small.numElements()
    val nl = large.numElements()
    if (ns == 0 && nl == 0) return 0.0
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var i = 0
    while (i < ns) {
      if (!small.isNullAt(i)) set.add(small.getUTF8String(i)): Unit
      i += 1
    }
    val nDistinctSmall = set.size()
    val seen = new java.util.HashSet[UTF8String](nl * 2)
    var inter = 0
    var j = 0
    while (j < nl) {
      if (!large.isNullAt(j)) {
        val v = large.getUTF8String(j)
        if (seen.add(v) && set.contains(v)) inter += 1
      }
      j += 1
    }
    val union = nDistinctSmall + seen.size() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** jaccard(array<string>, array<string>) → double, no array allocation. */
case class JaccardSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextOps.jaccard($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** word_shingles(string) → array<string>, one static-kernel pass. */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextOps.wordShingles(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.wordShingles($t, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** word_chunks(string, c) → non-overlapping c-token blocks in order —
  * the unit of corpus-level boilerplate removal (frequency-thresholded
  * block filtering; the block analogue of CCNet/RefinedWeb line-level
  * dedup for corpora whose documents carry no line structure).
  */
case class WordChunksExpr(child: Expression, c: Int) extends UnaryExpression {
  require(c >= 1, s"word_chunks: chunk size must be >= 1, got $c")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextOps.wordChunks(t.asInstanceOf[UTF8String], c)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.wordChunks($t, $c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** word_chunks_cdc(string, p, maxLen) → content-defined token blocks —
  * the shift-robust unit of boilerplate removal ([[TextOps.wordChunksCDC]]).
  */
case class WordChunksCDCExpr(child: Expression, p: Int, maxLen: Int)
    extends UnaryExpression {
  require(p >= 1, s"word_chunks_cdc: cut modulus must be >= 1, got $p")
  require(maxLen >= 1,
    s"word_chunks_cdc: max chunk length must be >= 1, got $maxLen")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextOps.wordChunksCDC(t.asInstanceOf[UTF8String], p, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.TextOps.wordChunksCDC($t, $p, $maxLen)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** word_spans_pos(string, k) → positional overlapping k-token windows
  * (index in the array IS the start token offset) — the candidate side
  * of exact-substring span removal.
  */
case class WordSpansPosExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"word_spans_pos: window size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextOps.wordSpansPos(t.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.wordSpansPos($t, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** scrub_covered(string, array<int>) → (clean_text, n_tokens,
  * n_removed): drop every token covered by a k-window starting at any
  * of the listed offsets, re-join the rest in order.
  */
case class ScrubCoveredExpr(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(k >= 1, s"scrub_covered: window size must be >= 1, got $k")
  // declaring inputTypes makes the analyzer COERCE an array<bigint> /
  // array<double> starts argument (SQL array literals default to
  // bigint) instead of starts.getInt misreading the backing array
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.ExprBridge.AbstractType] =
    Seq(StringType, ArrayType(IntegerType))
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))
  override protected def nullSafeEval(t: Any, s: Any): Any =
    TextOps.scrubCovered(t.asInstanceOf[UTF8String], s.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, s) => s"graft.functions.TextOps.scrubCovered($t, $s, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** deletion_variants(string, k) → all DISTINCT strings obtainable by
  * deleting at most k characters (the string itself included) — the
  * FastSS deletion-neighborhood index key set (Bocek et al., 2007,
  * public): ed(s,t) ≤ k guarantees the neighborhoods of s and t
  * intersect, so an equi-join on these keys is a COMPLETE candidate
  * generator for edit-distance joins. Char-level (Spark and DuckDB
  * levenshtein agree on the verify side).
  */
case class DeletionVariantsExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextOps.deletionVariants(t.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.deletionVariants($t, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** repetition_stats(string) → struct<n_tokens, distinct_tokens,
  * top_token_count, top_bigram_count, top_trigram_count> — single-pass
  * static kernel.
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("distinct_tokens", IntegerType, nullable = false),
    StructField("top_token_count", IntegerType, nullable = false),
    StructField("top_bigram_count", IntegerType, nullable = false),
    StructField("top_trigram_count", IntegerType, nullable = false)))
  override protected def nullSafeEval(t: Any): Any =
    TextOps.repetitionStats(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.repetitionStats($t)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_of_text(string) → array<long>: fused tokenize+shingle+sign. */
case class MinHashOfText(child: Expression, n: Int, k: Int, seed: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextOps.minhashOfText(t.asInstanceOf[UTF8String], n, k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.TextOps.minhashOfText($t, $n, $k, $seed)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-pass word-boundary matching kernels.
  *
  * `size(regexp_extract_all(lower(c), "\\b(w1|w2|...)\\b"))` materializes
  * the full match list per language just to count it, and language-ID
  * runs it once per language. These kernels scan the ASCII word-char
  * token runs (exactly Java regex `\b` semantics: `\w` = [a-zA-Z0-9_])
  * of the lowercased text once and count set hits in place — no match
  * arrays, no per-language rescans.
  */
object WordMatchOps {

  @inline private def isWordChar(ch: Char): Boolean =
    (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9') ||
      (ch >= 'A' && ch <= 'Z') || ch == '_'

  /** Count of tokens equal to any of `words` in the lowercased text —
    * equivalent to counting `\b(w1|...)\b` regex matches on lower(text).
    */
  def stopwordHits(text: UTF8String, words: Array[String]): Int = {
    val str = text.toLowerCase.toString
    val n = str.length
    var hits = 0
    var i = 0
    while (i < n) {
      if (isWordChar(str.charAt(i))) {
        var j = i + 1
        while (j < n && isWordChar(str.charAt(j))) j += 1
        var w = 0
        val len = j - i
        while (w < words.length) {
          val word = words(w)
          if (word.length == len && str.regionMatches(i, word, 0, len)) {
            hits += 1
            w = words.length // distinct words: at most one can match
          } else w += 1
        }
        i = j
      } else i += 1
    }
    hits
  }

  /** Language-ID: per-language stopword counts in ONE token scan, then
    * first-listed-max argmax (all-zero → "und"), then the CJK-script
    * override (cjkChars*4 > numChars → "zh"). Byte-for-byte the same
    * labels as the regexp_extract_all formulation it replaces.
    */
  def langId(text: UTF8String, langs: Array[UTF8String],
      wordSets: Array[Array[String]]): UTF8String = {
    val str = text.toLowerCase.toString
    val n = str.length
    val counts = new Array[Int](wordSets.length)
    var i = 0
    while (i < n) {
      if (isWordChar(str.charAt(i))) {
        var j = i + 1
        while (j < n && isWordChar(str.charAt(j))) j += 1
        val len = j - i
        var s = 0
        while (s < wordSets.length) {
          val words = wordSets(s)
          var w = 0
          while (w < words.length) {
            val word = words(w)
            if (word.length == len && str.regionMatches(i, word, 0, len)) {
              counts(s) += 1
              w = words.length
            } else w += 1
          }
          s += 1
        }
        i = j
      } else i += 1
    }
    // CJK script check on the ORIGINAL text (BMP range, so char-level)
    val orig = text.toString
    var cjk = 0
    var k = 0
    while (k < orig.length) {
      val ch = orig.charAt(k)
      if (ch >= 0x4E00 && ch <= 0x9FFF) cjk += 1
      k += 1
    }
    if (cjk * 4 > text.numChars()) return UTF8String.fromString("zh")
    var best = -1
    var max = 0
    var s = 0
    while (s < counts.length) {
      if (counts(s) > max) { max = counts(s); best = s }
      s += 1
    }
    if (best < 0) UTF8String.fromString("und") else langs(best)
  }
}

/** stopword_hits(string) → int: token hits against a fixed word set. */
case class StopwordHitsExpr(child: Expression, words: Seq[String])
    extends UnaryExpression {
  @transient private lazy val wordArr: Array[String] = words.toArray
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(t: Any): Any =
    WordMatchOps.stopwordHits(t.asInstanceOf[UTF8String], wordArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("words", wordArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.WordMatchOps.stopwordHits($t, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** linear_text_score(string) → struct(n_terms int, score_q bigint):
  * the learned-classifier seam for quality scoring — a broadcast-
  * weights linear model over hashed word n-grams (the fastText
  * supervised shape: Joulin et al. 2016), as one codegen'd pass.
  * The heuristic quality rules (Gopher/C4 style) stay; this is the
  * kernel a TRAINED model plugs into: the weight vector is the model
  * artifact (here a reference object, on a cluster a broadcast), the
  * hash is [[TextOps.hashBucket]] (SQL-replayable by construction so
  * the driver gate can verify the full dot product), and scoring is
  * exact fixed-point BIGINT — deterministic under any partitioning.
  */
case class LinearTextScoreExpr(child: Expression, weights: Seq[Long],
    bigrams: Boolean) extends UnaryExpression {
  require(weights.nonEmpty, "weights must be non-empty")
  @transient private lazy val wArr: Array[Long] = weights.toArray
  override def dataType: DataType = StructType(Seq(
    StructField("n_terms", IntegerType, nullable = false),
    StructField("score_q", LongType, nullable = false)))
  override protected def nullSafeEval(t: Any): Any =
    TextOps.linearScore(t.asInstanceOf[UTF8String], wArr, bigrams)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weights", wArr, "long[]")
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextOps.linearScore($t, $ref, $bigrams)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** score_terms(string) → array<string>: the term stream the linear
  * scorer accumulates (uni + adjacent bigrams, in order, with
  * multiplicity) — the trainer's tokenizer, shared with
  * [[LinearTextScoreExpr]] at the kernel level. */
case class ScoreTermsExpr(child: Expression, bigrams: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextOps.scoreTerms(t.asInstanceOf[UTF8String], bigrams)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextOps.scoreTerms($t, $bigrams)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** hash_bucket(string) → int: the 60-bit md5-prefix bucket of a term —
  * [[TextOps.hashBucket]] as a codegen'd column, so the trainer's
  * count aggregate buckets exactly like the scorer's weight lookup. */
case class HashBucketExpr(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0, s"buckets must be positive: $buckets")
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(t: Any): Any =
    TextOps.hashBucketU(t.asInstanceOf[UTF8String], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextOps.hashBucketU($t, $buckets)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** lang_id(string) → string: single-pass heuristic language ID. */
case class LangIdExpr(child: Expression, langWords: Seq[(String, Seq[String])])
    extends UnaryExpression {
  @transient private lazy val langArr: Array[UTF8String] =
    langWords.map(lw => UTF8String.fromString(lw._1)).toArray
  @transient private lazy val setArr: Array[Array[String]] =
    langWords.map(_._2.toArray).toArray
  override def dataType: DataType = StringType
  override protected def nullSafeEval(t: Any): Any =
    WordMatchOps.langId(t.asInstanceOf[UTF8String], langArr, setArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val langsRef = ctx.addReferenceObj("langs", langArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val setsRef = ctx.addReferenceObj("wordSets", setArr, "java.lang.String[][]")
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.WordMatchOps.langId($t, $langsRef, $setsRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExprs {
  def wordShingles(text: Column, n: Int): Column =
    toCol(WordShinglesExpr(toExpr(text), n))
  def wordChunks(text: Column, c: Int): Column =
    toCol(WordChunksExpr(toExpr(text), c))
  def wordChunksCDC(text: Column, p: Int, maxLen: Int): Column =
    toCol(WordChunksCDCExpr(toExpr(text), p, maxLen))
  def wordSpansPos(text: Column, k: Int): Column =
    toCol(WordSpansPosExpr(toExpr(text), k))
  def scrubCovered(text: Column, starts: Column, k: Int): Column =
    toCol(ScrubCoveredExpr(toExpr(text), toExpr(starts), k))
  def minhashOfText(text: Column, n: Int, k: Int, seed: Int = 0x7f4a7c15): Column =
    toCol(MinHashOfText(toExpr(text), n, k, seed))
  def jaccardSim(a: Column, b: Column): Column =
    toCol(JaccardSim(toExpr(a), toExpr(b)))
  def stopwordHits(text: Column, words: Seq[String]): Column =
    toCol(StopwordHitsExpr(toExpr(text), words))
  def langId(text: Column, langWords: Seq[(String, Seq[String])]): Column =
    toCol(LangIdExpr(toExpr(text), langWords))
  def repetitionStats(text: Column): Column =
    toCol(RepetitionStatsExpr(toExpr(text)))
  def linearTextScore(text: Column, weights: Seq[Long],
      bigrams: Boolean = true): Column =
    toCol(LinearTextScoreExpr(toExpr(text), weights, bigrams))
  def scoreTerms(text: Column, bigrams: Boolean = true): Column =
    toCol(ScoreTermsExpr(toExpr(text), bigrams))
  def hashBucket(term: Column, buckets: Int): Column =
    toCol(HashBucketExpr(toExpr(term), buckets))
  def deletionVariants(text: Column, k: Int): Column =
    toCol(DeletionVariantsExpr(toExpr(text), k))
}
