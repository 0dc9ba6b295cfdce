package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextExprs
import graft.operators.TextQuality

/** Property tests for the round-11 text kernels: the chunk/span window
  * geometry invariants and the scrub/boilerplate reassembly identities,
  * driven over generated documents (arbitrary whitespace shapes, token
  * repetition, unicode).
  */
class TextKernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAllSamples[A](g: Gen[A], n: Int = 25)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(23L + i)).foreach(body)
    }

  /** Small token alphabet so repetition (the interesting case) is
    * common; mixed separators so tokenization is exercised.
    */
  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 30)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "Δδ", "x1", "z"))
    sep <- Gen.oneOf(" ", "  ", "\t", " \n ")
    pad <- Gen.oneOf("", " ", "\n\t")
  } yield pad + toks.mkString(sep) + pad

  test("property: subword vocab count == longest-first alternation " +
      "regex count (the oracle's replay), on corpus + generated text") {
    import graft.functions.Tokenizers
    val tok = Tokenizers.bpe
    val regex = tok.oracleRegex
    def regexCount(c: org.apache.spark.sql.Column) =
      size(regexp_extract_all(lower(c), lit(regex), lit(0)))
    // real corpus: every document agrees
    val d = Tables(spark, sf001, "documents")
    val diff = d.select(tok.count($"text").as("k"),
        regexCount($"text").as("r"))
      .filter($"k" =!= $"r").count()
    assert(diff === 0L, "kernel diverged from the regex replay on corpus")
    // sanity anchors: greedy longest-match, whitespace skipped,
    // punctuation/digits one token per codepoint, CJK per codepoint
    val cases = Seq(
      "" -> 0, "   " -> 0,
      "the" -> 1, // one 3-gram piece
      "theory" -> 3, // the|or|y — greedy takes "the" not "th"
      "a b" -> 2,
      "x9!" -> 3,
      "中文 text" -> 5) // 中,文 per codepoint; te|x|t
    cases.foreach { case (s, want) =>
      val got = Seq(s).toDF("t").select(tok.count($"t")).head().getInt(0)
      assert(got === want, s"'$s': got $got want $want")
      val viaRegex = Seq(s).toDF("t").select(regexCount($"t"))
        .head().getInt(0)
      assert(viaRegex === want, s"'$s' regex: $viaRegex want $want")
    }
    // generated text (unicode, weird whitespace): kernel == regex
    forAllSamples(docGen, n = 40) { text =>
      val row = Seq(text).toDF("t")
        .select(tok.count($"t"), regexCount($"t")).head()
      assert(row.getInt(0) === row.getInt(1), s"mismatch on '$text'")
    }
    // the subword count is the one that sees code/CJK mass: an
    // unsegmented run counts per piece/codepoint, not as 1 token
    val code = "internationalization_configuration"
    val ws = Seq(code).toDF("t")
      .select(graft.functions.TextFunctions.tokenCount($"t")).head().getInt(0)
    val sub = Seq(code).toDF("t").select(tok.count($"t")).head().getInt(0)
    assert(ws === 1 && sub > 5, s"ws=$ws sub=$sub")
    // a LEARNED vocabulary plugs into the same kernel/replay pair: mine
    // the corpus's own top pieces, count with them, replay with the
    // regex generated from them — still exactly equal
    val learned = Tokenizers.learn(d, "text", perLen = 12)
    assert(learned.vocab.size === 36 &&
      learned.vocab.forall(p => p.length >= 2 && p.length <= 4))
    val learnedRegex = learned.oracleRegex
    val ldiff = d.select(learned.count($"text").as("k"),
        size(regexp_extract_all(lower($"text"), lit(learnedRegex), lit(0)))
          .as("r"))
      .filter($"k" =!= $"r").count()
    assert(ldiff === 0L, "learned-vocab kernel diverged from its replay")
    // learning is deterministic (ties break lexicographically)
    assert(learned.vocab.sorted ===
      Tokenizers.learn(d, "text", perLen = 12).vocab.sorted)
  }

  test("property: wordChunks partitions the token stream in order") {
    forAllSamples(Gen.zip(docGen, Gen.choose(1, 5))) { case (text, c) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val chunks = Seq(text).toDF("t")
        .select(TextExprs.wordChunks($"t", c)).head().getSeq[String](0)
      // chunk sizes: all c except a short last; concatenation identity
      val sizes = chunks.map(_.split(" ").length)
      assert(sizes.dropRight(1).forall(_ == c))
      sizes.lastOption.foreach(s => assert(s >= 1 && s <= c))
      assert(chunks.flatMap(_.split(" ")) == toks)
    }
  }

  test("property: wordSpansPos emits max(0, n-k+1) windows of exactly k tokens") {
    forAllSamples(Gen.zip(docGen, Gen.choose(1, 5))) { case (text, k) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val spans = Seq(text).toDF("t")
        .select(TextExprs.wordSpansPos($"t", k)).head().getSeq[String](0)
      assert(spans.length == math.max(0, toks.length - k + 1))
      spans.zipWithIndex.foreach { case (sp, i) =>
        assert(sp == toks.slice(i, i + k).mkString(" "))
      }
    }
  }

  test("property: scrubCovered identities — empty starts, full cover, complement") {
    forAllSamples(Gen.zip(docGen, Gen.choose(1, 4)), n = 20) { case (text, k) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val n = toks.length
      // valid window starts only — the wordSpansPos contract (n < k
      // has no window, so the all-covered case degenerates to none)
      val allStarts =
        if (n >= k) (0 to n - k).toArray else Array.empty[Int]
      val rows = Seq((text, Array.empty[Int], allStarts)).toDF("t", "e", "all")
        .select(
          TextExprs.scrubCovered($"t", $"e", k).as("none"),
          TextExprs.scrubCovered($"t", $"all", k).as("full"))
        .head()
      val none = rows.getStruct(0); val full = rows.getStruct(1)
      // no starts: normalized identity, nothing removed
      assert(none.getString(0) == toks.mkString(" "))
      assert(none.getInt(1) == n && none.getInt(2) == 0)
      // every window start: n>=k covers everything; n<k has no window
      if (n >= k) assert(full.getString(0) == "" && full.getInt(2) == n)
      else assert(full.getString(0) == toks.mkString(" ") && full.getInt(2) == 0)
    }
  }

  test("property: removeFrequentBlocks threshold extremes") {
    forAllSamples(Gen.listOfN(4, docGen), n = 10) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val nonBlank = docs.count(_.trim.nonEmpty)
      // minFreq = 1: every block is "frequent" → everything scrubbed
      val all = TextQuality.removeFrequentBlocks(df, "id", "t", 3, 1)
        .collect()
      assert(all.length == nonBlank)
      all.foreach { r =>
        assert(r.getString(1) == "" && r.getLong(2) == r.getLong(3))
      }
      // minFreq > total block count: nothing scrubbed, normalized text
      val none = TextQuality.removeFrequentBlocks(df, "id", "t", 3, 1000000)
        .collect().map(r => r.getLong(0) -> r).toMap
      docs.zipWithIndex.filter(_._1.trim.nonEmpty).foreach { case (t, i) =>
        val toks = t.trim.split("\\s+").filter(_.nonEmpty)
        val r = none(i.toLong)
        assert(r.getString(1) == toks.mkString(" "))
        assert(r.getLong(3) == 0L)
      }
    }
  }

  test("property: spanDupStats counts == brute-force span sets") {
    forAllSamples(Gen.listOfN(5, docGen), n = 10) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val k = 2
      def spansOf(t: String): Set[String] = {
        val toks = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
        if (toks.isEmpty) Set.empty
        else if (toks.length < k) Set(toks.mkString(" "))
        else toks.sliding(k).map(_.mkString(" ")).toSet
      }
      val sets = docs.map(spansOf)
      val dupSet = sets.flatten.groupBy(identity)
        .collect { case (s, occ) if occ.size >= 2 => s }.toSet
      val got = TextQuality.spanDupStats(df, "id", "t", k, 2)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      sets.zipWithIndex.foreach { case (s, i) =>
        assert(got(i.toLong) == ((s.size.toLong, (s & dupSet).size.toLong)),
          s"doc $i: spans=$s dup=$dupSet got=${got(i.toLong)}")
      }
    }
  }
}
