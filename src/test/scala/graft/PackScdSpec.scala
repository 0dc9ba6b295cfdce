package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling, Scd}

class PackScdSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: deterministic, partition-of-the-table, ~80/10/10") {
    val docs = Tables(spark, sf001, "documents")
    val split = Sampling.hashSplit(docs, "doc_id")
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == docs.count())
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    // hash split of a small table is noisy; train must still dominate
    assert(counts("train") > counts.getOrElse("val", 0L))
    assert(counts("train") > counts.getOrElse("test", 0L))
    // deterministic: same membership on re-run
    val again = Sampling.hashSplit(docs, "doc_id")
      .select("doc_id", "split").collect().map(_.toSeq).toSet
    assert(again == split.select("doc_id", "split")
      .collect().map(_.toSeq).toSet)
  }

  test("weightedKeep: per-group rates, nested keep sets, zero drops all") {
    val docs = Tables(spark, sf001, "documents")
    val kept = Sampling.weightedKeep(docs, "doc_id", "source",
      Map("src0" -> 100, "src1" -> 500, "src2" -> 0))
    val bySrc = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("src2"))
    assert(bySrc.getOrElse("src0", 0L) < orig("src0"))
    // untouched groups survive whole
    assert(bySrc("src3") == orig("src3"))
    // nested: raising a rate only ADDS rows (rate changes never resample)
    val small = Sampling.weightedKeep(docs, "doc_id", "source",
        Map("src1" -> 100)).filter($"source" === "src1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Sampling.weightedKeep(docs, "doc_id", "source",
        Map("src1" -> 500)).filter($"source" === "src1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
  }

  test("nextFitByStart: bins honor budget-by-start, order, and totals") {
    val df = Seq(
      ("a", 1L, 1000L), ("a", 2L, 900L), ("a", 3L, 300L), ("a", 4L, 2500L),
      ("a", 5L, 10L), ("b", 1L, 2048L), ("b", 2L, 1L)
    ).toDF("src", "id", "tok")
    val packed = Packing.nextFitByStart(df, "src", "id", "tok", 2048L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // shard a cumsums: 1000, 1900, 2200, 4700, 4710
    // starts:          0,    1000, 1900, 2200, 4700 → bins 0,0,0,1,2
    assert(packed(("a", 1L)) == 0L && packed(("a", 2L)) == 0L)
    assert(packed(("a", 3L)) == 0L) // starts at 1900 < 2048
    assert(packed(("a", 4L)) == 1L) // oversized doc, own span
    assert(packed(("a", 5L)) == 2L)
    // shard b: doc of exactly budget fills bin 0; next starts bin 1
    assert(packed(("b", 1L)) == 0L && packed(("b", 2L)) == 1L)
    // summary preserves totals
    val sums = Packing.packSummary(
      Packing.nextFitByStart(df, "src", "id", "tok", 2048L), 2048L)
    assert(sums.agg(sum("bin_tokens")).head().getLong(0) == 6759L)
  }

  test("chunkByTokens: boundaries, overlap, full coverage") {
    def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val df = Seq(
      (1L, toks(10)),  // shorter than window → 1 chunk
      (2L, toks(50)),  // exactly one window → 1 chunk
      (3L, toks(90)),  // [1-50], [41-90] → 2 full chunks
      (4L, toks(91))   // + partial [81-91]
    ).toDF("doc_id", "text")
    val got = graft.functions.TextFunctions
      .chunkByTokens(df, "doc_id", "text", w = 50, s = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getLong(3)))
    val byDoc = got.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc(1L).map(_._4).toSeq == Seq(10L))
    assert(byDoc(2L).map(_._4).toSeq == Seq(50L))
    assert(byDoc(3L).map(_._4).toSeq == Seq(50L, 50L))
    assert(byDoc(4L).map(_._4).toSeq == Seq(50L, 50L, 11L))
    // overlap: chunk 1 of doc 3 starts at token 41
    assert(byDoc(3L)(1)._3.startsWith("t41 ") )
    assert(byDoc(4L)(2)._3 == (81 to 91).map(i => s"t$i").mkString(" "))
    // every token of doc 4 appears in at least one chunk
    val covered = byDoc(4L).flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 91).map(i => s"t$i").toSet)
  }

  test("scd2 invariants on a randomized change log") {
    val rnd = new scala.util.Random(7)
    def t(min: Int) = new Timestamp(1704067200000L + min * 60000L)
    // many collisions: few keys, few timestamps, few values
    val log = (1 to 400).map { i =>
      (rnd.nextInt(8).toLong, t(rnd.nextInt(40)),
        rnd.nextInt(3).toDouble, i.toLong)
    }.toDF("k", "ts", "v", "eid")
    val hist = Scd.scd2FromChangeLog(log, "k", "ts", "v", "eid")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    val byKey = hist.groupBy(_._1)
    byKey.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      // exactly one open (current) interval per key, and it's the last
      assert(rows.count(_._5) == 1)
      assert(sorted.last._4.isEmpty && sorted.last._5)
      // intervals chain: each valid_to == next valid_from; no overlap
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"gap/overlap: $a -> $b")
          // consecutive versions always differ (no-change collapsed)
          assert(a._2 != b._2)
        case _ =>
      }
    }
    // every key in the log appears
    assert(byKey.keySet == (0 until 8).map(_.toLong).toSet)
  }

  test("packing invariants on randomized shards") {
    val rnd = new scala.util.Random(13)
    val df = (1 to 500).map { i =>
      (s"s${rnd.nextInt(6)}", i.toLong, (rnd.nextInt(3000) + 1).toLong)
    }.toDF("src", "id", "tok")
    val budget = 2048L
    val packed = Packing.nextFitByStart(df, "src", "id", "tok", budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // total tokens preserved; bins monotone in id within shard and
    // contiguous from 0; a new bin starts only when the previous bin's
    // start-measured fill reached the budget
    assert(packed.map(_._3).sum ==
      df.agg(sum("tok")).head().getLong(0))
    packed.groupBy(_._1).foreach { case (_, rows) =>
      // local sequential replay: every row's bin is exactly
      // floor(running-total-before-row / budget)
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._4 == 0L)
      var cum = 0L
      sorted.foreach { case (_, _, tok, bin) =>
        assert(cum / budget == bin, s"start $cum bin $bin")
        cum += tok
      }
    }
  }

  test("latestSnapshot == the is_current rows of scd2 (attr per key)") {
    val events = Tables(spark, sf001, "events")
      .filter($"event_type" === "purchase")
    val snap = Scd.latestSnapshot(events, "user_id", "ts", "value", "event_id")
      .select($"k", $"attr").collect().map(_.toSeq).toSet
    val current = Scd.scd2FromChangeLog(
        events, "user_id", "ts", "value", "event_id")
      .filter($"is_current")
      .select($"k", $"attr").collect().map(_.toSeq).toSet
    assert(snap == current && snap.nonEmpty)
  }

  test("mergeUpsert: update replaces whole row, tombstone drops, insert adds, rest kept") {
    val base = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "name", "price")
    val changes = Seq(
      (2L, null.asInstanceOf[String], 25.0, false), // update: NULL name must WIN (whole-row)
      (3L, "c", 30.0, true),                        // tombstone
      (9L, "z", 90.0, false)                        // insert
    ).toDF("k", "name", "price", "_del")
    val got = graft.operators.Scd.mergeUpsert(base, changes, "k", Some("_del"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2)))
      .toSet
    assert(got == Set(
      (1L, Some("a"), 10.0),
      (2L, None, 25.0),
      (4L, Some("d"), 40.0),
      (9L, Some("z"), 90.0)))
  }

  test("mergeUpsert edge cases: empty batch is identity; all-tombstone batch empties matches") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val idGot = graft.operators.Scd.mergeUpsert(base, empty, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(idGot == Set((1L, "a"), (2L, "b")))

    val allDel = Seq((1L, "a", true), (2L, "b", true))
      .toDF("k", "v", "_del")
    assert(graft.operators.Scd.mergeUpsert(base, allDel, "k", Some("_del"))
      .count() == 0)
  }

  test("mergeUpsert: NULL-keyed change row inserts as-is (SQL MERGE NOT MATCHED), no phantom row") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((null.asInstanceOf[java.lang.Long], "weird"))
      .toDF("k", "v")
    val got = graft.operators.Scd.mergeUpsert(base, changes, "k")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(got == Set((Some(1L), "a"), (None, "weird")))
  }

  test("mergeUpsertLatest: NULL order/tie sorts OLDEST, symmetric on " +
      "both sides (struct >= is a total null-first ordering, never NULL)") {
    def df(rows: Seq[(Long, Double, Option[Long], Option[Long])]) =
      rows.toDF("k", "v", "last_us", "tie")
    def merge(base: Seq[(Long, Double, Option[Long], Option[Long])],
        changes: Seq[(Long, Double, Option[Long], Option[Long])]) =
      graft.operators.Scd.mergeUpsertLatest(df(base), df(changes),
          "k", "last_us", "tie")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

    // NULL-ts change row loses to a timestamped base row...
    assert(merge(Seq((1L, 1.0, Some(100L), Some(1L))),
      Seq((1L, 9.0, None, Some(9L)))) === Set((1L, 1.0)))
    // ...and, symmetrically, a NULL-ts base row loses to a timestamped
    // change row (this is the asymmetry the NULL-propagating reading
    // would have had: base winning both directions)
    assert(merge(Seq((1L, 1.0, None, Some(1L))),
      Seq((1L, 9.0, Some(100L), Some(9L)))) === Set((1L, 9.0)))
    // NULL-vs-NULL order falls through to the tie column
    assert(merge(Seq((1L, 1.0, None, Some(5L))),
      Seq((1L, 9.0, None, Some(2L)))) === Set((1L, 1.0)))
    assert(merge(Seq((1L, 1.0, None, Some(2L))),
      Seq((1L, 9.0, None, Some(5L)))) === Set((1L, 9.0)))
    // entirely-NULL on both sides: the >= replay rule → change wins
    assert(merge(Seq((1L, 1.0, None, None)),
      Seq((1L, 9.0, None, None))) === Set((1L, 9.0)))
    // NULL tie alone sorts oldest too (order equal, NULL tie loses)
    assert(merge(Seq((1L, 1.0, Some(100L), None)),
      Seq((1L, 9.0, Some(100L), Some(3L)))) === Set((1L, 9.0)))
    assert(merge(Seq((1L, 1.0, Some(100L), Some(3L))),
      Seq((1L, 9.0, Some(100L), None))) === Set((1L, 1.0)))
  }

  test("mergeUpsert without tombstone column: pure upsert") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((2L, "B"), (3L, "C")).toDF("k", "v")
    val got = graft.operators.Scd.mergeUpsert(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "B"), (3L, "C")))
  }

  test("scd2: versions, tie-break, no-change collapse, one current per key") {
    def t(s: String) = Timestamp.valueOf(s)
    val log = Seq(
      // key 1: value changes 10→20, then a no-change observation
      (1L, t("2024-01-01 00:00:00"), 10.0, 100L),
      (1L, t("2024-01-02 00:00:00"), 20.0, 101L),
      (1L, t("2024-01-03 00:00:00"), 20.0, 102L),
      // key 2: two writers at the SAME ts — highest tie wins (30.0)
      (2L, t("2024-01-01 00:00:00"), 99.0, 200L),
      (2L, t("2024-01-01 00:00:00"), 30.0, 201L)
    ).toDF("k", "ts", "v", "eid")
    val hist = Scd.scd2FromChangeLog(log, "k", "ts", "v", "eid")
      .orderBy("k", "valid_from_us").collect()
    assert(hist.length == 3)
    val k1 = hist.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getDouble(1)).toSeq == Seq(10.0, 20.0))
    // first version closed exactly where the second opens
    assert(k1(0).getLong(3) == k1(1).getLong(2))
    assert(!k1(0).getBoolean(4) && k1(1).getBoolean(4))
    assert(k1(1).isNullAt(3)) // current row open-ended
    val k2 = hist.filter(_.getLong(0) == 2L)
    assert(k2.map(_.getDouble(1)).toSeq == Seq(30.0))
    assert(k2(0).getBoolean(4))
    // exactly one current row per key
    val curr = Scd.scd2FromChangeLog(log, "k", "ts", "v", "eid")
      .filter(col("is_current")).groupBy("k").count()
      .collect().map(_.getLong(1))
    assert(curr.forall(_ == 1L))
  }
}
