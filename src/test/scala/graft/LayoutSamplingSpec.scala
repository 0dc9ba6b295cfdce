package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Layout, Sampling}

class LayoutSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2: known Morton codes") {
    val df = Seq((3L, 0L), (0L, 3L), (1L, 1L), (65535L, 65535L))
      .toDF("x", "y")
    val got = df.select(Layout.zValue2($"x", $"y").as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave: x bits at even positions, y bits at odd
    assert(got == Seq(5L, 10L, 3L, 4294967295L))
  }

  test("zorderBy: every partition covers a compact 2-D tile") {
    // 256x256 uniform grid, shuffled input order
    val grid = (for { x <- 0 until 256; y <- 0 until 256 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
      .repartition(16) // destroy any input locality
    val laid = Layout.zorderBy(grid, "x", "y", partitions = 16)
    val ranges = laid
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
      .collect()
    assert(ranges.length == 16)
    val avgX = ranges.map(_.getAs[Long]("xr")).sum.toDouble / ranges.length
    val avgY = ranges.map(_.getAs[Long]("yr")).sum.toDouble / ranges.length
    // 16 contiguous z-ranges over a 256x256 grid ≈ 64x64 tiles (range
    // boundaries may straddle one tile edge) — far below the 255 span
    // every partition would have under a single-column or random layout
    assert(avgX < 140, s"avg x-range $avgX")
    assert(avgY < 140, s"avg y-range $avgY")
    // row set unchanged
    assert(laid.count() == 256L * 256L)
  }

  test("stratified sample: deterministic, ≤n per stratum, matches window formulation") {
    val docs = Tables(spark, sf001, "documents")
    val s1 = Sampling.stratified(docs, "lang", "doc_id", 7)
      .collect().map(_.toSeq).toSet
    val s2 = Sampling.stratified(docs, "lang", "doc_id", 7)
      .collect().map(_.toSeq).toSet
    assert(s1 == s2 && s1.nonEmpty) // reproducible

    val w = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
      .orderBy(Sampling.idScore($"doc_id").asc, $"doc_id".asc)
    val viaWindow = docs
      .select($"lang".as("stratum"), $"doc_id".as("id"),
        row_number().over(w).as("rank"))
      .filter($"rank" <= 7)
      .collect().map(_.toSeq).toSet
    assert(s1 == viaWindow)

    // per-stratum cap holds
    val counts = Sampling.stratified(docs, "lang", "doc_id", 7)
      .groupBy("stratum").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 7))
  }

  test("capPerGroup: matches window formulation incl. score ties, keeps full rows") {
    val docs = Tables(spark, sf001, "documents")
    val capped = Sampling.capPerGroup(docs, "source", "doc_id",
      $"n_chars", n = 5)
    // full schema survives, plus rank
    assert(capped.columns.toSet == docs.columns.toSet + "rank")

    val mine = capped.select($"source", $"doc_id", $"rank")
      .collect().map(_.toSeq).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"source")
      .orderBy($"n_chars".cast("double").desc, $"doc_id".asc)
    val viaWindow = docs
      .select($"source", $"doc_id", row_number().over(w).as("rank"))
      .filter($"rank" <= 5)
      .collect().map(_.toSeq).toSet
    assert(mine == viaWindow && mine.nonEmpty)

    val counts = capped.groupBy("source").count()
      .collect().map(_.getLong(1))
    assert(counts.forall(_ <= 5))
  }

  test("capPerGroup plan: partial top-k heap runs before the group exchange") {
    val docs = Tables(spark, sf001, "documents")
    val plan = Sampling.capPerGroup(docs, "source", "doc_id",
      $"n_chars", n = 5).queryExecution.executedPlan.toString
    // the map-side prune is the whole scale argument: a partial
    // topkbyscore must appear (upstream of the grp exchange)
    assert(plan.contains("partial_topkbyscore"))
  }

  test("capPerGroup with n >= group size keeps every row") {
    val docs = Tables(spark, sf001, "documents")
    val capped = Sampling.capPerGroup(docs, "source", "doc_id",
      $"n_chars", n = 1000000)
    assert(capped.count() == docs.count())
  }

  test("winsorize: clamp stays inside [lo, hi], bounds are real group " +
      "values at the percentile-disc ranks, deciles are balanced") {
    val docs = Tables(spark, sf001, "documents")
      .select($"doc_id", $"lang", $"n_chars")
    val w = graft.operators.Winsorize.winsorize(
      docs, "lang", "n_chars", "doc_id").cache()
    assert(w.count() === docs.count())
    assert(w.filter($"clamped" < $"lo" || $"clamped" > $"hi").count() === 0)
    // untouched interior: values already inside the bounds pass through
    assert(w.filter($"n_chars" >= $"lo" && $"n_chars" <= $"hi" &&
      $"clamped" =!= $"n_chars").count() === 0)
    // bounds are actual member values of their group
    val boundsAreMembers = w.select($"lang", $"lo".as("v"))
      .union(w.select($"lang", $"hi".as("v"))).distinct()
      .join(docs.select($"lang", $"n_chars".as("v")).distinct(),
        Seq("lang", "v"), "left_anti").count()
    assert(boundsAreMembers === 0)
    // ntile balance: per group, decile sizes differ by at most 1
    val sizes = w.groupBy($"lang", $"decile").count()
      .groupBy($"lang").agg((max($"count") - min($"count")).as("spread"))
    assert(sizes.filter($"spread" > 1).count() === 0)
    w.unpersist()
  }

  test("winsorize NULL policy: NULL-group and NULL-value rows are " +
      "dropped explicitly; non-null rows unaffected by their presence") {
    val clean = Seq(
      ("en", 1L, 10.0), ("en", 2L, 20.0), ("en", 3L, 30.0),
      ("en", 4L, 40.0), ("en", 5L, 50.0),
      ("de", 6L, 1.0), ("de", 7L, 2.0), ("de", 8L, 3.0),
      ("de", 9L, 4.0), ("de", 10L, 5.0)
    ).toDF("grp", "id", "v")
    val dirty = clean.union(Seq[(String, Long, java.lang.Double)](
      (null, 11L, java.lang.Double.valueOf(99.0)), // NULL group
      ("en", 12L, null)                            // NULL value
    ).toDF("grp", "id", "v"))
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Winsorize.winsorize(df, "grp", "v", "id")
        .select($"grp", $"id", $"v", $"lo", $"hi", $"clamped", $"decile")
        .collect().map(_.toSeq).toSet
    val got = run(dirty)
    // the two NULL rows are gone, nothing else moved: ranks, bounds and
    // deciles of the clean rows are identical with or without them
    assert(got === run(clean))
    assert(got.size === 10 && !got.exists(r => r(0) == null || r(2) == null))
  }

  test("winsorizeApprox: sketch bounds within GK rank error of the " +
      "exact path; clamp/decile structurally sound; no window sort") {
    val docs = Tables(spark, sf001, "documents")
      .select($"doc_id", $"lang", $"n_chars")
    val w = graft.operators.Winsorize.winsorizeApprox(
      docs, "lang", "n_chars", accuracy = 10000).cache()
    assert(w.count() === docs.count())
    // clamp semantics identical to the exact path
    assert(w.filter($"clamped" < $"lo" || $"clamped" > $"hi").count() === 0)
    assert(w.filter($"n_chars" >= $"lo" && $"n_chars" <= $"hi" &&
      $"clamped" =!= $"n_chars").count() === 0)
    // decile: 1..10 and monotone in the value within each group
    assert(w.filter($"decile" < 1 || $"decile" > 10).count() === 0)
    val inversions = w.as("a").join(w.as("b"),
        $"a.lang" === $"b.lang" && $"a.n_chars" < $"b.n_chars" &&
          $"a.decile" > $"b.decile").count()
    assert(inversions === 0, "decile not monotone in value")
    // rank error bound: GK guarantees <= n/accuracy; group sizes here
    // are << accuracy, so the empirical CDF at each bound must sit
    // within one rank-convention step of the target percentile
    val err = w.groupBy($"lang").agg(
        count(lit(1)).as("n"),
        (sum(when($"n_chars" <= $"lo", 1L).otherwise(0L)) / count(lit(1)))
          .as("cdf_lo"),
        (sum(when($"n_chars" <= $"hi", 1L).otherwise(0L)) / count(lit(1)))
          .as("cdf_hi"))
      .withColumn("tol", lit(4.0) / $"n" + lit(0.03))
      .filter(abs($"cdf_lo" - 0.10) > $"tol" || abs($"cdf_hi" - 0.90) > $"tol")
    assert(err.count() === 0, s"bounds outside rank-error tolerance")
    // the 100 TB claim: the plan has NO window (rank/ntile) operator —
    // bounds come from an aggregate + broadcast join
    val plan = w.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sort in approx plan:\n$plan")
    w.unpersist()
  }

  test("leakageSafeSplit: no near-dup pair straddles splits; " +
      "singletons match plain hashSplit") {
    val docs = Tables(spark, sf001, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5)
      .select("id_a", "id_b").cache()
    val split = Sampling.leakageSafeSplit(docs, "doc_id", pairs)
      .select($"doc_id", $"split").cache()

    val straddling = pairs
      .join(split.select($"doc_id".as("id_a"), $"split".as("sa")), "id_a")
      .join(split.select($"doc_id".as("id_b"), $"split".as("sb")), "id_b")
      .filter($"sa" =!= $"sb").count()
    assert(straddling === 0 && pairs.count() > 0)

    // documents untouched by any pair split exactly like hashSplit —
    // cluster awareness must not perturb the rest of the corpus
    val members = pairs.select($"id_a".as("doc_id"))
      .union(pairs.select($"id_b".as("doc_id"))).distinct()
    val plain = Sampling.hashSplit(docs, "doc_id")
      .select($"doc_id", $"split".as("plain"))
    val drifted = split.join(members, Seq("doc_id"), "left_anti")
      .join(plain, "doc_id").filter($"split" =!= $"plain").count()
    assert(drifted === 0)
    pairs.unpersist(); split.unpersist()
  }

  test("tokenBudget: prefix rule known answer, hard cap, nesting, " +
      "per-group budgets") {
    // ids chosen so the idScore order within each group is NOT the id
    // order (scores: pseudo-random) — the spec recomputes the expected
    // prefix independently
    val rows = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 10L + (i % 7) * 5L))
    val df = rows.toDF("doc_id", "grp", "tk")
    def scoreOf(id: Long): Long = ((id % 1000003L) * 2654435761L) % 1000003L
    def expected(budget: Map[String, Long]): Set[Long] =
      rows.groupBy(_._2).flatMap { case (g, rs) =>
        val sorted = rs.sortBy(r => (scoreOf(r._1), r._1))
        val cum = sorted.scanLeft(0L)(_ + _._3).tail
        sorted.zip(cum).takeWhile(_._2 <= budget(g)).map(_._1._1)
      }.toSet
    val budgets = Map("a" -> 120L, "b" -> 200L)
    val got = Sampling.tokenBudget(df, "grp", "doc_id", $"tk", budgets)
      .select($"doc_id").as[Long].collect().toSet
    assert(got === expected(budgets))
    // hard cap: per-group kept token mass never exceeds its budget
    val mass = Sampling.tokenBudget(df, "grp", "doc_id", $"tk", budgets)
      .groupBy($"grp").agg(sum($"tk").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    mass.foreach { case (g, m) => assert(m <= budgets(g), s"$g over budget") }
    // nesting: smaller budget selects a strict prefix of the larger
    val small = Sampling.tokenBudget(df, "grp", "doc_id", $"tk",
      Map("a" -> 60L, "b" -> 90L)).select($"doc_id").as[Long].collect().toSet
    assert(small.subsetOf(got))
  }

  test("tokenBudgetThresholded: subset of exact, hard cap, shortfall " +
      "bounded by one score bucket, full-budget identity") {
    val rows = (1L to 60L).map(i =>
      (i, if (i % 3 == 0) "x" else "y", 5L + (i % 11) * 3L))
    val df = rows.toDF("doc_id", "grp", "tk")
    val budgets = Map("x" -> 100L, "y" -> 250L)
    val exact = Sampling.tokenBudget(df, "grp", "doc_id", $"tk", budgets)
    val thresh = Sampling.tokenBudgetThresholded(df, "grp", "doc_id",
      $"tk", budgets)
    val exactIds = exact.select($"doc_id").as[Long].collect().toSet
    val threshIds = thresh.select($"doc_id").as[Long].collect().toSet
    assert(threshIds.subsetOf(exactIds))
    // hard cap holds for the thresholded path too
    val tMass = thresh.groupBy($"grp").agg(sum($"tk").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    tMass.foreach { case (g, m) => assert(m <= budgets(g)) }
    // shortfall vs exact bounded by the heaviest (grp, score) bucket
    val eMass = exact.groupBy($"grp").agg(sum($"tk").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxBucket = df
      .groupBy($"grp", Sampling.idScore($"doc_id").as("s"))
      .agg(sum($"tk").as("bm"))
      .groupBy($"grp").agg(max($"bm").as("mb")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    eMass.foreach { case (g, em) =>
      assert(em - tMass.getOrElse(g, 0L) <= maxBucket(g),
        s"$g shortfall ${em - tMass.getOrElse(g, 0L)} > bucket ${maxBucket(g)}")
    }
    // budget >= total mass: both paths keep every row
    val total = rows.map(_._3).sum
    val all = Map("x" -> total, "y" -> total)
    assert(Sampling.tokenBudgetThresholded(df, "grp", "doc_id", $"tk", all)
      .count() === rows.size.toLong)
    assert(Sampling.tokenBudget(df, "grp", "doc_id", $"tk", all)
      .count() === rows.size.toLong)
    // plan pin — the variant's reason to exist: its Window runs over
    // the (group, score) AGGREGATE, never the documents (the exact
    // path's per-group sort is what it avoids)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val windows = thresh.queryExecution.optimizedPlan.collect {
      case w: LWindow => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.collectFirst { case a: Aggregate => a }.isDefined,
        "thresholded window must sort the bucket aggregate, not the corpus")
    }
  }

  test("shuffleRank: permutation 1..n equal to the naive global window; " +
      "bucket-count invariant; no global corpus window in the plan") {
    import org.apache.spark.sql.expressions.Window
    val ids = (1L to 5000L).filter(_ % 7 != 0) // gaps: ids ≠ ranks
    val df = ids.toDF("doc_id").repartition(8)
    val got = Sampling.shuffleRank(df, "doc_id", buckets = 64)
      .select($"doc_id", $"shuffle_rank")
    // equality with the naive single-window formulation
    val naive = df.withColumn("shuffle_rank",
      row_number().over(Window.orderBy(
        Sampling.idScore($"doc_id"), $"doc_id")).cast("long"))
    assert(got.exceptAll(naive).count() === 0L)
    assert(naive.exceptAll(got).count() === 0L)
    // permutation: ranks are exactly 1..n
    val ranks = got.select($"shuffle_rank").as[Long].collect().sorted
    assert(ranks.toSeq === (1L to ids.size.toLong))
    // bucket count cannot move results (contiguous ranges compose)
    val one = Sampling.shuffleRank(df, "doc_id", buckets = 1)
      .select($"doc_id", $"shuffle_rank")
    assert(got.exceptAll(one).count() === 0L)
    val many = Sampling.shuffleRank(df, "doc_id", buckets = 100000)
      .select($"doc_id", $"shuffle_rank")
    assert(got.exceptAll(many).count() === 0L)
    // plan pin: at the default bucket count, every UNPARTITIONED window
    // orders an aggregate (the ≤buckets offset rows), never the corpus;
    // the per-row rank window is partitioned (parallel)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = Sampling.shuffleRank(df, "doc_id").queryExecution.optimizedPlan
    val ws = plan.collect { case w: LWindow => w }
    assert(ws.nonEmpty)
    ws.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.collectFirst { case a: Aggregate => a }.isDefined,
        "global window must order the bucket-count aggregate, not rows")
    }
    assert(ws.exists(_.partitionSpec.nonEmpty),
      "the per-row rank window must be partitioned")
  }

  test("interleaveByWeight: exact prefix fairness, per-group rank " +
      "equals naive window, key monotone in rank, no float division") {
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 3000L).map(i =>
      (i, Seq("web", "code", "math")((i % 3).toInt)))
    val df = rows.toDF("doc_id", "src").repartition(8)
    val weights = Map("web" -> 3, "code" -> 2) // math gets default 1
    val out = Sampling.interleaveByWeight(df, "src", "doc_id", weights)
      .select($"doc_id", $"src", $"src_rank", $"interleave_key")
    // per-group rank == naive per-group window
    val naive = df.withColumn("src_rank",
      row_number().over(Window.partitionBy($"src")
        .orderBy(Sampling.idScore($"doc_id"), $"doc_id")).cast("long"))
    assert(out.select($"doc_id", $"src_rank")
      .exceptAll(naive.select($"doc_id", $"src_rank")).count() === 0L)
    // exact prefix fairness: a cut at key <= t holds floor(t*w/L) docs
    // of each group (L = lcm(3,2,1) = 6), until a group runs dry
    val collected = out.collect()
      .map(r => (r.getString(1), r.getLong(3))).toSeq
    val perGroup = collected.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nPer = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    for (t <- Seq(6L, 60L, 600L, 1200L)) {
      for ((g, wgt) <- Map("web" -> 3L, "code" -> 2L, "math" -> 1L)) {
        val got = perGroup(g).count(_ <= t).toLong
        val want = math.min(t * wgt / 6L, nPer(g))
        assert(got === want, s"group $g at cut $t: $got != $want")
      }
    }
    // key strictly monotone in src_rank within a group (order preserved)
    val viol = out.groupBy($"src").agg(
      max($"interleave_key" / $"src_rank").as("hi"),
      min($"interleave_key" / $"src_rank").as("lo"))
      .filter($"hi" =!= $"lo").count()
    assert(viol === 0L, "stride must be constant per group")
    // integer exactness: every key is rank * stride with stride in
    // {2, 3, 6}
    assert(collected.forall { case (g, k) =>
      k % Map("web" -> 2L, "code" -> 3L, "math" -> 6L)(g) == 0L })
  }

  test("composed-rank auto buckets: corpus-derived count, auto path " +
      "output-identical to explicit, knownCount skips nothing visible") {
    // the auto rule itself (Tune precedent: floored, capped)
    assert(graft.operators.Tune.scaledSortBuckets(0L, 4) === 4)
    assert(graft.operators.Tune.scaledSortBuckets(1L << 30, 4) === 1024)
    assert(graft.operators.Tune.scaledSortBuckets(Long.MaxValue / 4, 4)
      === 1000003)
    val ids = (1L to 4000L).filter(_ % 5 != 0)
    val df = ids.toDF("doc_id").repartition(8)
    val auto = Sampling.shuffleRank(df, "doc_id")
      .select($"doc_id", $"shuffle_rank")
    val explicit = Sampling.shuffleRank(df, "doc_id", buckets = 1024)
      .select($"doc_id", $"shuffle_rank")
    val known = Sampling.shuffleRank(df, "doc_id",
        knownCount = ids.size.toLong)
      .select($"doc_id", $"shuffle_rank")
    assert(auto.exceptAll(explicit).count() === 0L)
    assert(explicit.exceptAll(auto).count() === 0L)
    assert(auto.exceptAll(known).count() === 0L)
    // interleave: same invariance on its auto path
    val rows = (1L to 3000L).map(i =>
      (i, Seq("web", "code")((i % 2).toInt)))
    val idf = rows.toDF("doc_id", "src").repartition(8)
    val w = Map("web" -> 3, "code" -> 2)
    val ia = Sampling.interleaveByWeight(idf, "src", "doc_id", w)
      .select($"doc_id", $"src_rank", $"interleave_key")
    val ie = Sampling.interleaveByWeight(idf, "src", "doc_id", w,
        buckets = 777)
      .select($"doc_id", $"src_rank", $"interleave_key")
    assert(ia.exceptAll(ie).count() === 0L)
    assert(ie.exceptAll(ia).count() === 0L)
  }

  test("epoch reshuffle: each epoch a fresh permutation, epoch 0 " +
      "bit-identical to shuffleRank, orders genuinely differ") {
    import org.apache.spark.sql.expressions.Window
    val ids = (1L to 3000L).filter(_ % 3 != 0)
    val df = ids.toDF("doc_id").repartition(8)
    def ranks(e: Int): Map[Long, Long] =
      Sampling.shuffleRank(df, "doc_id", epoch = e)
        .select($"doc_id", $"shuffle_rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e0 = ranks(0); val e1 = ranks(1); val e3 = ranks(3)
    // epoch 0 == the original operator (same multiplier)
    val orig = Sampling.shuffleRank(df, "doc_id")
      .select($"doc_id", $"shuffle_rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e0 === orig)
    // each epoch is a permutation 1..n
    Seq(e0, e1, e3).foreach { m =>
      assert(m.values.toSeq.sorted === (1L to ids.size.toLong)) }
    // epochs genuinely reshuffle (greater-than-rotation difference:
    // a rotation keeps most ADJACENT pairs adjacent; count preserved
    // successor pairs — must be near zero for an affine re-key)
    def successorPreserved(a: Map[Long, Long], b: Map[Long, Long]): Int = {
      val byRankA = a.toSeq.map(_.swap).toMap
      (1L until ids.size.toLong).count { r =>
        b(byRankA(r + 1)) == b(byRankA(r)) + 1
      }
    }
    assert(e0 !== e1); assert(e1 !== e3)
    assert(successorPreserved(e0, e1) < ids.size / 10,
      "epoch 1 must not be a near-rotation of epoch 0")
    // replay equality vs the naive window with the same multiplier
    val naive = df.withColumn("shuffle_rank",
      row_number().over(Window.orderBy(
        Sampling.epochScore($"doc_id", 3), $"doc_id")).cast("long"))
      .select($"doc_id", $"shuffle_rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e3 === naive)
  }

  test("qualityMass: prefix rule on descending score, exact fraction " +
      "cap, nesting; thresholded subset truncated at a score boundary") {
    val rows = (1L to 2000L).map(i =>
      (i, Seq("web", "code")((i % 2).toInt), (i * 37 % 97) + 1))
    val df = rows.toDF("doc_id", "src", "q").repartition(8)
    val kept = Sampling.qualityMass(df, "src", "doc_id", $"q",
      Map("web" -> 50), defaultPct = 80)
    val got = kept.select($"doc_id", $"src", $"cum_mass", $"grp_mass")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(got.nonEmpty)
    // hard cap: kept mass per group <= pct% of total, and the naive
    // recomputation agrees row for row
    val totals = rows.groupBy(_._2).view
      .mapValues(_.map(_._3.toLong).sum).toMap
    val keptMass = got.groupBy(_._2).view
      .mapValues(_.map { case (id, _, _, _) =>
        rows.find(_._1 == id).get._3.toLong }.sum).toMap
    assert(keptMass("web") * 100 <= totals("web") * 50)
    assert(keptMass("code") * 100 <= totals("code") * 80)
    // naive driver-side replay: sort by (q desc, idScore, id), prefix
    def naiveKeep(src: String, pct: Int): Set[Long] = {
      def hscore(id: Long) = ((id % 1000003L) * 2654435761L) % 1000003L
      val grp = rows.filter(_._2 == src)
        .sortBy { case (id, _, q) => (-q, hscore(id), id) }
      val total = grp.map(_._3.toLong).sum
      var cum = 0L
      grp.takeWhile { case (_, _, q) =>
        cum += q; cum * 100 <= total * pct }.map(_._1).toSet
    }
    assert(got.filter(_._2 == "web").map(_._1).toSet ===
      naiveKeep("web", 50))
    assert(got.filter(_._2 == "code").map(_._1).toSet ===
      naiveKeep("code", 80))
    // nesting: pct 30 ⊆ pct 50 per group
    val tighter = Sampling.qualityMass(df, "src", "doc_id", $"q",
        Map("web" -> 30), defaultPct = 50)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val looser = Sampling.qualityMass(df, "src", "doc_id", $"q",
        Map("web" -> 50), defaultPct = 80)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(tighter.subsetOf(looser))
    // thresholded: subset of exact, and the boundary is a score value —
    // every dropped-but-exact-kept doc shares the group's cut score
    val approx = Sampling.qualityMassThresholded(df, "src", "doc_id",
        $"q", Map("web" -> 50), defaultPct = 80)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val exact = looser
    assert(approx.subsetOf(exact))
    val q = rows.map(r => r._1 -> r._3).toMap
    val dropped = exact -- approx
    dropped.groupBy(id => rows.find(_._1 == id).get._2).foreach {
      case (_, ids) =>
        assert(ids.map(q).size === 1,
          "thresholded may only stop one partial score bucket early")
    }
  }

  test("mixToTokenShares: exact integer rate derivation, keep rule " +
      "matches the hash replay, nesting under share increases") {
    // group a: 1000 tokens over 100 docs, group b: 3000 over 300 —
    // total 4000. share(a)=500‰ → rate min(1000, 4000·500/1000)=1000
    // (kept whole); share(b)=250‰ → 4000·250/3000 = 333‰.
    val rows = (1L to 100L).map(i => (i, "a", 10L)) ++
      (101L to 400L).map(i => (i, "b", 10L))
    val df = rows.toDF("doc_id", "src", "tk").repartition(4)
    val out = Sampling.mixToTokenShares(df, "src", "doc_id", $"tk",
      Map("a" -> 500, "b" -> 250))
    val rates = out.groupBy($"src").agg(min($"rate_pm").as("r"),
        max($"rate_pm").as("r2"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rates("a") === ((1000L, 1000L)))
    assert(rates("b") === ((333L, 333L)))
    // the keep rule is exactly the idScore hash replay
    def hpm(id: Long) = ((id % 1000003L) * 2654435761L) % 1000003L % 1000L
    val expect = rows.filter { case (id, g, _) =>
      hpm(id) < (if (g == "a") 1000L else 333L) }.map(_._1).toSet
    assert(out.select($"doc_id").collect().map(_.getLong(0)).toSet
      === expect)
    // group a kept whole (rate 1000 keeps every hash value)
    assert(expect.count(_ <= 100L) === 100)
    // nesting: a smaller share keeps a subset
    val tighter = Sampling.mixToTokenShares(df, "src", "doc_id", $"tk",
        Map("a" -> 500, "b" -> 100))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(tighter.subsetOf(expect))
    // absent groups keep everything
    val noTargets = Sampling.mixToTokenShares(df, "src", "doc_id", $"tk",
      Map.empty)
    assert(noTargets.count() === rows.size.toLong)
  }

  test("interleave overflow safety: gcd-normalized weights, pathological " +
      "lcm rejected loudly, per-row key overflow raises") {
    val rows = (1L to 600L).map(i =>
      (i, Seq("web", "code")((i % 2).toInt)))
    val df = rows.toDF("doc_id", "src").repartition(4)
    // {300, 200} must compute exactly what {3, 2} computes — the
    // interleave order depends only on weight ratios
    val big = Sampling.interleaveByWeight(df, "src", "doc_id",
        Map("web" -> 300, "code" -> 200), defaultWeight = 100)
      .select($"doc_id", $"src_rank", $"interleave_key")
    val small = Sampling.interleaveByWeight(df, "src", "doc_id",
        Map("web" -> 3, "code" -> 2), defaultWeight = 1)
      .select($"doc_id", $"src_rank", $"interleave_key")
    assert(big.exceptAll(small).count() === 0L)
    assert(small.exceptAll(big).count() === 0L)
    // a coprime weight set whose lcm overflows Long is refused at plan
    // time, not silently wrapped (three ~2^31 primes multiply past 2^63)
    intercept[IllegalArgumentException] {
      Sampling.interleaveByWeight(df, "src", "doc_id",
        Map("web" -> 2147483647, "code" -> 2147483629),
        defaultWeight = 2147483587, buckets = 4)
    }
    // rank × stride past Long.MaxValue raises per row instead of
    // wrapping: three coprime ~1e6 weights give lcm ≈ 1.0e18 (fits),
    // so the default-weight-1 group's stride IS the lcm and its rank 10
    // already overflows
    val rows4 = (1L to 800L).map(i =>
      (i, Seq("web", "code", "math", "misc")((i % 4).toInt)))
    val df4 = rows4.toDF("doc_id", "src").repartition(4)
    val ex = intercept[Exception] {
      Sampling.interleaveByWeight(df4, "src", "doc_id",
        Map("web" -> 1000003, "code" -> 1000033, "math" -> 1000037),
        defaultWeight = 1, buckets = 4)
        .select($"interleave_key").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("interleave_key overflow")),
      s"expected the overflow guard, got: ${msgs(ex).mkString(" | ")}")
  }

  test("upsampleEpochs: per-group multiplicity exact, epoch-0 key " +
      "bit-identical to idScore, every copy keyed by its epoch's " +
      "multiplier, no shuffle in the plan") {
    val rows = (1L to 900L).map(i =>
      (i, Seq("en", "zh", "misc")((i % 3).toInt)))
    val df = rows.toDF("doc_id", "lang").repartition(4)
    val out = Sampling.upsampleEpochs(df, "lang", "doc_id",
      Map("en" -> 3, "zh" -> 2), defaultEpochs = 1)
    // multiplicity: 3 copies of en, 2 of zh, 1 of misc
    val perLang = out.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang === Map("en" -> 900L, "zh" -> 600L, "misc" -> 300L))
    // each copy carries its epoch's affine key — replay epochScore
    // row-by-row against the Scala multiplier function
    val bad = out.filter($"sample_key" =!=
      pmod(pmod($"doc_id", lit(1000003L)) *
        (when($"epoch" === 0L, lit(Sampling.epochMultiplier(0)))
          .when($"epoch" === 1L, lit(Sampling.epochMultiplier(1)))
          .otherwise(lit(Sampling.epochMultiplier(2)))), lit(1000003L)))
    assert(bad.count() === 0L)
    // epoch 0 == idScore exactly (a 1-epoch recipe serializes like
    // shuffleRank's order)
    assert(out.filter($"epoch" === 0L)
      .filter($"sample_key" =!= Sampling.idScore($"doc_id"))
      .count() === 0L)
    // the operator is a generator + projection: nothing shuffles (the
    // plan check runs on an un-repartitioned input — the test frame's
    // own repartition would otherwise show up as the only Exchange)
    val flatPlan = Sampling.upsampleEpochs(rows.toDF("doc_id", "lang"),
        "lang", "doc_id", Map("en" -> 3, "zh" -> 2))
      .queryExecution.executedPlan.toString
    assert(!flatPlan.contains("Exchange"), "upsampleEpochs must not shuffle")
  }

  test("prefixMass: equals the naive global window cumsum; bucket-count " +
      "invariant; global window orders the bucket aggregate only") {
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 4000L).filter(_ % 5 != 0).map(i => (i, (i % 97) + 1))
    val df = rows.toDF("doc_id", "m").repartition(8)
    val got = Sampling.prefixMass(df, "doc_id", $"m", buckets = 64)
      .select($"doc_id", $"cum_mass")
    val naive = df.withColumn("cum_mass",
        org.apache.spark.sql.functions.sum($"m".cast("long")).over(
          Window.orderBy(Sampling.idScore($"doc_id"), $"doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"doc_id", $"cum_mass")
    assert(got.exceptAll(naive).count() === 0L &&
      naive.exceptAll(got).count() === 0L)
    // bucket count affects parallelism only, never the sums
    for (b <- Seq(1, 7, 100000)) {
      val other = Sampling.prefixMass(df, "doc_id", $"m", buckets = b)
        .select($"doc_id", $"cum_mass")
      assert(got.exceptAll(other).count() === 0L, s"buckets=$b diverged")
    }
    // auto path (corpus-derived bucket count) is output-identical too
    val auto = Sampling.prefixMass(df, "doc_id", $"m")
      .select($"doc_id", $"cum_mass")
    assert(got.exceptAll(auto).count() === 0L)
    // scale-shape pin: the only UNPARTITIONED window orders the
    // ≤buckets offset aggregate, never the corpus
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = Sampling.prefixMass(df, "doc_id", $"m")
      .queryExecution.optimizedPlan
    val ws = plan.collect { case w: LWindow => w }
    assert(ws.nonEmpty)
    ws.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.collectFirst { case a: Aggregate => a }.isDefined,
        "global window must order the bucket aggregate, not rows")
    }
    assert(ws.exists(_.partitionSpec.nonEmpty),
      "the per-row cumsum window must be partitioned")
  }

  test("systematicSample: kept mass within one document of total/step, " +
      "picks sum to total div step, heavy rows always kept, " +
      "sample nests as the step shrinks") {
    val rows = (1L to 3000L).map(i => (i, (i % 211) + 1))
    val df = rows.toDF("doc_id", "w").repartition(8)
    val total = rows.map(_._2).sum
    val step = 1500L
    val got = Sampling.systematicSample(df, "doc_id", $"w", step,
      buckets = 32)
    // every multiple of step in (0, total] is covered exactly once
    assert(got.agg(org.apache.spark.sql.functions.sum($"picks"))
      .head().getLong(0) === total / step)
    // a row heavier than step is always selected
    val heavy = Sampling.systematicSample(
      Seq((1L, 10L), (2L, 5000L), (3L, 10L)).toDF("doc_id", "w"),
      "doc_id", $"w", step, buckets = 4)
    assert(heavy.filter($"doc_id" === 2L).count() === 1L &&
      heavy.filter($"doc_id" === 2L).head().getAs[Long]("picks") >= 3L)
    // halving the step only ADDS rows (multiples of 2k ⊂ multiples of k)
    val denser = Sampling.systematicSample(df, "doc_id", $"w", step / 2,
      buckets = 32)
    assert(got.select($"doc_id")
      .exceptAll(denser.select($"doc_id")).count() === 0L)
    // per-GROUP lines: every group's picks cover exactly its own
    // total div step multiples — no group crowds another out
    val grouped = (1L to 3000L).map(i =>
      (i, Seq("a", "b", "c")((i % 3).toInt), (i % 211) + 1))
      .toDF("doc_id", "g", "w")
    val gs = Sampling.systematicSample(grouped, "doc_id", $"w", 700L,
      buckets = 16, groupCols = Seq("g"))
      .groupBy($"g")
      .agg(org.apache.spark.sql.functions.sum($"picks").as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = (1L to 3000L).map(i =>
        (Seq("a", "b", "c")((i % 3).toInt), (i % 211) + 1))
      .groupBy(_._1).map { case (g, v) => g -> v.map(_._2).sum / 700L }
    assert(gs === expect)
  }

  test("writeShards: manifest matches the corpus exactly; shard ids " +
      "contiguous from 0; every shard within one document of the " +
      "target mass; re-run reproduces the layout bit-for-bit") {
    import graft.operators.Shards
    val rows = (1L to 2000L).map(i => (i, (i % 301) + 20))
    val df = rows.toDF("doc_id", "m").repartition(8)
    val out = tmpDir("shards-spec")
    val shardMass = 25000L
    val manifest = Shards.writeShards(df, out, "doc_id", $"m", shardMass,
      buckets = 16)
    val man = manifest.collect().map(r => (r.getAs[Long]("shard"),
      r.getAs[Long]("docs"), r.getAs[Long]("mass"))).sortBy(_._1)
    // nothing lost, nothing duplicated
    assert(man.map(_._2).sum === rows.size.toLong)
    assert(man.map(_._3).sum === rows.map(_._2).sum)
    // contiguous ids from 0 (a doc starts in every shard)
    assert(man.map(_._1).toSeq === (0L until man.length).toSeq)
    // size target: every shard's mass stays within one document of the
    // target (greedy boundary; the last shard may be short)
    val maxDoc = rows.map(_._2).max
    man.dropRight(1).foreach { case (sid, _, mass) =>
      assert(mass >= shardMass - maxDoc && mass < shardMass + maxDoc,
        s"shard $sid mass $mass outside [target−maxDoc, target+maxDoc)")
    }
    // within-shard rows are contiguous on the mass line: max cum of
    // shard k < min cum of shard k+1
    val readBack = spark.read.parquet(out)
      .groupBy($"shard".cast("long").as("shard"))
      .agg(org.apache.spark.sql.functions.min($"cum_mass").as("lo"),
        org.apache.spark.sql.functions.max($"cum_mass").as("hi"))
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("lo"),
        r.getAs[Long]("hi"))).sortBy(_._1)
    readBack.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
    // deterministic re-run: same shards, same manifest
    val out2 = tmpDir("shards-spec-rerun")
    val manifest2 = Shards.writeShards(df, out2, "doc_id", $"m",
      shardMass, buckets = 16)
    assert(manifest.exceptAll(manifest2).count() === 0L &&
      manifest2.exceptAll(manifest).count() === 0L)
    // the loader path: readShard(k) is partition-PRUNED — one shard
    // directory survives the listing, and its docs/mass match the
    // manifest row exactly
    val k = man(1)._1
    val one = Shards.readShard(spark, out, k)
    // APPEND a batch: base shards untouched byte-for-byte, new shards
    // number from maxShard+1, manifest totals extend exactly
    val batch = (3001L to 3400L).map(i => (i, (i % 301) + 20))
      .toDF("doc_id", "m")
    val baseMax = man.last._1
    val before = spark.read.parquet(out).filter($"shard" <= baseMax)
      .orderBy($"doc_id").collect().toSeq
    val manifest3 = Shards.appendShards(batch, out, "doc_id", $"m",
      shardMass, buckets = 16)
    val man3 = manifest3.collect().map(r => (r.getAs[Long]("shard"),
      r.getAs[Long]("docs"), r.getAs[Long]("mass"))).sortBy(_._1)
    assert(man3.map(_._2).sum === rows.size.toLong + 400L)
    assert(man3.takeWhile(_._1 <= baseMax).toSeq === man.toSeq,
      "existing shards' manifest rows must be unchanged by an append")
    assert(man3.map(_._1).toSeq === (0L until man3.length).toSeq,
      "appended shards must continue the numbering contiguously")
    val after = spark.read.parquet(out).filter($"shard" <= baseMax)
      .orderBy($"doc_id").collect().toSeq
    assert(before === after, "append must not rewrite existing shards")
    // re-appending the same batch is idempotent (same dirs rewritten)
    val manifest4 = Shards.appendShards(batch, out, "doc_id", $"m",
      shardMass, buckets = 16)
    // the second append offsets from the FIRST append's max shard, so
    // it writes new dirs — appendShards is append-only by contract;
    // replaying a batch is the caller's dedup problem (ingest stage 3)
    assert(manifest4.count() > man3.length.toLong)

    // sparkPlan (pre-AQE): the adaptive wrapper hides the scan leaf
    // until execution
    val scanParts = one.queryExecution.sparkPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(scanParts === Some(1),
      s"readShard must prune to one partition, scanned $scanParts")
    assert(one.count() === man(1)._2)
    assert(one.agg(org.apache.spark.sql.functions.sum($"doc_mass"))
      .head().getLong(0) === man(1)._3)
  }

  test("compactShards: folds the small tail into target-mass shards; " +
      "corpus preserved row-for-row; manifest describes exactly what " +
      "is on disk; deterministic; < 2 small shards is a no-op") {
    import graft.operators.Shards
    import org.apache.spark.sql.functions.sum
    val shardMass = 25000L
    val out = tmpDir("shards-compact")
    val base = (1L to 2000L).map(i => (i, (i % 301) + 20))
      .toDF("doc_id", "m")
    Shards.writeShards(base, out, "doc_id", $"m", shardMass,
      buckets = 16): Unit
    // three small arrivals -> three tiny tail shards (the accumulation
    // compaction exists to stop)
    (0 until 3).foreach { k =>
      val b = (3001L + k * 40L to 3040L + k * 40L).map(i =>
        (i, (i % 301) + 20)).toDF("doc_id", "m")
      Shards.appendShards(b, out, "doc_id", $"m", shardMass,
        buckets = 16): Unit
    }
    val before = Shards.readManifest(spark, out).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("docs"),
        r.getAs[Long]("mass")))
    val smallBefore = before.filter(_._3 < shardMass / 2)
    assert(smallBefore.length >= 3,
      s"appends must have accumulated small shards: ${before.toSeq}")
    val totalDocs = before.map(_._2).sum
    val totalMass = before.map(_._3).sum
    val corpusBefore = spark.read.parquet(out)
      .select($"doc_id", $"doc_mass").orderBy($"doc_id").collect().toSeq

    val man = Shards.compactShards(spark, out, "doc_id", shardMass)
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("docs"),
        r.getAs[Long]("mass"))).sortBy(_._1)
    // nothing lost, nothing duplicated — (doc_id, doc_mass) multiset
    // identical before/after the fold
    assert(man.map(_._2).sum === totalDocs)
    assert(man.map(_._3).sum === totalMass)
    val corpusAfter = spark.read.parquet(out)
      .select($"doc_id", $"doc_mass").orderBy($"doc_id").collect().toSeq
    assert(corpusAfter === corpusBefore)
    // the small set shrank: folded into at most ceil(smallMass/target)
    // target-mass shards (+1 short tail)
    val smallAfter = man.filter(_._3 < shardMass / 2)
    assert(smallAfter.length <= 1,
      s"fold must leave at most one short tail: ${man.toSeq}")
    // manifest ≡ disk: the shard= dirs on disk are exactly the
    // manifest's ids, and per-shard (docs, mass) agree
    val disk = spark.read.parquet(out)
      .groupBy($"shard".cast("long").as("shard"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("docs"),
        sum($"doc_mass").as("mass"))
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("docs"),
        r.getAs[Long]("mass"))).sortBy(_._1)
    assert(disk.toSeq === man.toSeq,
      "manifest must describe exactly what is on disk")
    // readCorpus (manifest-directed) agrees with the raw read
    assert(Shards.readCorpus(spark, out).count() === totalDocs)
    // compacting again: the fold left < 2 small shards -> no-op
    val man2 = Shards.compactShards(spark, out, "doc_id", shardMass)
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("docs"),
        r.getAs[Long]("mass"))).sortBy(_._1)
    assert(man2.toSeq === man.toSeq, "a compacted layout is a fixpoint")
  }

  test("shard layout crash shapes: a crashed append's orphan dirs are " +
      "healed before the next (smaller) append numbers; an interrupted " +
      "compaction's retracted dirs never reach readCorpus") {
    import graft.operators.Shards
    import org.apache.spark.sql.functions.sum
    val shardMass = 25000L
    val out = tmpDir("shards-crash")
    val base = (1L to 1000L).map(i => (i, (i % 301) + 20))
      .toDF("doc_id", "m")
    val man0 = Shards.writeShards(base, out, "doc_id", $"m", shardMass,
      buckets = 16)
    val max0 = man0.agg(org.apache.spark.sql.functions.max($"shard"))
      .head().getLong(0)
    val docs0 = man0.agg(sum($"docs")).head().getLong(0)
    // simulate the crash window: a big append wrote shard dirs but died
    // before the manifest pointer flip — orphan dirs above the
    // committed max, absent from the manifest
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = new org.apache.hadoop.fs.Path(out, s"shard=$max0")
    Seq(max0 + 1, max0 + 2).foreach { orphan =>
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
        new org.apache.hadoop.fs.Path(out, s"shard=$orphan"),
        false, spark.sparkContext.hadoopConfiguration): Unit
    }
    // raw read now disagrees with the manifest (the divergence the
    // round-14 verdict filed); readCorpus must already be exact
    assert(Shards.readCorpus(spark, out).count() === docs0)
    assert(spark.read.parquet(out).count() > docs0)
    // the next append carries a SMALLER batch (one shard) — it must
    // heal the orphans, then number from the COMMITTED max
    val b = (5001L to 5050L).map(i => (i, (i % 301) + 20))
      .toDF("doc_id", "m")
    val man1 = Shards.appendShards(b, out, "doc_id", $"m", shardMass,
      buckets = 16)
    val ids = man1.select($"shard".cast("long")).collect()
      .map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L to max0 + 1).toSeq,
      "append must heal orphans and continue numbering from the " +
        s"committed max: ${ids.toSeq}")
    assert(man1.agg(sum($"docs")).head().getLong(0) === docs0 + 50L)
    // corpus ≡ manifest again, by raw read too
    assert(spark.read.parquet(out).count() === docs0 + 50L)

    // interrupted COMPACTION: sources retracted from the committed
    // manifest but their dirs not yet deleted — stage it by copying a
    // small dir back after the fold
    (0 until 2).foreach { k =>
      val bb = (6001L + k * 40L to 6040L + k * 40L).map(i =>
        (i, (i % 301) + 20)).toDF("doc_id", "m")
      Shards.appendShards(bb, out, "doc_id", $"m", shardMass,
        buckets = 16): Unit
    }
    val manPre = Shards.readManifest(spark, out)
    val smallIds = manPre.filter($"mass" < shardMass / 2)
      .select($"shard".cast("long")).collect().map(_.getLong(0))
    assert(smallIds.length >= 2)
    val keep = new org.apache.hadoop.fs.Path(out, s"shard=${smallIds.head}")
    val stash = new org.apache.hadoop.fs.Path(out + "-stash")
    org.apache.hadoop.fs.FileUtil.copy(fs, keep, fs, stash, false,
      spark.sparkContext.hadoopConfiguration): Unit
    val manC = Shards.compactShards(spark, out, "doc_id", shardMass)
    val total = manC.agg(sum($"docs")).head().getLong(0)
    org.apache.hadoop.fs.FileUtil.copy(fs, stash, fs, keep, true,
      spark.sparkContext.hadoopConfiguration): Unit
    // the retracted dir is back on disk; manifest-directed read is
    // exact, and the next mutation's heal removes it for raw readers
    assert(Shards.readCorpus(spark, out).count() === total)
    assert(Shards.healLayout(spark, out) === Seq(smallIds.head))
    assert(spark.read.parquet(out).count() === total)
  }

  test("writeShards bootstraps from an EMPTY corpus (empty committed " +
      "manifest, no dirs) and appendShards grows it from shard 0") {
    import graft.operators.Shards
    import org.apache.spark.sql.functions.sum
    val out = tmpDir("shards-bootstrap")
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "m")
    val man0 = Shards.writeShards(empty, out, "doc_id", $"m", 25000L,
      buckets = 4)
    assert(man0.count() === 0L,
      "empty corpus must commit an empty manifest")
    assert(man0.columns.toSeq === Seq("shard", "docs", "mass"))
    // an empty append against the empty layout is a committed no-op
    val manE = Shards.appendShards(empty, out, "doc_id", $"m", 25000L,
      buckets = 4)
    assert(manE.count() === 0L)
    // first real batch numbers from 0
    val b = (1L to 200L).map(i => (i, (i % 301) + 20)).toDF("doc_id", "m")
    val man1 = Shards.appendShards(b, out, "doc_id", $"m", 25000L,
      buckets = 4)
    assert(man1.select($"shard".cast("long")).collect().map(_.getLong(0))
      .min === 0L)
    assert(man1.agg(sum($"docs")).head().getLong(0) === 200L)
  }

  test("qualityMassBy: independent score/mass axes — keeps the " +
      "best-scoring docs until the MASS fraction; negative scores " +
      "order correctly; selection nests across pct; negative mass " +
      "raises") {
    // group g: scores 5,3,-1,-4 with masses 10,30,20,40 (total 100)
    val df = Seq(
      (1L, "g", 5L, 10L), (2L, "g", 3L, 30L),
      (3L, "g", -1L, 20L), (4L, "g", -4L, 40L),
      (5L, "h", -2L, 50L), (6L, "h", -9L, 50L)
    ).toDF("doc_id", "grp", "s", "m")
    def kept(pct: Int): Set[Long] =
      Sampling.qualityMassBy(df, "grp", "doc_id", $"s", $"m",
        Map.empty, defaultPct = pct).select($"doc_id").as[Long]
        .collect().toSet
    // 40%: g keeps docs 1 (cum 10) and 2 (cum 40); doc 3 would be 60.
    // h keeps doc 5 (its better NEGATIVE score; cum 50 = 50 > 40? no —
    // 50*100 <= 100*40 is false) -> h keeps nothing at 40
    assert(kept(40) === Set(1L, 2L))
    // 50%: h's best doc now fits exactly (50*100 <= 100*50)
    assert(kept(50) === Set(1L, 2L, 5L))
    // nesting: every pct-40 doc survives at 60 and 100
    assert(kept(40).subsetOf(kept(60)) && kept(60).subsetOf(kept(100)))
    assert(kept(100) === Set(1L, 2L, 3L, 4L, 5L, 6L))
    val ex = intercept[Exception] {
      Sampling.qualityMassBy(
        Seq((1L, "g", 1L, -5L)).toDF("doc_id", "grp", "s", "m"),
        "grp", "doc_id", $"s", $"m", Map.empty).collect()
    }
    def msg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" ")
    assert(msg(ex).contains("negative mass"))
    // the thresholded scale path: kept set is a SUBSET of the exact
    // prefix (truncated at a score-value boundary) with the same
    // nesting, and its plan has no per-document window — the only
    // sort runs over the (group, score) bucket aggregate
    val big = (1L to 500L).map(i =>
      (i, s"g${i % 3}", (i * 37 % 101) - 50, (i % 40) + 1))
      .toDF("doc_id", "grp", "s", "m")
    def exact(pct: Int): Set[Long] =
      Sampling.qualityMassBy(big, "grp", "doc_id", $"s", $"m",
        Map.empty, pct).select($"doc_id").as[Long].collect().toSet
    def approx(pct: Int): Set[Long] =
      Sampling.qualityMassByThresholded(big, "grp", "doc_id", $"s",
        $"m", Map.empty, pct).select($"doc_id").as[Long].collect().toSet
    Seq(30, 60, 90).foreach { pct =>
      assert(approx(pct).subsetOf(exact(pct)),
        s"thresholded must be a subset of exact at pct=$pct")
    }
    assert(approx(30).subsetOf(approx(60)) &&
      approx(60).subsetOf(approx(90)))
  }

  test("prefixMass guards: a negative mass raises per-row instead of " +
      "silently corrupting the mass line; only the UNGROUPED offsets " +
      "frame carries a broadcast hint") {
    val df = Seq((1L, 10L), (2L, -5L), (3L, 7L)).toDF("doc_id", "m")
    val ex = intercept[Exception] {
      Sampling.prefixMass(df, "doc_id", $"m").collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" "))
    assert(rootMsg(ex).contains("negative mass"),
      s"expected the negative-mass guard, got: ${rootMsg(ex)}")
    // hint audit: unbounded groups x buckets must not be forced
    // through the driver (AQE decides at runtime); the ungrouped
    // ≤buckets frame keeps the hint
    def hasHint(d: org.apache.spark.sql.DataFrame): Boolean =
      d.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    val ok = Seq((1L, 10L, "a"), (2L, 5L, "b")).toDF("doc_id", "m", "g")
    assert(hasHint(Sampling.prefixMass(ok, "doc_id", $"m")))
    assert(!hasHint(Sampling.prefixMass(ok, "doc_id", $"m",
      groupCols = Seq("g"))))
    // grouped result stays exact without the hint
    val big = (1L to 600L).map(i => (i, (i % 50) + 1L,
      s"g${i % 7}")).toDF("doc_id", "m", "g")
    val got = Sampling.prefixMass(big, "doc_id", $"m",
        groupCols = Seq("g"))
      .groupBy($"g")
      .agg(org.apache.spark.sql.functions.max($"cum_mass").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = (1L to 600L).map(i => (s"g${i % 7}", (i % 50) + 1L))
      .groupBy(_._1).map { case (g, v) => g -> v.map(_._2).sum }
    assert(got === want)
  }
}
