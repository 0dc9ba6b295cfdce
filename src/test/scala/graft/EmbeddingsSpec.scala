package graft

import org.apache.spark.sql.functions._

import graft.operators.Embeddings

/** VectorMean custom aggregate + embedding utilities. */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embeddings = Tables(spark, sf001, "embeddings")

  test("VectorMean aggregate == posexplode/avg reference") {
    val fast = Embeddings.centroids(embeddings, "label", "embedding")
      .select($"label", $"centroid")
      .as[(Int, Seq[Double])].collect().toMap
    val ref = embeddings
      .select($"label", posexplode($"embedding"))
      .groupBy($"label", $"pos")
      .agg(avg($"col").as("m"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"pos", $"m"))).as("pairs"))
      .select($"label", transform($"pairs", p => p("m")).as("centroid"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(fast.keySet == ref.keySet)
    fast.foreach { case (label, vec) =>
      vec.zip(ref(label)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label $label")
      }
    }
  }

  test("VectorMean survives partial/merge across many partitions") {
    val spread = embeddings.repartition(16)
    val a = Embeddings.centroids(spread, "label", "embedding")
      .select($"label", $"centroid").as[(Int, Seq[Double])].collect().toMap
    val b = Embeddings.centroids(embeddings.coalesce(1), "label", "embedding")
      .select($"label", $"centroid").as[(Int, Seq[Double])].collect().toMap
    a.foreach { case (l, v) =>
      v.zip(b(l)).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("VectorMeanFixed: BIT-identical across partitionings; ~float path") {
    // exact long accumulation => no tolerance needed, unlike the float
    // path's 1e-9 epsilon above
    val a = Embeddings.centroidsFixed(embeddings.repartition(16),
        "label", "embedding")
      .select($"label", $"centroid").as[(Int, Seq[Double])].collect().toMap
    val b = Embeddings.centroidsFixed(embeddings.coalesce(1),
        "label", "embedding")
      .select($"label", $"centroid").as[(Int, Seq[Double])].collect().toMap
    assert(a == b, "fixed-point centroid not bit-deterministic")

    // and it agrees with the float path to quantization precision
    val f = Embeddings.centroids(embeddings, "label", "embedding")
      .select($"label", $"centroid").as[(Int, Seq[Double])].collect().toMap
    a.foreach { case (l, v) =>
      v.zip(f(l)).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) }
    }
  }

  test("VectorMeanFixed refuses ragged and NULL-element input") {
    // the mean divides by the VECTOR count — ragged lengths or NULL
    // elements would quantize missing dims as +0 and silently diverge
    // from any per-dim-counting oracle
    val ragged = Seq(Tuple1(Array(1f, 2f)), Tuple1(Array(1f)))
      .toDF("v").coalesce(1)
    val ex = intercept[Exception] {
      ragged.agg(graft.functions.VectorAgg.vectorMeanFixed($"v")).collect()
    }
    assert(ex.getMessage.contains("ragged") ||
      Option(ex.getCause).exists(_.getMessage.contains("ragged")))
    val withNull = Seq(Tuple1(Array[java.lang.Float](1f, null))).toDF("v")
    val ex2 = intercept[Exception] {
      withNull.agg(graft.functions.VectorAgg.vectorMeanFixed($"v")).collect()
    }
    assert(ex2.getMessage.contains("NULL element") ||
      Option(ex2.getCause).exists(_.getMessage.contains("NULL element")))
  }

  test("VectorMeanFixed quantization: negatives round toward nearest") {
    // -0.35f widens to -0.34999999403…; *1e7 = -3499999.94… must round
    // AWAY to -3500000 (nearest), not truncate to -3499999. (True .5
    // ties cannot occur here: x*10^7 = k+1/2 needs a non-dyadic x,
    // which no float is — the ties-away branch matters only for the
    // documented std::round equivalence.)
    val df = Seq(Tuple1(Array(-0.35f, 0.15f))).toDF("v")
    val got = df.agg(graft.functions.VectorAgg.vectorMeanFixed($"v"))
      .as[Seq[Double]].head()
    assert(got == Seq(-3500000.0 / 1.0 / 1e7, 1500000.0 / 1.0 / 1e7),
      s"got $got")
  }

  test("normalize yields unit vectors; zero vector passes through") {
    val norms = embeddings
      .select(Embeddings.l2Norm(Embeddings.normalize($"embedding")).as("n"))
      .as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-4))
    val zero = Seq(Tuple1(Array(0f, 0f))).toDF("embedding")
      .select(Embeddings.normalize($"embedding")).as[Seq[Float]].head()
    assert(zero == Seq(0f, 0f))
  }

  test("centroidDistance: every row scored, same-label rows closer on average") {
    val scored = Embeddings.centroidDistance(embeddings, "label", "embedding")
    assert(scored.count() == embeddings.count())
    val avgCos = scored.agg(avg($"cosine_to_centroid")).as[Double].head()
    assert(avgCos > 0.0) // rows correlate positively with own centroid
  }
}
