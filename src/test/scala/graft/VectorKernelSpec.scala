package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

/** The narrow cell-ranking kernels (NearestCell / NearestCells /
  * NearestCellsCosine / NearestCellsDot) replaced crossJoin +
  * bounded-heap-rank / window subtrees in the IVF family. Each kernel
  * must reproduce the ORDER the exchange-based path produced —
  * same score arithmetic, same (score desc, cell asc) tie-break —
  * or assignments/probe sets silently drift from the specs that pin
  * recall. This spec replays both paths over real embeddings and a
  * crafted exact-tie matrix.
  */
class VectorKernelSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables(spark, sf001, "embeddings")
    .select($"vec_id", $"embedding")

  // a small centroid frame with an EXACT duplicate row (cells 2 and 5)
  // so the tie-break is actually exercised
  private val dims = 4
  private val cents: Seq[Seq[Float]] = Seq(
    Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f), Seq(0.5f, 0.5f, 0f, 0f),
    Seq(0f, 0f, 1f, 0f), Seq(0f, 0f, 0f, 1f), Seq(0.5f, 0.5f, 0f, 0f))
  private val flat = cents.flatten
  private def centDF = cents.zipWithIndex
    .map { case (c, i) => (i, c) }.toDF("cell", "centroid")

  private def vecs = Seq(
    (1L, Seq(0.9f, 0.1f, 0f, 0f)), (2L, Seq(0.5f, 0.5f, 0f, 0f)),
    (3L, Seq(0f, 0f, 0.7f, 0.7f)), (4L, Seq(0.51f, 0.49f, 0.1f, 0f)))
    .toDF("id", "nvec")

  test("nearestCells reproduces the topKRank (negDist desc, cell asc) " +
      "ranking, ties to the lowest cell") {
    val kernel = vecs.select($"id",
        posexplode(VectorFunctions.nearestCells($"nvec", flat, 6, dims, 6)))
      .select($"id", ($"pos" + 1).as("rank"), $"col".as("cell"))
      .orderBy($"id", $"rank").collect().map(_.toSeq).toSeq
    val negd = lit(2.0) * VectorFunctions.dotProduct($"nvec", $"centroid") -
      VectorFunctions.dotProduct($"centroid", $"centroid")
    val scored = vecs.crossJoin(broadcast(centDF))
      .select($"id".as("qid"), $"cell".cast("long").as("id"),
        negd.as("negd"))
    val viaAgg = Similarity.topKRank(scored, 6, "negd")
      .select($"qid".as("id"), $"rank", $"id".cast("int").as("cell"))
      .orderBy($"id", $"rank").collect().map(_.toSeq).toSeq
    assert(kernel == viaAgg)
    // the duplicate centroid pair must rank 2 before 5 for the vector
    // that lands on it exactly
    val v2 = kernel.filter(_.head == 2L).map(_(2))
    assert(v2.indexOf(2) < v2.indexOf(5),
      "exact tie must break to the lowest cell id")
  }

  test("nearestCellsCosine reproduces the (cosine desc, cell asc) " +
      "window ranking on real embeddings") {
    val q = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("id"), $"embedding".as("nvec"))
    val cents64 = emb.filter($"vec_id" % 97 === 0).limit(8)
      .select($"embedding").collect().map(_.getSeq[Float](0))
    val flat64 = cents64.flatten.toSeq
    val cdf = cents64.zipWithIndex.toSeq.map { case (c, i) => (i, c) }
      .toDF("cell", "centroid")
    val kernel = q.select($"id",
        posexplode(VectorFunctions.nearestCellsCosine(
          $"nvec", flat64, cents64.length, 64, 3)))
      .select($"id", $"pos", $"col".as("cell"))
      .orderBy($"id", $"pos").collect().map(_.toSeq).toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"id")
      .orderBy($"ccos".desc, $"cell".asc)
    val viaWindow = q.crossJoin(broadcast(cdf))
      .withColumn("ccos",
        VectorFunctions.cosineSim($"nvec", $"centroid"))
      .withColumn("prk", row_number().over(w)).filter($"prk" <= 3)
      .select($"id", ($"prk" - 1).as("pos"), $"cell")
      .orderBy($"id", $"pos").collect().map(_.toSeq).toSeq
    assert(kernel.nonEmpty && kernel == viaWindow)
  }

  test("nearestCellsDot reproduces the (dot desc, cell asc) window " +
      "ranking") {
    val kernel = vecs.select($"id",
        posexplode(VectorFunctions.nearestCellsDot($"nvec", flat, 6,
          dims, 4)))
      .select($"id", $"pos", $"col".as("cell"))
      .orderBy($"id", $"pos").collect().map(_.toSeq).toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"id")
      .orderBy($"qdotc".desc, $"cell".asc)
    val viaWindow = vecs.crossJoin(broadcast(centDF))
      .withColumn("qdotc",
        VectorFunctions.dotProduct($"nvec", $"centroid"))
      .withColumn("prk", row_number().over(w)).filter($"prk" <= 4)
      .select($"id", ($"prk" - 1).as("pos"), $"cell")
      .orderBy($"id", $"pos").collect().map(_.toSeq).toSeq
    assert(kernel == viaWindow)
  }

  test("nearestCell equals rank-1 of nearestCells") {
    val both = vecs.select(
        VectorFunctions.nearestCell($"nvec", flat, 6, dims).as("one"),
        VectorFunctions.nearestCells($"nvec", flat, 6, dims, 1)(0)
          .as("top"))
      .collect()
    assert(both.nonEmpty && both.forall(r => r.getInt(0) == r.getInt(1)))
  }
}
