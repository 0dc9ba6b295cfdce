package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg
import graft.operators.Similarity

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random scores with deliberate ties: score is
  // quantized to 1 decimal so many (qid, id) pairs collide on score and
  // exercise the id-ASC tiebreak.
  private def scoredFrame(nQ: Int, nC: Int) =
    (for { q <- 0 until nQ; c <- 0 until nC } yield
      (q.toLong, c.toLong, ((q * 31 + c * 17) % 97 % 10).toDouble / 10))
      .toDF("qid", "id", "score")

  test("TopKByScore == row_number window (ties broken id ASC)") {
    val scored = scoredFrame(7, 400).repartition(13)
    val w = Window.partitionBy($"qid").orderBy($"score".desc, $"id".asc)
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"qid", $"id", $"score", $"rank")
      .collect().map(_.toSeq).toSet
    val viaAgg = Similarity.topKRank(scored, 10, "score")
      .collect().map(_.toSeq).toSet
    assert(viaAgg == viaWindow)
  }

  test("k larger than the group emits every row, ranked") {
    val scored = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 10L, 0.1))
      .toDF("qid", "id", "score")
    val got = Similarity.topKRank(scored, 100, "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got == Set((1L, 11L, 0.9, 1), (1L, 10L, 0.5, 2), (2L, 10L, 0.1, 1)))
  }

  test("string ids: ties rank lexicographically, buffers survive shuffle") {
    val scored = Seq(("q", "b", 1.0), ("q", "a", 1.0), ("q", "c", 2.0),
      ("q", "d", 0.5)).toDF("qid", "id", "score").repartition(4)
    val got = scored.groupBy($"qid")
      .agg(TopKAgg.topKByScore($"score", $"id", 3).as("topk"))
      .select(explode($"topk").as("e"))
      .select($"e.id", $"e.rank")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == Set(("c", 1), ("a", 2), ("b", 3)))
  }

  test("null scores are ignored, all-null group vanishes") {
    val scored = Seq((1L, 10L, Some(0.5)), (1L, 11L, None), (2L, 12L, None))
      .toDF("qid", "id", "score")
    val got = Similarity.topKRank(scored, 5, "score")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("two-stage plan: heap aggregate with a partial stage, no Window") {
    val e = Tables(spark, sf001, "embeddings")
    val queries = e.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding")
    val plan = Similarity.bruteForceTopK(e, queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no heap agg in:\n$plan")
    assert(plan.contains("partial_topkbyscore") ||
      plan.toLowerCase.contains("partial_topk"),
      s"no map-side partial topk stage in:\n$plan")
    assert(!plan.contains("Window"), s"window rank survived in:\n$plan")
  }
}
