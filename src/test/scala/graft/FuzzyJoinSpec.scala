package graft

import org.apache.spark.sql.functions._

import graft.functions.TextExprs
import graft.operators.Dedup

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletionVariants: distinct neighborhood, original first") {
    val got = Seq("abc").toDF("s")
      .select(TextExprs.deletionVariants($"s", 1).as("v"))
      .head().getSeq[String](0)
    assert(got == Seq("abc", "bc", "ac", "ab"))
    // duplicate-producing deletions collapse ("aa" minus either char)
    val dup = Seq("aa").toDF("s")
      .select(TextExprs.deletionVariants($"s", 1).as("v"))
      .head().getSeq[String](0)
    assert(dup == Seq("aa", "a"))
    // k=2 includes depth-2 variants; empty string reachable from len 2
    val k2 = Seq("ab").toDF("s")
      .select(TextExprs.deletionVariants($"s", 2).as("v"))
      .head().getSeq[String](0)
    assert(k2.toSet == Set("ab", "a", "b", ""))
  }

  test("editDistancePairs == brute force (k=1 and k=2), incl. ins/del") {
    // strings exercising substitution, insertion, deletion, and a
    // shared long prefix (the case that breaks positional pigeonhole)
    val docs = Seq(
      (1L, "Customer#001"), (2L, "Customer#002"), (3L, "Customer#012"),
      (4L, "Customer#0012"), (5L, "Customer#01"), (6L, "Xustomer#001"),
      (7L, "totally different"), (8L, "totally differen")
    ).toDF("id", "name")
    for (k <- Seq(1, 2)) {
      val fast = Dedup.editDistancePairs(docs, "id", "name", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val a = docs.select($"id".as("id_a"), $"name".as("n_a"))
      val brute = a.crossJoin(docs.select($"id".as("id_b"), $"name".as("n_b")))
        .filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b",
          levenshtein($"n_a", $"n_b").cast("long").as("d"))
        .filter($"d" <= k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fast == brute, s"k=$k")
      assert(fast.nonEmpty)
    }
  }

  test("editDistancePairs == brute force on random small-alphabet strings") {
    // 2-letter alphabet, lengths 0..8: dense ed<=k neighborhoods with
    // many ins/del pairs and massive shared prefixes/suffixes
    val rnd = new scala.util.Random(23)
    val docs = (1 to 250).map { i =>
      val len = rnd.nextInt(9)
      (i.toLong, (0 until len).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
    }.toDF("id", "s")
    for (k <- Seq(1, 2)) {
      val fast = Dedup.editDistancePairs(docs, "id", "s", k)
        .collect().map(_.toSeq).toSet
      val a = docs.select($"id".as("id_a"), $"s".as("n_a"))
      val brute = a.crossJoin(docs.select($"id".as("id_b"), $"s".as("n_b")))
        .filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b",
          levenshtein($"n_a", $"n_b").cast("long").as("d"))
        .filter($"d" <= k)
        .collect().map(_.toSeq).toSet
      assert(fast == brute, s"k=$k: ${(brute -- fast).take(5)} missed")
      assert(brute.size > 100, s"k=$k degenerate corpus: ${brute.size}")
    }
  }

  test("editDistancePairs matches brute force on real customer names") {
    val c = Tables(spark, sf001, "customer")
    val fast = Dedup.editDistancePairs(c, "c_custkey", "c_name", 1)
      .collect().map(_.toSeq).toSet
    val a = c.select($"c_custkey".as("id_a"), $"c_name".as("n_a"))
    val brute = a.crossJoin(
        c.select($"c_custkey".as("id_b"), $"c_name".as("n_b")))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", levenshtein($"n_a", $"n_b").cast("long").as("dist"))
      .filter($"dist" <= 1)
      .collect().map(_.toSeq).toSet
    assert(fast == brute)
    assert(fast.nonEmpty)
  }
}
