package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.VecOps
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the deterministic-mode primitives (SCALE.md
  * "Deterministic mode"): the fixed-point quantizer's rounding
  * contract, the portable-HLL register derivation, and the Rademacher
  * sign matrix — the pieces every hash-oracled gate leans on.
  */
class DeterministicOpsSpec extends SparkSpec {

  private def forAllSamples[A](g: Gen[A], n: Int = 200)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(977L + i)).foreach(body)
    }

  private val anyFloat: Gen[Float] = Gen.oneOf(
    Gen.chooseNum(-1f, 1f),
    Gen.chooseNum(-1e6f, 1e6f),
    Gen.oneOf(0f, -0f, 1e-8f, -1e-8f, 0.35f, -0.35f, Float.MinPositiveValue))

  test("property: roundAwayScaled is the nearest integer to x*1e7") {
    // ties cannot occur for float inputs (x*10^7 = k+1/2 needs a
    // non-dyadic x), so nearest-integer is the complete contract
    forAllSamples(anyFloat) { x =>
      val s = x.toDouble * 1e7
      val r = VecOps.roundAwayScaled(x)
      assert(math.abs(r - s) <= 0.5, s"x=$x s=$s r=$r")
      // and it agrees with the BigDecimal HALF_UP reference (what
      // Spark's round() computes on doubles)
      val ref = java.math.BigDecimal.valueOf(s)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      assert(r == ref, s"x=$x r=$r ref=$ref")
    }
  }

  test("roundAwayScaled fails loudly on unquantizable input") {
    // NaN used to map silently to 0 and out-of-range values wrapped
    // past Long.MaxValue — both must throw like SQL round(x)::BIGINT
    for (bad <- Seq(Float.NaN, Float.PositiveInfinity,
        Float.NegativeInfinity, Float.MaxValue, Float.MinValue))
      intercept[ArithmeticException](VecOps.roundAwayScaled(bad))
    // boundary sanity: large-but-quantizable values still round
    assert(VecOps.roundAwayScaled(1e9f) == 10000000000000000L)
  }

  test("property: portable-HLL register derivation matches a bin()-string model") {
    // rho computed arithmetically in SQL as 49 - length(bin(r)) must
    // equal the leading-zero semantics the estimator assumes
    forAllSamples(Gen.chooseNum(0L, (1L << 48) - 1)) { r =>
      val viaBin = if (r == 0) 49 else 49 - r.toBinaryString.length
      val viaNlz = if (r == 0) 49
        else java.lang.Long.numberOfLeadingZeros(r) - 16 + 1
      assert(viaBin == viaNlz, s"r=$r bin=$viaBin nlz=$viaNlz")
      assert(viaBin >= 1 && viaBin <= 49)
    }
  }

  test("deterministic-mode GATE queries: bit-identical under repartitioning") {
    // the reproducibility claim at the full-query level: the three
    // round-6 oracle flips must produce identical rows when the input
    // arrives in a different partitioning/order
    val dir = sf001
    for (name <- Seq("sketch_hll_rollup", "embed_label_centroids",
        "sim_topk_lsh")) {
      val q = SparkEntry.queries(name)
      val base = q(spark, dir).collect().map(_.toString).sorted.toSeq
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val re = q(spark, dir).collect().map(_.toString).sorted.toSeq
        assert(re == base, s"$name not partition-deterministic")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("Rademacher signs: ±1 only, ~balanced, stable across calls") {
    val a = VecOps.rademacherSigns(8, 64, 42L)
    val b = VecOps.rademacherSigns(8, 64, 42L)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(s => s == 1 || s == -1))
    val ones = a.count(_ == 1)
    // md5 bit 0 over 512 cells: a grossly unbalanced matrix would mean
    // the hash derivation is broken (expected ~256, sd ~11)
    assert(ones > 180 && ones < 332, s"ones=$ones of ${a.length}")
    // and a different seed yields a different matrix
    val c = VecOps.rademacherSigns(8, 64, 43L)
    assert(c.toSeq != a.toSeq)
  }
}
