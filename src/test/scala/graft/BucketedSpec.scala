package graft

import graft.operators.Bucketed

/** Bucketed co-located join: pre-bucketed tables join with ZERO shuffle
  * while the unbucketed equivalent exchanges both sides.
  */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("join of two bucketed tables has no Exchange; unbucketed does") {
    val li = Tables(spark, sf001, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    val ord = Tables(spark, sf001, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")

    Bucketed.writeBucketed(li, "li_bkt", "l_orderkey", buckets = 8)
    Bucketed.writeBucketed(ord, "ord_bkt", "l_orderkey", buckets = 8)

    // AQE can hide exchanges until execution — disable for plan asserts,
    // and disable broadcast so the join stays sort-merge on both paths
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val colocated = Bucketed.colocatedJoin(spark, "li_bkt", "ord_bkt", "l_orderkey")
      assert(Bucketed.countExchanges(colocated) == 0,
        "bucketed join must not shuffle")
      val shuffled = li.join(ord, "l_orderkey")
      assert(Bucketed.countExchanges(shuffled) == 2,
        "unbucketed sort-merge join shuffles both sides")
      // same results either way
      assert(colocated.count() == shuffled.count() && colocated.count() > 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
