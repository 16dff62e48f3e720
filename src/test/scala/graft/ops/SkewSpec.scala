package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SkewSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("join-cardinality forecast is EXACT, not an estimate") {
    val got = Skew.joinCardinality(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("predicted_rows")).toMap
    val ol = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey")).count()
    val ev = Tables.events(spark, dir)
    val selfJoin = ev.select(col("user_id"))
      .join(ev.select(col("user_id").as("u2")), col("user_id") === col("u2"))
      .count()
    assert(got("orders_lineitem") === ol)
    assert(got("events_self_user") === selfJoin)
  }

  test("hottest-share flags the key that dominates a self-join") {
    val r = Skew.joinCardinality(spark, dir).collect()
      .map(x => x.getString(0) ->
        (x.getAs[Double]("expansion"), x.getAs[Double]("hottest_share"))).toMap
    // the events self-join fans out (every user contributes n², so the
    // output dwarfs the input) while the orders⋈lineitem 1:N stays at
    // the fact-table size (expansion ≈ 1 vs the larger side)
    assert(r("events_self_user")._1 > 1.0)
    assert(r("orders_lineitem")._1 <= 1.0)
    assert(r("events_self_user")._2 > 0.0 && r("events_self_user")._2 < 1.0)
  }
}
