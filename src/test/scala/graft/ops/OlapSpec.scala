package graft.ops

import graft.SparkSpec

/** Olap surface: result invariants + the plan shapes its 100 TB stance
  * depends on (single-pass cube, all-broadcast q8 dim joins, pre-agg
  * before the range frame). */
class OlapSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.count()
    // AQE's toString appends an "== Initial Plan ==" copy of the
    // pre-adaptive tree — drop it so node counts reflect the FINAL plan
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("cube emits all four grouping sets in one pass (Expand, one agg shuffle)") {
    val df = Olap.cubeSummary(spark, dir)
    val rows = df.collect()
    // grand total present exactly once and equals the sum of the finest level
    val grand = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(grand.length === 1)
    val finest = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 0)
    assert(finest.map(_.getLong(4)).sum === grand.head.getLong(4))
    val plan = planOf(df)
    assert(plan.contains("Expand"), plan)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles === 1, s"cube must be one hash-agg shuffle:\n$plan")
  }

  test("q8 market share: every dim join broadcasts; share is within [0,1]") {
    val df = Olap.marketShare(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("SortMergeJoin"),
      s"only lineitem⋈orders may shuffle; all dim joins must broadcast:\n$plan")
    df.collect().foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0, s"share out of range: $r")
    }
  }

  test("running range-frame: trailing-7d sum >= daily and windows only after daily pre-agg") {
    val df = Olap.runningRange(spark, dir)
    df.collect().foreach { r =>
      assert(r.getDouble(3) >= r.getDouble(2) - 1e-9, s"7d sum below daily: $r")
    }
    // the window input is the daily aggregate, not raw orders: the plan
    // aggregates (HashAggregate) below the Window node
    val plan = planOf(df)
    assert(plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("intersect plans as a join/aggregate, not a cartesian") {
    val plan = planOf(Olap.intersectNations(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q6: every predicate is pushed into the parquet scan") {
    // default maxMetadataStringLength truncates the PushedFilters list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val plan = Olap.forecastRevenue(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan)
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount", "LessThan(l_quantity"))
      assert(plan.contains(f), s"predicate $f must reach the scan:\n$plan")
  }

  test("q18: the having-filtered aggregate broadcasts back (no SMJ against orders)") {
    val plan = planOf(Olap.largeOrders(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"big-order keys and customer must both broadcast:\n$plan")
  }

  test("decontaminate: the benchmark n-gram set broadcasts; corpus side never shuffles for the join") {
    val plan = planOf(graft.ext.Curation.decontaminate(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"the benchmark gram set must broadcast into the corpus scan:\n$plan")
  }

  test("per-shard packing respects the token budget within every (shard, bin)") {
    val rows = graft.ext.Curation.packShards(spark, dir, budget = 2000, shards = 4).collect()
    val byBin = rows.groupBy(r => (r.getLong(1), r.getLong(3)))
    byBin.foreach { case ((shard, bin), docs) =>
      val total = docs.map(_.getLong(2)).sum
      // a bin may exceed the budget only by its last (boundary-crossing) doc
      val maxDoc = docs.map(_.getLong(2)).max
      assert(total - maxDoc < 2000, s"bin ($shard,$bin) overpacked: $total")
    }
    // shards are balanced-ish: every shard is non-empty at this SF
    assert(byBin.keys.map(_._1).toSet.size === 4)
  }
}
