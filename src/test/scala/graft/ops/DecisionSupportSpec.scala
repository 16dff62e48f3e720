package graft.ops

import graft.SparkSpec

/** Remaining TPC-H shapes (Q4/Q9/Q11/Q13/Q15/Q16/Q20/Q21): result
  * invariants plus the plan shapes the 100 TB stance depends on —
  * semi/anti joins that never duplicate the probe side, decorrelated
  * windows instead of self-joins, broadcast dims, scalar aggregates as
  * 1-row broadcasts. */
class DecisionSupportSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.count()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("q4: semi join emits each order at most once per priority bucket") {
    val counts = DecisionSupport.orderPriorityCheck(spark, dir).collect()
    val total = counts.map(_.getLong(1)).sum
    val quarter = graft.Tables.orders(spark, dir)
      .where(org.apache.spark.sql.functions.col("o_orderdate")
        .between("1996-07-01", "1996-09-30 23:59:59"))
      .count()
    assert(total <= quarter, s"semi join duplicated orders: $total > $quarter")
    assert(total > 0)
  }

  test("q9: star join broadcasts every dim; only orderkey shuffles") {
    val plan = planOf(DecisionSupport.productProfit(spark, dir))
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 3, s"part/supplier/nation must broadcast:\n$plan")
  }

  test("q11: threshold is scale-free — selected parts all exceed 2x mean value") {
    val rows = DecisionSupport.importantParts(spark, dir).collect()
    assert(rows.nonEmpty, "q11 must select a non-degenerate head")
    val values = rows.map(_.getDouble(1))
    assert(values.sameElements(values.sorted(Ordering[Double].reverse)),
      "output must be ordered by value desc")
  }

  test("q13: zero-order customers survive the left join (0 bucket exists)") {
    val rows = DecisionSupport.customerDistribution(spark, dir).collect()
    val custTotal = rows.map(_.getLong(1)).sum
    assert(custTotal === graft.Tables.customer(spark, dir).count(),
      "distribution must cover every customer exactly once")
  }

  test("q15: winner(s) hold the global max revenue; max is broadcast not rescan") {
    val df = DecisionSupport.topSupplier(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length === 1, s"all winners must tie on max revenue: ${revs.toSeq}")
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")
      || !plan.contains("SortMergeJoin"), plan)
  }

  test("q16: blacklisted suppliers are excluded from the distinct counts") {
    val rows = DecisionSupport.supplierVariety(spark, dir).collect()
    val nGood = graft.Tables.supplier(spark, dir)
      .where(org.apache.spark.sql.functions.col("s_acctbal") >= 0).count()
    rows.foreach { r =>
      assert(r.getLong(2) <= nGood, s"count exceeds eligible suppliers: $r")
    }
  }

  test("q21: decorrelated plan has no lineitem self-join (single orderkey shuffle + window)") {
    val df = DecisionSupport.waitingSuppliers(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("Window"), plan)
    // lineitem is scanned once: the EXISTS/NOT-EXISTS pair became window counts
    val liScans = "Scan parquet".r.findAllIn(plan).size
    assert(liScans <= 3, s"expected lineitem+orders+supplier scans only:\n$plan")
  }

  test("q20: every returned supplier actually shipped a qualifying volume") {
    import org.apache.spark.sql.functions._
    val suppliers = DecisionSupport.promotionSuppliers(spark, dir)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val expected = graft.Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01"))
        && col("l_shipdate") < to_timestamp(lit("1997-01-01")))
      .join(broadcast(graft.Tables.part(spark, dir)
        .where(col("p_name").startsWith("blue")).select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_suppkey", "l_partkey")
      .agg(round(sum(col("l_quantity")), 2).as("qty"))
      .where(col("qty") > 30)
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).toSet
    assert(suppliers === expected)
  }
}
