package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Cost-based optimization: ANALYZE'd column statistics let the planner
  * see through a selective filter and broadcast a join side that raw
  * file-size estimation cannot — the stats discipline a 100 TB warehouse
  * runs on (periodic ANALYZE after load, CBO on). Assertions are on the
  * STATIC plan (`sparkPlan`, pre-AQE): AQE can rescue the join at
  * runtime from actual shuffle sizes, but planning it right up front
  * avoids ever materializing the shuffle. */
class CboSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("column stats shrink a filtered dim below the broadcast threshold") {
    val conf = spark.conf
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.sql("DROP TABLE IF EXISTS cbo_cust")
    try {
      Tables.orders(spark, dir).write.saveAsTable("cbo_orders")
      Tables.customer(spark, dir).write.saveAsTable("cbo_cust")
      spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE cbo_cust COMPUTE STATISTICS FOR COLUMNS c_acctbal")

      conf.set("spark.sql.cbo.enabled", "true")
      def estimate(df: org.apache.spark.sql.DataFrame): BigInt =
        df.queryExecution.optimizedPlan.stats.sizeInBytes
      val raw = estimate(spark.table("cbo_cust"))
      val filtered = spark.table("cbo_cust").where(col("c_acctbal") > 9900)
      val filt = estimate(filtered)
      assert(filt * 5 < raw,
        s"column stats must see the filter's selectivity: filtered=$filt raw=$raw")

      // a threshold between the two estimates: only the stats-aware
      // filtered estimate qualifies for broadcast
      val threshold = (filt * 2).min(raw - 1)
      conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
      val join = spark.table("cbo_orders")
        .join(filtered, col("o_custkey") === col("c_custkey"))
      assert(join.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        s"CBO must pick broadcast from column stats:\n${join.queryExecution.sparkPlan}")

      // without CBO the filter keeps its child's full size → no broadcast
      conf.set("spark.sql.cbo.enabled", "false")
      val join2 = spark.table("cbo_orders")
        .join(spark.table("cbo_cust").where(col("c_acctbal") > 9900),
          col("o_custkey") === col("c_custkey"))
      assert(!join2.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        s"without CBO the static plan must not broadcast:\n${join2.queryExecution.sparkPlan}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cbo_orders")
      spark.sql("DROP TABLE IF EXISTS cbo_cust")
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    }
  }
}
