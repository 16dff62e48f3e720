package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketedTablesSpec extends SparkSpec {

  test("matching bucket layouts join with ZERO exchanges (co-located merge join)") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    BucketedTables.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    BucketedTables.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    try {
      val joined = BucketedTables.bucketJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join + same-key agg must be shuffle-free:\n$plan")
      // and it computes the right thing
      assert(joined.agg(sum(col("n"))).head().getLong(0) ===
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
