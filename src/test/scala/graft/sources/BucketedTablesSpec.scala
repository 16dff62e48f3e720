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

  test("j_bucketed: the registry attribution join plans with zero data exchanges") {
    val dir = "/root/testdata/sf0.001"
    // force the scale regime: without size-based broadcast the only way
    // this plan avoids a shuffle is the bucket layout itself
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val q = BucketedTables.bucketedAttribution(spark, dir)
      // the derived sizing decision (round 16): reported, a power of
      // two, and exactly deriveBuckets of the larger slice
      val row = q.head()
      val ev = graft.Tables.events(spark, dir)
      val nClicks = ev.where(col("event_type") === "click").count()
      val nPurch = ev.where(col("event_type") === "purchase").count()
      val nb = row.getAs[Long]("n_buckets")
      assert(nb === BucketedTables.deriveBuckets(math.max(nClicks, nPurch)).toLong)
      assert(java.lang.Long.bitCount(nb) === 1, s"bucket count must be a power of two: $nb")
      q.collect()
      val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), s"bucketed join must sort-merge:\n$plan")
      assert(!"Exchange hashpartitioning".r.findAllIn(plan).hasNext,
        s"bucketed join + per-user partials must not shuffle:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"no broadcast may survive with auto-broadcast off:\n$plan")
      // the only exchange is the final 1-row rollup
      val single = "Exchange SinglePartition".r.findAllIn(plan).size
      assert(single <= 1, s"expected at most the global-agg exchange:\n$plan")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("j_bucketed_diff: the full-outer diff joins co-located, only the census shuffles") {
    val dir = "/root/testdata/sf0.001"
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val q = BucketedTables.bucketedSnapshotDiff(spark, dir)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
        s"diff must stay a full-outer sort-merge join:\n$plan")
      assert(!plan.contains("hashpartitioning(doc_id"),
        s"the corpus-scaled join must ride the bucket layout, never shuffle doc_id:\n$plan")
      val ex = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(ex === 1, s"only the sources-sized census may shuffle, found $ex:\n$plan")
      // and it reports exactly what the unbucketed diff reports
      val bucketed = q.collect().map(_.toString).sorted
      val plain = graft.ext.Curation.snapshotDiff(spark, dir)
        .collect().map(_.toString).sorted
      assert(bucketed.toSeq === plain.toSeq)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("deriveBuckets: power-of-two cover of rows/target, floored and capped") {
    assert(BucketedTables.deriveBuckets(0L) === 1)
    assert(BucketedTables.deriveBuckets(1L) === 1)
    assert(BucketedTables.deriveBuckets(1024L) === 1)
    assert(BucketedTables.deriveBuckets(1025L) === 2)
    assert(BucketedTables.deriveBuckets(5L * 1024L) === 8)
    assert(BucketedTables.deriveBuckets(Long.MaxValue) === (1 << 20),
      "the cap bounds a pathological sizing input")
  }

  test("j_bucketed: a fresh catalog re-registers the existing bucket files without rewriting") {
    val dir = "/root/testdata/sf0.001"
    BucketedTables.bucketedAttribution(spark, dir).collect() // materialize
    // simulate the fresh-JVM path: drop ONLY the catalog entries (data
    // stays), re-run — the CREATE TABLE … CLUSTERED BY re-registration
    // must restore the same result AND the shuffle-free plan
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_bkt_"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    val q = BucketedTables.bucketedAttribution(spark, dir)
    val r = q.head()
    assert(r.getAs[Long]("n_pairs") > 0L)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!"Exchange hashpartitioning".r.findAllIn(plan).hasNext,
      s"re-registered external bucketed tables must stay shuffle-free:\n$plan")
  }
}
