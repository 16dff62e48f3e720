package graft.ops

import graft.SparkSpec

/** Observed-metrics piggyback: quality counters ride the pipeline's own
  * scan (no second job) and must agree with independently computed
  * values. */
class ObservedMetricsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("observe() metrics match standalone aggregates, collected on the pipeline job") {
    import org.apache.spark.sql.functions._
    val (out, obs) = QualityChecks.observedPipeline(spark, dir)
    val n = out.count() // the ONLY job — metrics accumulate on it
    assert(n > 0)
    val m = obs.get
    val expected = graft.Tables.events(spark, dir).agg(
      count(lit(1)), sum(when(col("ts").isNull, 1).otherwise(0)),
      sum(when(col("value") <= 0, 1).otherwise(0))).head()
    assert(m("n_rows") === expected.getLong(0))
    assert(m("n_null_ts") === expected.getLong(1))
    assert(m("n_nonpos_value") === expected.getLong(2))
    assert(m("min_ts") != null)
    assert(m("max_ts") != null)
  }
}
