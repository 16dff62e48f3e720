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

  test("runtime bloom filter injects under the conf window and changes nothing") {
    // default confs: the filtered build side broadcasts, no runtime filter
    val plain = Skew.runtimeBloomFrame(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    val (windowed, plan, shuffledRows) = Skew.withBloomJoinConf(spark) {
      val df = Skew.runtimeBloomFrame(spark, dir)
      val rows = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      // MEASURED row reduction, not just plan shape: the might_contain
      // Filter's output is what reaches the probe side's shuffle write
      import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def allNodes(p: SparkPlan): Seq[SparkPlan] =
        p.collect { case n => n }.flatMap {
          case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
          case qs: QueryStageExec       => qs +: allNodes(qs.plan)
          case n                        => Seq(n)
        }
      val probeFilter = allNodes(df.queryExecution.executedPlan).collectFirst {
        case f: FilterExec if f.condition.toString.contains("might_contain") => f
      }
      (rows, df.queryExecution.executedPlan.toString,
        probeFilter.map(_.metrics("numOutputRows").value))
    }
    assert(windowed === plain, "the runtime filter must be semantics-free")
    assert(plan.contains("might_contain"),
      s"expected an injected bloom probe filter in:\n$plan")
    assert(plan.contains("bloom_filter_agg"),
      s"expected the build-side bloom aggregate in:\n$plan")
    // the filter genuinely reduced the shuffled probe volume: URGENT is
    // ~1/5 of orders, so far fewer than all lineitem rows survive it
    val totalLines = Tables.lineitem(spark, dir).count()
    assert(shuffledRows.isDefined, "probe-side might_contain filter not found")
    assert(shuffledRows.get > 0 && shuffledRows.get < totalLines,
      s"bloom probe must cut shuffled rows (passed ${shuffledRows.get} of $totalLines)")
    // window restored: the registry query result is identical either way
    val reg = Skew.runtimeBloomJoin(spark, dir).collect()
    assert(reg.length === 1 && reg.head.getString(0) === "1-URGENT")
    assert(spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold") !== "0")
  }

  test("CBO + catalog stats reorder the worst-order join chain; results identical") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    // the innermost Join (no Join below it) tells the story: which two
    // relations the optimizer decided to combine FIRST
    def innermost(p: LogicalPlan): Seq[Join] = p.collect {
      case j: Join
        if !j.left.exists(_.isInstanceOf[Join]) &&
           !j.right.exists(_.isInstanceOf[Join]) => j
    }
    def sides(j: Join): Set[String] = {
      def tag(out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute]): String =
        if (out.exists(_.name.startsWith("l_"))) "lineitem"
        else if (out.exists(_.name.startsWith("o_"))) "orders"
        else "customer"
      Set(tag(j.left.output), tag(j.right.output))
    }
    // literal order (CBO off): the fact⋈fact join is planned first,
    // exactly as written
    val off = Skew.cboFrame(spark, dir)
    val offRows = off.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val offInner = innermost(off.queryExecution.optimizedPlan)
    assert(offInner.nonEmpty)
    assert(offInner.map(sides).contains(Set("lineitem", "orders")),
      s"without CBO the literal order must survive:\n${off.queryExecution.optimizedPlan}")
    // CBO window: the DP must pull the selective dimension in first
    val (onRows, onInner, onPlan) = Skew.withCboConf(spark) {
      val on = Skew.cboFrame(spark, dir)
      val rows = on.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      (rows, innermost(on.queryExecution.optimizedPlan),
        on.queryExecution.optimizedPlan.toString)
    }
    assert(onInner.nonEmpty)
    assert(onInner.map(sides).contains(Set("orders", "customer")),
      s"CBO must join the selective dimension first:\n$onPlan")
    assert(onRows === offRows, "join order must be semantics-free")
    // window restored
    assert(spark.conf.getOption("spark.sql.cbo.enabled").forall(_ == "false"))
  }
}
