package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused digest-slice expression must be BIT-identical to the
  * portable `cast(conv(substring(md5(x), p, n), 16, 10) as bigint)`
  * chain it replaces — the DuckDB oracles still run the chain, so any
  * divergence is an immediate hash mismatch. */
class Md5Slice64Spec extends SparkSpec {
  import spark.implicits._

  private def chain(c: String, p: Int, n: Int) =
    expr(s"cast(conv(substring(md5($c), $p, $n), 16, 10) as bigint)")

  private def native(c: String, p: Int, n: Int) = {
    Md5Slice64.register(spark)
    expr(s"md5_slice64($c, $p, $n)")
  }

  test("bit-equality with the SQL chain across every legal (pos, len) shape") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").limit(200)
    // prefixes (the rewrite shapes), interior slices (minhash h2), odd
    // lengths (60-bit shingle keys), single digits
    val shapes = Seq((1, 15), (1, 12), (1, 8), (9, 8), (17, 15), (1, 1), (32, 1), (5, 7))
    shapes.foreach { case (p, n) =>
      val diff = docs
        .select(chain("text", p, n).as("c"), native("text", p, n).as("f"))
        .where($"c" =!= $"f" || $"c".isNull =!= $"f".isNull)
        .count()
      assert(diff === 0, s"slice ($p, $n) diverged from the SQL chain")
    }
  }

  test("edge inputs: empty string, unicode, null") {
    val df = Seq(Some(""), Some("héllo wörld ☃"), Some("a"), None).toDF("s")
    val rows = df.select(chain("s", 1, 15).as("c"), native("s", 1, 15).as("f")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
  }

  test("rewrite collapses a single-slice chain and leaves double-slice md5 on CSE") {
    Md5ConvRewrite.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // single slice of the digest → fused
    val single = docs.select(chain("text", 1, 15).as("k"))
    assert(single.queryExecution.optimizedPlan.toString.contains("md5_slice64"),
      s"single-slice chain must fuse:\n${single.queryExecution.optimizedPlan}")
    // two slices of the SAME digest (the minhash h1/h2 shape) → untouched,
    // so subexpression elimination keeps computing the digest once
    val double = docs.select(chain("text", 1, 8).as("h1"), chain("text", 9, 8).as("h2"))
    assert(!double.queryExecution.optimizedPlan.toString.contains("md5_slice64"),
      s"double-slice md5 must stay on the shared chain:\n${double.queryExecution.optimizedPlan}")
    // values are unchanged by the rewrite (the chain result IS the fused result)
    val viaRule = single.collect().map(_.getLong(0)).sorted
    val viaNative = docs.select(native("text", 1, 15).as("k")).collect().map(_.getLong(0)).sorted
    assert(viaRule.toSeq === viaNative.toSeq)
  }

  test("whole-stage codegen accepts the fused expression") {
    Md5Slice64.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("md5_slice64(text, 1, 15) AS k")
    // a `*(n)` stage prefix in executedPlan means the node is inside
    // whole-stage codegen (same assertion as the cosine PlanSpec pin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[md5_slice64.*"),
      s"fused expr fell out of codegen:\n$plan")
    assert(df.where($"k" < 0).count() === 0, "60-bit slices are always non-negative")
  }
}
