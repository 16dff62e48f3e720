package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact Jaccard self-join via prefix filtering: the prefix-pruned plan
  * must equal the brute-force all-shared-shingle-pairs reference (the
  * losslessness lemma), with exact integer behavior at the τ boundary. */
class PrefixJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def pairsOf(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Long]("n_shared"), r.getAs[Double]("jaccard"))).toSet

  test("prefix-filtered join equals the brute-force reference on the corpus") {
    val got = pairsOf(Dedup.jaccardPrefixJoin(spark, dir).collect())
    // reference: every shared-shingle pair, no prefix filter anywhere
    val sh = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), expr(Dedup.hashedShingleExpr).as("ss"))
    val ex = sh.select(col("doc_id"), size(col("ss")).cast("long").as("n"),
      explode(col("ss")).as("s"))
    val brute = ex.as("x").join(ex.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n").as("n_a"), col("y.n").as("n_b"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_shared"))
      .where(col("n_shared") * Dedup.TauDen >= col("n_union") * Dedup.TauNum)
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        graft.ops.StableStats.ratio(col("n_shared"), col("n_union")).as("jaccard"))
    assert(got === pairsOf(brute.collect()))
    assert(got.nonEmpty)
    // every emitted pair genuinely clears τ
    assert(got.forall(_._4 >= Dedup.TauNum.toDouble / Dedup.TauDen))
  }

  test("τ boundary is exact: jaccard = 3/5 kept, 1/2 dropped, disjoint dropped") {
    import spark.implicits._
    // A: 4 shingles; B = A's 5-word prefix + new tail → 3 of 4 shared,
    // union 5 → exactly 3/5; D: 5 shingles, 3 shared, union 6 → 1/2
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e zB"),
      (3L, "a b c d e zD1 zD2"),
      (4L, "p q r s t u")).toDF("doc_id", "text")
    val got = pairsOf(Dedup.jaccardPrefixJoinOf(docs).collect())
    assert(got === Set((1L, 2L, 3L, 0.6)))
  }

  test("identical documents pair at jaccard 1 regardless of prefix sharding") {
    import spark.implicits._
    val docs = Seq(
      (10L, "x y z w v"), (11L, "x y z w v"), (12L, "x y z w v"),
      (13L, "completely different words here now")).toDF("doc_id", "text")
    val got = Dedup.jaccardPrefixJoinOf(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(got === Set((10L, 11L), (10L, 12L), (11L, 12L)))
  }
}
