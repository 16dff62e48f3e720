package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pareto-front (skyline) selection: the two-phase distributed front must
  * equal the brute-force dominance definition, keep equal-point
  * duplicates, and be invariant to the shard count. */
class ParetoSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private case class Pt(doc_id: Long, n_words: Long, quality_score: Double)

  private def bruteFront(pts: Seq[Pt]): Set[Long] =
    pts.filter { a =>
      !pts.exists(b => b.n_words >= a.n_words && b.quality_score >= a.quality_score &&
        (b.n_words > a.n_words || b.quality_score > a.quality_score))
    }.map(_.doc_id).toSet

  private def asPts(rows: Array[Row]): Seq[Pt] = rows.toSeq.map(r =>
    Pt(r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"), r.getAs[Double]("quality_score")))

  test("front equals the brute-force dominance definition on the corpus") {
    val all = asPts(TextAnalysis.qualityScoreOf(graft.Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_words").cast("long").as("n_words"), col("quality_score"))
      .collect())
    val got = Curation.paretoFront(spark, dir).collect()
    assert(asPts(got).map(_.doc_id).toSet === bruteFront(all))
    // front members carry their own coordinates unchanged
    val byId = all.map(p => p.doc_id -> p).toMap
    asPts(got).foreach(p => assert(byId(p.doc_id) === p))
  }

  test("front is non-trivial and ordered by doc_id") {
    val ids = Curation.paretoFront(spark, dir).collect().map(_.getAs[Long]("doc_id"))
    assert(ids.nonEmpty && ids.length < graft.Tables.documents(spark, dir).count())
    assert(ids.sameElements(ids.sorted))
  }

  test("shard count never changes the front (phase 1 drops no keeper)") {
    val expected = Curation.paretoFront(spark, dir, shards = 1).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    Seq(2, 7, 32).foreach { s =>
      val got = Curation.paretoFront(spark, dir, shards = s).collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(got === expected, s"shards=$s must match shards=1")
    }
  }

  test("equal points both survive; weakly dominated points on one axis do not") {
    import spark.implicits._
    // (10,0.5) and its duplicate are mutually non-dominating → both kept;
    // (10,0.4) loses on quality at the same length; (9,0.5) loses on
    // length at the same quality; (12,0.9) and (3,0.95) are front corners
    val pts = Seq(
      (1L, 10L, 0.5), (2L, 10L, 0.5), (3L, 10L, 0.4), (4L, 9L, 0.5),
      (5L, 12L, 0.9), (6L, 3L, 0.95)).toDF("doc_id", "n_words", "quality_score")
    val singlePass = Curation.frontOf(pts, Nil).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(singlePass === Set(5L, 6L))
    // with the duplicate pair undominated (drop the 0.9/0.95 corners above
    // length 10) both copies must survive a pass
    val dup = Seq((1L, 10L, 0.5), (2L, 10L, 0.5), (3L, 10L, 0.4), (4L, 9L, 0.5))
      .toDF("doc_id", "n_words", "quality_score")
    assert(Curation.frontOf(dup, Nil).collect().map(_.getAs[Long]("doc_id")).toSet
      === Set(1L, 2L))
  }
}
