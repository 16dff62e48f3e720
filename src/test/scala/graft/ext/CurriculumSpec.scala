package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Curriculum ordering: the schedule must interleave quality bands
  * round-robin and stay a pure function of the corpus. */
class CurriculumSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val out = Curation.curriculumOrder(spark, dir).collect()

  test("positions are unique and the schedule covers every document") {
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(out.length.toLong === nDocs)
    assert(out.map(_.getAs[Long]("position")).distinct.length === out.length)
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length === out.length)
  }

  test("band is the fixed quality quarter of the score") {
    val scored = TextAnalysis.qualityScoreOf(graft.Tables.documents(spark, dir))
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    out.foreach { r =>
      val expected = math.min(3, math.floor(scored(r.getAs[Long]("doc_id")) * 4).toInt)
      assert(r.getAs[Int]("band") === expected)
    }
  }

  test("every prefix of the schedule interleaves the bands round-robin") {
    // while all bands still have members, a prefix of length 4k holds
    // exactly k docs of each band — position = (rank-1)*4 + band makes
    // this arithmetic, so check it directly against band sizes
    val sizes = out.groupBy(_.getAs[Int]("band")).map { case (b, rs) => b -> rs.length }
    val kMax = sizes.values.min
    val bands = sizes.keys.toSeq.sorted
    // below position 4·kMax every PRESENT band still has members, so the
    // occupied slots are exactly {4i + b : i < kMax, b ∈ bands} — empty
    // bands (this corpus fills only quarters 0–1) leave their slots as
    // permanent gaps, which is fine: the schedule is consumed in position
    // order, not by dense index
    val prefix = out.filter(_.getAs[Long]("position") < 4L * kMax)
    val expected = (for (i <- 0L until kMax.toLong; b <- bands) yield 4 * i + b).toSet
    assert(prefix.map(_.getAs[Long]("position")).toSet === expected)
    val byBand = prefix.groupBy(_.getAs[Int]("band")).map { case (b, rs) => b -> rs.length }
    bands.foreach { b =>
      assert(byBand(b) === kMax, s"band $b must drain at exactly the round-robin rate")
    }
  }

  test("within a band the schedule is quality-descending") {
    out.groupBy(_.getAs[Int]("band")).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(_.getAs[Long]("position"))
      // ranks within the band run best-first; doc_id breaks score ties
      val scored = TextAnalysis.qualityScoreOf(graft.Tables.documents(spark, dir))
        .select(col("doc_id"), col("quality_score")).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
      inOrder.sliding(2).foreach {
        case Array(hi, lo) =>
          val (sh, sl) = (scored(hi.getAs[Long]("doc_id")), scored(lo.getAs[Long]("doc_id")))
          assert(sh > sl || (sh == sl && hi.getAs[Long]("doc_id") < lo.getAs[Long]("doc_id")))
        case _ =>
      }
    }
  }
}
