package graft.ops

import graft.SparkSpec

/** Benford audit: the report must be a well-formed distribution and the
  * expectation column must be the closed-form law. */
class BenfordSpec extends SparkSpec {

  test("digit shares form a distribution and expectations match the law") {
    val out = QualityChecks.benfordPrices(spark, "/root/testdata/sf0.001").collect()
    assert(out.map(_.getAs[Int]("digit")).toSeq === (1 to 9),
      "cent-denominated positive prices must cover digits 1..9")
    // shares: each rounded to 4dp, so the sum lands within 9 half-ulps of 1
    val shareSum = out.map(_.getAs[Double]("obs_share")).sum
    assert(math.abs(shareSum - 1.0) < 9 * 5e-5)
    out.foreach { r =>
      val d = r.getAs[Int]("digit")
      val expected = math.floor(math.log10(1.0 + 1.0 / d) * 1e4 + 0.5) / 1e4
      assert(r.getAs[Double]("benford_p") === expected)
    }
  }
}
