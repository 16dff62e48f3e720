package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fuzzy record linkage: multi-pass blocking recall, candidate-bound
  * discipline, and verify-predicate correctness. */
class LinkageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every emitted pair is ordered, within threshold, and vocabulary-backed") {
    val out = Linkage.fuzzyLinkage(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[String]("name_a") < r.getAs[String]("name_b"))
      assert(r.getAs[Int]("dist") <= 3)
      assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    }
  }

  test("multi-pass blocking recovers pairs a single blocking key would lose") {
    // "cold bolt" / "cold rod" share NO noun (tok2) — a noun-only blocker
    // never compares them; the adjective (tok1) pass must recover the pair
    val out = Linkage.fuzzyLinkage(spark, dir)
      .where(col("name_a") === "cold bolt" && col("name_b") === "cold rod")
      .collect()
    assert(out.length === 1, "tok1 pass must recover the cross-noun pair")
    assert(out.head.getAs[Int]("dist") === 3)
  }

  test("multi-pass candidates are deduplicated, not double-counted") {
    // a pair sharing BOTH tokens' blocks (same noun AND same adjective is
    // impossible for distinct names here, but same noun + close adjective
    // appears in both passes only if tok1 also matches) — assert global
    // pair uniqueness, which the union+distinct guarantees
    val out = Linkage.fuzzyLinkage(spark, dir)
      .groupBy("name_a", "name_b").count().where(col("count") > 1).collect()
    assert(out.isEmpty, "each linked pair must appear exactly once")
  }

  test("hot-block cap drops degenerate blocks from their pass") {
    // every block (8 adjectives × 8 nouns vocabulary) has ~8 members;
    // a cap below that drops ALL blocks in BOTH passes → zero candidates
    val capped = Linkage.fuzzyLinkage(spark, dir, maxBlock = 2)
    assert(capped.count() === 0,
      "blocks above the cap must contribute no candidate pairs")
  }

  test("entity resolution: every name resolves, canonicals carry max support") {
    val out = Linkage.entityResolve(spark, dir).collect()
    val nNames = graft.Tables.part(spark, dir)
      .select(col("p_name")).distinct().count()
    assert(out.length.toLong === nNames, "every distinct name resolves to an entity")
    val support = out.map(r => r.getAs[String]("name") -> r.getAs[Long]("n_records")).toMap
    out.groupBy(_.getAs[String]("canonical")).foreach { case (canonical, members) =>
      assert(support(canonical) === members.map(m => support(m.getAs[String]("name"))).max,
        s"canonical '$canonical' must be its family's highest-support spelling")
    }
    // canonicalization is idempotent: canonicals resolve to themselves
    val canonOf = out.map(r => r.getAs[String]("name") -> r.getAs[String]("canonical")).toMap
    canonOf.values.foreach(c => assert(canonOf(c) === c))
  }

  test("entity resolution closes transitively across blocking passes") {
    // linked pairs form chains (old↔cold by tok2, cold bolt↔cold rod by
    // tok1): every linked pair must land in the SAME entity family
    val canonOf = Linkage.entityResolve(spark, dir).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("canonical")).toMap
    Linkage.fuzzyLinkage(spark, dir).collect().foreach { r =>
      assert(canonOf(r.getAs[String]("name_a")) === canonOf(r.getAs[String]("name_b")))
    }
  }

  test("linkage agrees with an unblocked brute-force verify at this vocabulary size") {
    val names = graft.Tables.part(spark, dir)
      .select(col("p_name")).distinct().collect().map(_.getString(0))
    val brute = (for {
      a <- names; b <- names if a < b
      d = {
        // tiny driver-side Levenshtein as the independent model
        val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        m(a.length)(b.length)
      }
      if d <= 3
      // brute force has no blocking — keep only pairs some block proposes
      if a.split(" ")(0) == b.split(" ")(0) || a.split(" ")(1) == b.split(" ")(1)
    } yield (a, b, d)).toSet
    val engine = Linkage.fuzzyLinkage(spark, dir).collect()
      .map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"), r.getAs[Int]("dist"))).toSet
    assert(engine === brute)
  }
}
