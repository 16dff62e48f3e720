package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Per-source token-budget selection: the two-phase pruned plan must
  * equal the greedy quality-prefix rule, maximally fill each budget, and
  * be invariant to the phase-1 shard count. */
class TokenBudgetSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Budget = 800L

  // (source → docs as (doc_id, n_words, quality) in global greedy order)
  private lazy val ranked: Map[String, Seq[(Long, Long, Double)]] = {
    val docs = graft.Tables.documents(spark, dir)
    TextAnalysis.qualityScoreOf(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("doc_id"), col("source"), col("n_words").cast("long"), col("quality_score"))
      .collect()
      .map(r => (r.getAs[String]("source"), (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_words"), r.getAs[Double]("quality_score"))))
      .groupBy(_._1)
      .map { case (src, rows) =>
        src -> rows.map(_._2).toSeq.sortBy { case (id, _, q) => (-q, id) }
      }
  }

  private def greedy(docs: Seq[(Long, Long, Double)]): Seq[(Long, Long)] = {
    var cum = 0L
    docs.flatMap { case (id, n, _) =>
      cum += n
      if (cum <= Budget) Some(id -> cum) else None
    }
  }

  test("selection equals the greedy quality-prefix rule in every source") {
    val got = Curation.tokenBudget(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("cum_tokens")))
    val expected = ranked.flatMap { case (src, docs) =>
      greedy(docs).map { case (id, cum) => (src, id, cum) }
    }.toSet
    assert(got.toSet === expected)
    assert(got.nonEmpty)
  }

  test("every budget is maximally filled: the next-ranked doc would overflow") {
    val kept = Curation.tokenBudget(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("cum_tokens"))
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).max }
    ranked.foreach { case (src, docs) =>
      val sel = greedy(docs)
      if (sel.length < docs.length) {
        val spent = kept.getOrElse(src, 0L)
        assert(sel.map(_._1).toSet.size === sel.length)
        // the first doc past the greedy prefix cannot fit: the window rule
        // charges it ITS OWN words on top of every better-ranked doc's,
        // including skipped ones — so compare against the full running sum
        val cumAll = docs.map(_._2).scanLeft(0L)(_ + _).drop(1)
        assert(cumAll(sel.length) > Budget,
          s"$src: doc after the prefix would fit in $Budget − its running sum")
        assert(spent <= Budget)
      }
    }
  }

  test("shard count never changes the selection (phase 1 drops no keeper)") {
    val expected = Curation.tokenBudget(spark, dir, shards = 1).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    Seq(2, 7, 32).foreach { s =>
      val got = Curation.tokenBudget(spark, dir, shards = s).collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(got === expected, s"shards=$s must match shards=1")
    }
  }

  test("a budget below every document size selects nothing") {
    assert(Curation.tokenBudget(spark, dir, budget = 2L).count() === 0)
  }
}
