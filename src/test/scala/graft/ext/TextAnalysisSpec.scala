package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.SaveMode

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-text").toString
    Seq(
      (0L, "the cat and the hat", "en", "s0", 19L),
      (1L, "der hund und die katze ist da", "de", "s0", 29L),
      (2L, "zebra zebra zebra unique", "en", "s1", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    d
  }

  test("token counts: whitespace vs regex vs BPE-ish chunking") {
    val r = TextAnalysis.tokenCounts(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2), x.getInt(3), x.getInt(4))).toMap
    assert(r(0L) === ((19, 5, 5, 5)))  // five ≤4-char words → 5 chunks in every scheme
  }

  test("language id: stopword scoring separates en from de") {
    val r = TextAnalysis.languageId(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("predicted")).toMap
    assert(r(0L) === "en")
    assert(r(1L) === "de")
  }

  test("quality: repetitive doc scores below diverse doc") {
    val r = TextAnalysis.qualityScore(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Double]("distinct_ratio"), x.getAs[Double]("stopword_ratio"))).toMap
    assert(r(2L)._1 < r(0L)._1, "repetition lowers lexical diversity")
    assert(r(0L)._2 === 0.6)   // the, and, the of 5 words
    assert(r(2L)._2 === 0.0)
  }

  test("tfidf: the distinctive term wins for each doc") {
    val r = TextAnalysis.tfidfTopTerm(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("tok")).toMap
    assert(r(2L) === "zebra") // tf 3/4, df 1 → dominant
  }
}
