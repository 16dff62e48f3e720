package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew mitigation: salted two-stage aggregation.
  *
  * A `groupBy(hotKey).agg(...)` sends every row of a hot key to ONE
  * reducer — at 100 TB a single skewed key stalls the stage. Salting
  * splits each key into `salt` sub-groups aggregated in parallel
  * (stage 1), then merges the partials (stage 2). Works for any
  * algebraic aggregate (sum/count/min/max decompose; avg = merged
  * sum ÷ merged count).
  *
  * The salt is `pmod(hash(whole-row columns), n)` — deterministic per
  * row content, so results are reproducible AND identical to the
  * unsalted plan (the oracle for the demo query below is the plain
  * single-stage SQL aggregate).
  */
object Skew {

  /** Two-stage salted aggregate of count/sum/min/max/mean over `valueCol`
    * grouped by `key`, semantically identical to the single-stage plan. */
  def saltedStats(df: DataFrame, key: Column, valueCol: Column, salt: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(valueCol), lit(salt)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(
        count(lit(1)).as("pc"),
        // non-null partial count: the mean's denominator must exclude NULL
        // values (count(valueCol)) to match centsMean / count(value)
        // semantics, while `n` stays a row count (count(*)).
        count(valueCol).as("pcv"),
        sum(round(valueCol * 100).cast("long")).as("pcents"),
        min(valueCol).as("pmin"),
        max(valueCol).as("pmax"))
    partial
      .groupBy(col("k"))
      .agg(
        sum(col("pc")).as("n"),
        StableStats.stableRound(
          sum(col("pcents")).cast("double") / sum(col("pcv")) / lit(100.0), 4).as("avg_value"),
        min(col("pmin")).as("min_value"),
        max(col("pmax")).as("max_value"))
  }

  /** Demo query: per-event_type stats via the salted two-stage plan —
    * hash-identical to the plain aggregate (its oracle). */
  def saltedEventStats(spark: SparkSession, dir: String): DataFrame =
    saltedStats(Tables.events(spark, dir), col("event_type"), col("value"), 16)
      .withColumnRenamed("k", "event_type")
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a_salted_agg" -> (saltedEventStats _)
  )

  val oracles: Map[String, String] = Map(
    "a_salted_agg" ->
      s"""SELECT event_type, count(*) AS n,
         |  ${StableStats.centsMeanSql("value")} AS avg_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
