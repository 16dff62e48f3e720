package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed regeneration of the reference's deterministic seed data
  * (`database/seed_fonte.py:13-39`, seed 42): a 1-minute grid of
  * wind_speed / power / ambient_temprature (sic — the reference's
  * load-bearing misspelling, `database/init_fonte.sql:9`).
  *
  * Formula fidelity (SURVEY.md F6–F10):
  * - wind_speed = clip(N(12, 5), 0, 25)                      (seed_fonte.py:21-22)
  * - power      = ws<3 → 0; ws>20 → 2000;
  *                else clip(ws²·8 + N(0,100), 0, 2000)       (seed_fonte.py:24-27)
  * - ambient_temprature = 20 + 10·sin(2π·i/1440) + N(0,3)    (seed_fonte.py:29-30)
  *
  * numpy's and Spark's PRNG streams differ, so golden tests assert
  * structural/distributional invariants, not row equality (FIXTURES.md §A1).
  *
  * Scale: `spark.range(n)` partitions the grid across executors — the
  * generator is embarrassingly parallel, no shuffle, no driver loop.
  */
object SynthGenerator {

  /** `rows` one-minute readings starting at `startIso` (UTC). */
  def sensorData(spark: SparkSession, startIso: String = "2025-08-10 00:00:00",
      rows: Long = 15840, seed: Long = 42): DataFrame = {
    val base = spark.range(rows)
      .withColumn("timestamp",
        (to_timestamp(lit(startIso)) + expr("make_interval(0, 0, 0, 0, 0, id, 0)")))
    val ws = least(lit(25.0), greatest(lit(0.0), randn(seed) * 5 + 12))
    val rawPower = pow(col("wind_speed"), 2) * 8 + randn(seed + 1) * 100
    val temp = lit(20.0) + lit(10.0) * sin(lit(2 * math.Pi) * col("id") / 1440) + randn(seed + 2) * 3
    base
      .withColumn("wind_speed", ws)
      .withColumn("power",
        when(col("wind_speed") < 3, 0.0)
          .when(col("wind_speed") > 20, 2000.0)
          .otherwise(least(lit(2000.0), greatest(lit(0.0), rawPower))))
      .withColumn("ambient_temprature", temp)
      .select("timestamp", "wind_speed", "power", "ambient_temprature")
  }

  /** The reference's 8-row signal dimension for the synthetic pipeline
    * (`etl/prepare_alvo_db.py:56-66`). */
  def signalDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for {
      v <- Seq("wind_speed", "power")
      s <- Seq("mean", "min", "max", "std")
    } yield s"${v}_$s").zipWithIndex
      .map { case (n, i) => (i + 1, n) }
      .toDF("signal_id", "name")
  }
}
