package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic-delta tests from SURVEY.md §5.2 — the places where pandas,
  * Spark, and DuckDB could diverge. */
class SensorPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (String, String, Double)*): DataFrame =
    rows.map { case (t, e, v) => (ts(t), e, v) }.toSeq.toDF("ts", "event_type", "value")

  test("std of a single-row bin is NULL and its long row is dropped (P4 ≙ dropna)") {
    // one click event in its bin → stddev_samp = NULL (SPARK-33726)
    val e = events(("2024-01-01 00:01:00", "click", 5.0))
    val wide = SensorPipeline.wideAgg(e)
    assert(wide.select("click_std").head().isNullAt(0))
    // melt+dropna: std / all view_* rows vanish; mean/min/max for click stay
    val long = SensorPipeline.toLong(wide)
    val names = long.select("signal_name").as[String].collect().toSet
    assert(names === Set("click_mean", "click_min", "click_max"))
  }

  test("unpivot retains nulls until the explicit na.drop (pandas melt parity)") {
    val e = events(("2024-01-01 00:01:00", "click", 5.0))
    val wide = SensorPipeline.wideAgg(e)
    val rawUnpivot = wide.unpivot(Array(col("timestamp")),
      SensorPipeline.signalNames.map(col).toArray, "signal_name", "value")
    assert(rawUnpivot.count() === 8)           // nulls still present
    assert(SensorPipeline.toLong(wide).count() === 3) // nulls dropped
  }

  test("groupBy(window) emits no empty interior bins (vs pandas resample)") {
    // 00:05 and 00:25 → bins 00:00 and 00:20; pandas would materialize
    // an all-NaN 00:10 bin then drop it — Spark never creates it
    val e = events(
      ("2024-01-01 00:05:00", "click", 1.0),
      ("2024-01-01 00:25:00", "click", 2.0))
    assert(SensorPipeline.wideAgg(e).count() === 2)
  }

  test("window bins are left-closed, labeled by left edge (pandas 10T parity)") {
    val e = events(
      ("2024-01-01 00:09:59", "click", 1.0),
      ("2024-01-01 00:10:00", "click", 2.0)) // boundary row → SECOND bin
    val bins = SensorPipeline.wideAgg(e)
      .select($"timestamp".cast("string")).as[String].collect().sorted
    assert(bins === Array("2024-01-01 00:00:00", "2024-01-01 00:10:00"))
  }

  test("day filter is half-open: exact next-midnight row excluded (fixes §2.5.3 quirk)") {
    val e = events(
      ("2024-01-05 23:59:59", "click", 1.0),
      ("2024-01-06 00:00:00", "click", 2.0)) // belongs to the NEXT partition
    assert(SensorPipeline.dayFilter(e, "2024-01-05").count() === 1)
  }

  test("unmapped signals are dropped by the dim join (net inner, ≙ map+dropna)") {
    val e = events(
      ("2024-01-01 00:01:00", "click", 1.0),
      ("2024-01-01 00:02:00", "click", 3.0),
      ("2024-01-01 00:03:00", "view", 2.0),
      ("2024-01-01 00:04:00", "view", 4.0))
    val long = SensorPipeline.toLong(SensorPipeline.wideAgg(e))
    val clickOnly = SensorPipeline.signalDim(spark).where($"name".startsWith("click_"))
    val mapped = SensorPipeline.mapSignals(long, clickOnly)
    assert(mapped.count() === 4) // view_* rows dropped
    assert(mapped.select("signal_id").as[Int].collect().toSet === Set(1, 2, 3, 4))
  }

  test("pipeline invariant: full-window bins yield rows divisible by 8 (ref //8)") {
    // 2+ rows of both types per bin → all 8 signals non-null
    val rows = for {
      min <- 0 until 20
      (t, v) <- Seq(("click", min * 1.0), ("view", min * 2.0))
    } yield (s"2024-01-01 00:${"%02d".format(min)}:00", t, v)
    val long = SensorPipeline.toLong(SensorPipeline.wideAgg(events(rows: _*)))
    assert(long.count() === 2 * 8) // 2 bins × 8 signals
  }

  test("typed pipeline: Dataset[SignalRecord] round-trips the untyped output") {
    val typed = SensorPipeline.pipelineTyped(spark, "/root/testdata/sf0.001")
    val rows = typed.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.signal_id >= 1 && r.signal_id <= 8))
    assert(typed.count() === SensorPipeline.pipelineLong(spark, "/root/testdata/sf0.001").count())
  }

  test("agg values match hand computation (mean/min/max/std ddof=1)") {
    val e = events(
      ("2024-01-01 00:01:00", "click", 1.0),
      ("2024-01-01 00:02:00", "click", 2.0),
      ("2024-01-01 00:03:00", "click", 3.0))
    val r = SensorPipeline.wideAgg(e).select("click_mean", "click_min", "click_max", "click_std").head()
    assert(r.getDouble(0) === 2.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === 3.0)
    assert(r.getDouble(3) === 1.0) // sample stddev of 1,2,3
  }
}
