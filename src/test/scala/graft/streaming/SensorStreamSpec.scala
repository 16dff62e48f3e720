package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Structured-Streaming pipeline: same long-format contract as batch. */
class SensorStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed long pipeline emits closed windows once watermark passes") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val events = stream.toDF().toDF("ts", "event_type", "value")

    val query = SensorStream.windowedLong(events)
      .writeStream.format("memory").queryName("sensor_long_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // two clicks + two views inside window [00:00, 00:10)
      stream.addData(
        (ts("2024-01-01 00:01:00"), "click", 1.0),
        (ts("2024-01-01 00:02:00"), "click", 3.0),
        (ts("2024-01-01 00:03:00"), "view", 2.0),
        (ts("2024-01-01 00:04:00"), "view", 6.0))
      query.processAllAvailable()
      // nothing emitted yet: watermark hasn't passed window end + 20m
      assert(spark.table("sensor_long_out").count() === 0)

      // late-arriving far-future row advances the watermark past 00:30
      stream.addData((ts("2024-01-01 01:00:00"), "click", 9.9))
      query.processAllAvailable()

      val out = spark.table("sensor_long_out")
        .select($"timestamp".cast("string"), $"signal_id", $"value")
        .as[(String, Int, Double)].collect().sortBy(r => (r._1, r._2))
      // all 8 signals of the closed window, batch-identical values
      assert(out.length === 8)
      assert(out.forall(_._1 == "2024-01-01 00:00:00"))
      val values = out.map(r => r._2 -> r._3).toMap
      assert(values(1) === 2.0)  // click_mean
      assert(values(2) === 1.0)  // click_min
      assert(values(3) === 3.0)  // click_max
      assert(values(5) === 4.0)  // view_mean
    } finally query.stop()
  }
}
