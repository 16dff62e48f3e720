package graft.streaming

import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.ops.SensorPipeline
import graft.Tables

/** The batch/stream unification proof: the SAME windowed aggregation
  * expressions, fed once from a batch read and once through a file-based
  * `readStream`, must produce identical results on the driver's real
  * events table. */
class StreamBatchParitySpec extends SparkSpec {

  test("file-source stream through windowedWide == batch wideAgg (closed windows)") {
    val dir = "/root/testdata/sf0.001"
    val stream = SensorStream.eventsStream(spark, dir)
    val q = SensorStream.windowedWide(stream, watermark = "0 seconds")
      .writeStream.format("memory").queryName("parity_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("parity_out")

    val batch = SensorPipeline.wideAgg(Tables.events(spark, dir))
    // append mode emits only windows the final watermark passed — every
    // window strictly before max(ts): compare on the common prefix
    val cutoff = streamed.agg(org.apache.spark.sql.functions.max("timestamp")).head().getTimestamp(0)
    val batchClosed = batch.where(org.apache.spark.sql.functions.col("timestamp") <= cutoff)
    assert(streamed.count() > 0)
    assert(streamed.count() === batchClosed.count())
    assert(streamed.exceptAll(batchClosed).isEmpty && batchClosed.exceptAll(streamed).isEmpty)
  }
}
