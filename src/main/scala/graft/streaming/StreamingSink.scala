package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.PartitionedSink

/** Streaming → idempotent lake writes: `foreachBatch` bridges a streaming
  * query into [[PartitionedSink.writeDaily]]'s dynamic partition
  * overwrite, so a replayed/duplicated micro-batch REWRITES its day
  * instead of appending twice — the end-to-end streaming answer to the
  * reference's duplicate-on-rerun flaw (`etl/etl_process.py:156-163`),
  * with the checkpoint giving restart-exactly-once over it.
  */
object StreamingSink {

  /** Start writing a (timestamp-carrying) streaming frame into a
    * day-partitioned parquet lake, idempotently per micro-batch. */
  def startDaily(df: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) PartitionedSink.writeDaily(batch, path)
      }
      .start()
}
