package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables

/** Watermarked stream-stream interval join — the attribution shape
  * (purchase joined to the same user's clicks in the preceding hour)
  * run through Structured Streaming's symmetric stateful join: both
  * sides buffer keyed state, each arriving row probes the OTHER side's
  * buffer, and the event-time bound (`c.ts ∈ [p.ts − 1h, p.ts]`) plus
  * the watermarks tell the engine exactly when a buffered row can never
  * match again and its state can be evicted — the mechanism that keeps
  * a 100 TB/day two-stream join's state at O(join-window × rate)
  * instead of O(history). The join ITSELF is
  * [[StatefulOps.clickConversionJoin]] (one definition of the
  * condition, so the replay and the primitive cannot drift); this
  * module is its REGISTRY surface. `StreamJoinSpec` pins genuine
  * statefulness (join-state rows reported by the operator metrics),
  * batch parity under an in-order feed with a TIGHT eviction
  * watermark, and the replay's fingerprint idempotence.
  *
  * Registry surface ([[streamJoinAttribution]], `x_stream_join`): the
  * deterministic-replay discipline of
  * [[graft.streaming.IngestReplay]] — the click/purchase slices of the
  * events table are materialized as multi-file stream inputs, the REAL
  * `readStream → join → writeStream` pipeline drains them under
  * `Trigger.AvailableNow` (one file per micro-batch), and the report
  * reads the append-sink parquet back. The replay's watermark delay
  * (40 days) exceeds the fixture's whole event-time span ON PURPOSE:
  * the file source's micro-batch order follows modification times, so
  * an order-dependent eviction could drop late input and make the
  * result depend on file listing — with the over-wide delay the drained
  * inner join is EXACTLY the batch interval join at any micro-batch
  * order, which is what lets DuckDB replay it as a plain self-join
  * (oracle-green at every SF). The tight-watermark production
  * configuration is exercised where arrival order is controlled — the
  * spec's MemoryStream feed. */
object StreamJoin {

  /** The batch twin: clicks ⋈ purchases per user within the preceding
    * hour. Shared by the streaming replay (whose drained output must
    * equal it) and consumers that want the relational form. */
  private[streaming] def attributionBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 60 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("click_id"), col("purchase_id"))
  }

  def streamJoinAttribution(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.ext.Layout.scratchDir("stream_join", dir)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .where(col("event_type").isin("click", "purchase"))
    // order-free content fingerprint of both input slices
    val fr = ev.agg(count(lit(1)),
      coalesce(sum(hash(col("event_id"), col("user_id"), col("ts"),
        col("event_type")).cast("long")), lit(0L))).head()
    val fp = s"v1:60min:${fr.getLong(0)}:${fr.getLong(1)}"
    val marker = new java.io.File(s"$base/_replay_fingerprint")
    val current = if (marker.isFile)
      new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") else ""
    if (current != fp) {
      val p = new Path(base)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      // multi-file stream inputs: 3 files per side → 3 micro-batches per
      // source under maxFilesPerTrigger=1, so the join genuinely runs
      // across micro-batches with buffered state, not as one batch
      ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
        .repartition(3).write.parquet(s"$base/in_clicks")
      ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
        .repartition(3).write.parquet(s"$base/in_purchases")
      val cSchema = spark.read.parquet(s"$base/in_clicks").schema
      val pSchema = spark.read.parquet(s"$base/in_purchases").schema
      val c = spark.readStream.schema(cSchema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in_clicks")
        .select(col("click_id"), col("user_id"), col("ts").as("click_ts"))
      val pr = spark.readStream.schema(pSchema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in_purchases")
        .select(col("purchase_id"), col("user_id"), col("ts").as("conv_ts"))
      // c.ts ∈ [p.ts − 60 min, p.ts] ⇔ conv_ts ∈ [click_ts, click_ts + 60
      // min] — exactly the primitive's condition
      val joined = StatefulOps
        .clickConversionJoin(c, pr, watermark = "40 days", window = "60 minutes")
        .select(col("user_id"), col("click_id"), col("purchase_id"))
      val q = joined.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      java.nio.file.Files.write(marker.toPath, fp.getBytes("UTF-8"))
    }
    spark.read.parquet(s"$base/out")
      .select(col("user_id"), col("click_id"), col("purchase_id"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_stream_join" -> (streamJoinAttribution _))

  val oracles: Map[String, String] = Map(
    "x_stream_join" ->
      """SELECT c.user_id AS user_id, c.event_id AS click_id,
        |       p.event_id AS purchase_id
        |FROM events c, events p
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND c.user_id = p.user_id
        |  AND c.ts >= p.ts - INTERVAL 60 MINUTE AND c.ts <= p.ts
        |ORDER BY user_id, click_id, purchase_id""".stripMargin)
}
