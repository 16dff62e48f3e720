package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Dedup

/** Streaming maintenance of the MinHash signature table — the ingest-time
  * twin of [[graft.ext.Dedup.incrementalMinhash]]: every micro-batch's
  * signatures ([[graft.ext.Dedup.minhashSignaturesOf]], one scan of the
  * NEW documents only) are folded into a stored signature table with
  * [[graft.ext.Dedup.mergeMinhashSignatures]] (slot-wise min — associative,
  * commutative, idempotent), so the table a downstream LSH banding reads
  * is always bit-identical to a full recompute over everything ever
  * ingested, with no history rescan.
  *
  * Storage shape (the 100 TB story): the table is hash-partitioned on
  * `bucket = doc_id mod buckets`. A micro-batch reads and rewrites ONLY
  * the buckets its documents hash into (parquet partition pruning on the
  * read, dynamic partition overwrite on the write), so per-batch I/O is
  * O(batch + touched buckets), never O(corpus). `buckets` trades rewrite
  * amplification against file count — at web scale pick it so one bucket
  * ≈ a few hundred MB.
  *
  * Failure semantics: `foreachBatch` may REPLAY a batch after a crash
  * (or lose the in-flight write with an executor). Either way the
  * recovery re-merge is a no-op by idempotence of the slot-wise min —
  * replays converge to the same table, which is why the merge being
  * ALGEBRAIC (not just associative) matters here.
  */
object MinhashMaintenance {

  /** Default table bucket count — sized for the local test corpus; at
    * scale pick `corpus_signature_bytes / target_file_size`. */
  val DefaultBuckets = 64

  /** Start the maintenance stream: each micro-batch of (doc_id, ts, text)
    * rows is folded into the signature table at `tableDir`. */
  def start(docs: Dataset[NearDupStream.Doc], tableDir: String,
      checkpointDir: String, buckets: Int = DefaultBuckets): StreamingQuery =
    docs.toDF().writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        mergeBatch(batch.toDF(), tableDir, buckets)
      }
      .start()

  /** Fold ONE batch of (doc_id, …, text) rows into the stored table —
    * also the backfill entry point for a historical shard. */
  private[streaming] def mergeBatch(batch: DataFrame, tableDir: String,
      buckets: Int): Unit = {
    val spark = batch.sparkSession
    val fresh = Dedup.minhashSignaturesOf(batch)
      .withColumn("bucket", pmod(col("doc_id"), lit(buckets.toLong)))
      .persist()
    try {
      // bounded driver list: at most `buckets` values, independent of
      // batch or corpus size (same ceiling discipline as the broadcasts)
      val affected = fresh.select("bucket").distinct().collect().map(_.getLong(0))
      if (affected.nonEmpty) {
        val dir = new Path(tableDir)
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val existing =
          if (fs.exists(dir) && fs.listStatus(dir).exists(_.getPath.getName.startsWith("bucket=")))
            Some(spark.read.parquet(tableDir)
              .where(col("bucket").isin(affected.toIndexedSeq: _*)).drop("bucket"))
          else None
        val merged = existing
          .fold(fresh.drop("bucket"))(e =>
            Dedup.mergeMinhashSignatures(e, fresh.drop("bucket")))
          .withColumn("bucket", pmod(col("doc_id"), lit(buckets.toLong)))
        // localCheckpoint cuts the lineage so the plan no longer references
        // tableDir — without it Spark (correctly) refuses to overwrite a
        // path it is reading from. An executor loss mid-write fails the
        // batch and the replay re-merges idempotently (object doc).
        merged.localCheckpoint(true)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket")
          .parquet(tableDir)
      }
    } finally fresh.unpersist()
  }

  /** The maintained signature table: (doc_id, m0..m{K−1}) — the exact
    * input shape [[graft.ext.Dedup.mergeMinhashSignatures]] consumes and
    * LSH banding reads. */
  def signatures(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(tableDir).drop("bucket")
}
