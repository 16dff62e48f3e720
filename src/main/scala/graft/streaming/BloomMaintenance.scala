package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.BloomFilter

/** Streaming maintenance of a corpus Bloom filter — the ingest-time twin
  * of [[graft.functions.BloomFilter.build]], and the admission-control
  * front for exact-dup checks at ingest.
  *
  * Each micro-batch's content hashes fold into a stored word table
  * (`(w, bits)`, one row per nonzero 64-bit word) with a union +
  * `bit_or` merge. Bitwise OR is associative, commutative and IDEMPOTENT,
  * so a crash-replayed batch re-ORs the same bits and converges — the
  * same algebraic-merge discipline as [[MinhashMaintenance]]'s slot-wise
  * min. By the monoid property the stored table after any number of
  * batches is bit-identical to a one-shot [[BloomFilter.build]] over
  * everything ever ingested (spec-pinned), so the probe side needs no
  * special streaming variant.
  *
  * Why at 100 TB: ingest-time exact-dup admission against a corpus index
  * costs an index probe PER ARRIVING DOC. With the filter in front, the
  * definitely-new majority (no filter hit) admits with ZERO index I/O;
  * only filter hits — true dups + the ε false-positive tail — pay the
  * exact lookup. The stored table is ≤ m/64 rows (16 KiB of longs at the
  * default 2^20 bits) regardless of corpus size: state is
  * FILTER-shaped, not corpus-shaped.
  */
object BloomMaintenance {

  val DefaultBits: Int = 1 << 20
  val DefaultK: Int = 5

  /** 64-bit content hash — same md5-prefix scheme as the dedup suite
    * (collision-safe at corpus scale for admission purposes). */
  private[streaming] def contentHash: org.apache.spark.sql.Column =
    expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)")

  /** Start the maintenance stream over (doc_id, ts, text) rows. */
  def start(docs: Dataset[NearDupStream.Doc], tableDir: String,
      checkpointDir: String, mBits: Int = DefaultBits,
      k: Int = DefaultK): StreamingQuery =
    docs.toDF().writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        mergeBatch(batch.toDF(), tableDir, mBits, k)
      }
      .start()

  /** Fold ONE batch into the stored word table — also the backfill entry
    * point for a historical shard. */
  private[streaming] def mergeBatch(batch: DataFrame, tableDir: String,
      mBits: Int, k: Int): Unit = {
    val spark = batch.sparkSession
    val fresh = BloomFilter.wordFrame(
      batch.select(contentHash.as("h")), "h", mBits, k)
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(dir) && fs.listStatus(dir).nonEmpty)
        spark.read.parquet(tableDir).union(fresh)
          .groupBy(col("w")).agg(expr("bit_or(bits)").as("bits"))
      else fresh
    if (!merged.isEmpty)
      // localCheckpoint cuts the lineage referencing tableDir so the
      // overwrite is legal; a replay re-ORs idempotently (object doc)
      merged.localCheckpoint(true)
        .write.mode("overwrite").parquet(tableDir)
  }

  /** The maintained filter as a dense probe array — driver materialization
    * bounded by m/64 words, never by the corpus. */
  def bits(spark: SparkSession, tableDir: String,
      mBits: Int = DefaultBits): Array[Long] = {
    val out = new Array[Long](mBits / 64)
    spark.read.parquet(tableDir)
      .collect().foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** Admission screen for a frame of candidate (…, text) rows: adds
    * `suspect_dup` — false means PROVABLY never ingested (admit with no
    * further I/O); true routes to the exact corpus-index check (true dups
    * + the ε false-positive tail). */
  def screen(spark: SparkSession, tableDir: String, candidates: DataFrame,
      mBits: Int = DefaultBits, k: Int = DefaultK): DataFrame = {
    BloomFilter.register(spark) // probe resolves via the function registry
    val filter = bits(spark, tableDir, mBits)
    candidates.withColumn("suspect_dup",
      BloomFilter.mightContain(filter, contentHash, k))
  }
}
