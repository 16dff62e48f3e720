package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.functions.BloomFilter
import NearDupStream.Doc

/** Streaming Bloom maintenance: the stored filter must stay bit-identical
  * to a one-shot batch build over everything ingested (the OR-monoid
  * twin of the MinHash merge≡recompute pin), and the admission screen
  * must never clear a previously-ingested document. */
class BloomMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1 << 16
  private val K = 5

  private def ts(s: String) = Timestamp.valueOf(s)

  private val b1 = Seq((1L, "the quick brown fox jumps over the dog"),
                       (2L, "pack my box with five dozen liquor jugs"))
  private val b2 = Seq((3L, "sphinx of black quartz judge my vow now"),
                       (4L, "how vexingly quick daft zebras jump today"))

  private def runBatches(tableDir: String,
      batches: Seq[Seq[(Long, String)]]): Unit = {
    val ckpt = Files.createTempDirectory("graft-bloom-ckpt").toString
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Doc]
    val q = BloomMaintenance.start(stream.toDS(), tableDir, ckpt, M, K)
    try {
      batches.foreach { b =>
        stream.addData(b.map { case (id, t) => Doc(id, ts("2024-01-01 00:00:00"), t) })
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  test("streamed filter == one-shot batch build after 2 micro-batches") {
    val tableDir = Files.createTempDirectory("graft-bloom-table").toString
    runBatches(tableDir, Seq(b1, b2))
    val got = BloomMaintenance.bits(spark, tableDir, M)
    val expected = BloomFilter.build(
      (b1 ++ b2).toDF("doc_id", "text")
        .select(BloomMaintenance.contentHash.as("h")), "h", M, K)
    assert(got.sameElements(expected),
      "streamed OR-merge must be bit-identical to the one-shot build")
  }

  test("replayed batch is a no-op (idempotent OR)") {
    val tableDir = Files.createTempDirectory("graft-bloom-idem").toString
    runBatches(tableDir, Seq(b1, b2, b2))
    val got = BloomMaintenance.bits(spark, tableDir, M)
    val expected = BloomFilter.build(
      (b1 ++ b2).toDF("doc_id", "text")
        .select(BloomMaintenance.contentHash.as("h")), "h", M, K)
    assert(got.sameElements(expected))
  }

  test("checkpoint restart: a NEW query resuming the same checkpoint converges") {
    // not just in-query replay: stop the stream entirely, start a fresh
    // query against the SAME checkpoint dir, deliver more data — the
    // recovered stream must fold the new batch onto the recovered state
    // and land bit-identical to the one-shot build. A FILE source is used
    // because its offsets (file names) survive restart; MemoryStream's
    // do not, so it cannot exercise real checkpoint recovery.
    val base = Files.createTempDirectory("graft-bloom-restart")
    val (inDir, tableDir, ckpt) = (s"$base/in", s"$base/table", s"$base/ckpt")
    new java.io.File(inDir).mkdirs()
    def deliver(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = s"$base/stage-$name"
      rows.map { case (id, t) => Doc(id, ts("2024-01-01 00:00:00"), t) }
        .toDF().coalesce(1).write.parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }
    def docStream = spark.readStream
      .schema(Seq.empty[Doc].toDS().schema).parquet(inDir).as[Doc]
    deliver("b1", b1)
    val q1 = BloomMaintenance.start(docStream, tableDir, ckpt, M, K)
    try q1.processAllAvailable() finally q1.stop()
    deliver("b2", b2)
    val q2 = BloomMaintenance.start(docStream, tableDir, ckpt, M, K)
    try q2.processAllAvailable() finally q2.stop()
    val got = BloomMaintenance.bits(spark, tableDir, M)
    val expected = BloomFilter.build(
      (b1 ++ b2).toDF("doc_id", "text")
        .select(BloomMaintenance.contentHash.as("h")), "h", M, K)
    assert(got.sameElements(expected),
      "state recovered across a full query restart must match the one-shot build")
  }

  test("admission screen: every ingested doc flags, fresh docs pass clean") {
    val tableDir = Files.createTempDirectory("graft-bloom-screen").toString
    runBatches(tableDir, Seq(b1, b2))
    val candidates = ((b1 ++ b2) ++ Seq(
      (10L, "a genuinely new document never seen before"),
      (11L, "another unseen arrival with different words")))
      .toDF("doc_id", "text")
    val screened = BloomMaintenance.screen(spark, tableDir, candidates, M, K)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // no false negatives — the correctness half of the contract
    (b1 ++ b2).foreach { case (id, _) =>
      assert(screened(id), s"ingested doc $id must be flagged")
    }
    // fresh docs clear (ε at 4 keys in 2^16 bits is ~1e-14 per probe —
    // a flag here would mean the bit math broke, not bad luck)
    assert(!screened(10L) && !screened(11L))
  }
}
