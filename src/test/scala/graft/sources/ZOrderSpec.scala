package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Z-order layout: the skipping benefit must be measurable from per-file
  * min/max stats (what parquet row-group pruning actually uses), not
  * asserted by construction. */
class ZOrderSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, "/root/testdata/sf0.001")
  private lazy val tmp = Files.createTempDirectory("graft-zorder").toString

  /** Files whose [min,max] box intersects the query box — the files a
    * stats-pruning reader must open. */
  private def filesNeeded(path: String, u: (Long, Long), v: (Double, Double)): (Int, Int) = {
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
    val needed = files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min("user_id"), max("user_id"), min("value"), max("value")).head()
      r.getLong(0) <= u._2 && r.getLong(1) >= u._1 &&
        r.getDouble(2) <= v._2 && r.getDouble(3) >= v._1
    }
    (needed, files.size)
  }

  test("z-ordered layout prunes a 2-D box query that natural order cannot") {
    val nat = s"$tmp/natural"
    val zor = s"$tmp/zordered"
    events.repartition(8).write.mode("overwrite").parquet(nat)
    PartitionedSink.writeZOrdered(events, zor, Seq("user_id", "value"), files = 8)

    // rows survive the rewrite exactly
    val back = spark.read.parquet(zor)
    assert(back.count() === events.count())
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)

    // ~10%-per-dimension box in the middle of both ranges
    val b = events.agg(min("user_id"), max("user_id"), min("value"), max("value")).head()
    val (uLo, uHi) = (b.getLong(0), b.getLong(1))
    val (vLo, vHi) = (b.getDouble(2), b.getDouble(3))
    val uBox = (uLo + (uHi - uLo) * 45 / 100, uLo + (uHi - uLo) * 55 / 100)
    val vBox = (vLo + (vHi - vLo) * 0.45, vLo + (vHi - vLo) * 0.55)

    val (natNeed, natTotal) = filesNeeded(nat, uBox, vBox)
    val (zNeed, zTotal) = filesNeeded(zor, uBox, vBox)
    assert(natTotal >= 8 && zTotal >= 2)
    assert(natNeed === natTotal,
      s"round-robin files all span the full range ($natNeed/$natTotal)")
    assert(zNeed < natNeed,
      s"z-order must prune the box query: z $zNeed/$zTotal vs natural $natNeed/$natTotal")
    info(s"box query reads $zNeed/$zTotal z-ordered files vs $natNeed/$natTotal natural")
  }

  test("null z-column rows survive (quantized to bucket 0)") {
    import spark.implicits._
    val d = s"$tmp/nulls"
    val df = Seq[(java.lang.Long, java.lang.Double)]((1L, 2.0), (null, 3.0), (5L, null))
      .toDF("user_id", "value")
    PartitionedSink.writeZOrdered(df, d, Seq("user_id", "value"), files = 2)
    assert(spark.read.parquet(d).count() === 3)
  }
}
