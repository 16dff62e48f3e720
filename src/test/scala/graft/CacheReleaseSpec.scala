package graft

import org.apache.spark.sql.DataFrame

/** The round-13 cache-release discipline: composition queries that
  * persist a shared subframe must RELEASE it before returning — either
  * by materializing a bounded result locally (splitLeakage, the footer
  * reports) or by cutting lineage through checkpoint blocks that live
  * outside the cache manager (containment, minhashEstQuality). A
  * library caller therefore never owes a `clearCache()`: after the
  * final action on the returned frame, no cache-manager entry the query
  * created survives. (Checkpoint blocks are exempt — they are reclaimed
  * by the context cleaner when the frame is dropped and were never part
  * of the clearCache() contract.) */
class CacheReleaseSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def assertReleased(name: String)(mk: => DataFrame): Unit = {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    mk.count() // the library caller's final action
    val leaked = spark.sparkContext.getPersistentRDDs.filterNot {
      case (id, rdd) => before(id) ||
        rdd.isCheckpointed || rdd.getCheckpointFile.isDefined
    }
    assert(leaked.isEmpty,
      s"$name left ${leaked.size} cached RDD(s) pinned: " +
        leaked.values.map(_.name).mkString(", "))
  }

  test("persist-heavy queries leave no cache-manager entries behind") {
    assertReleased("splitLeakage")(ext.Curation.splitLeakage(spark, dir))
    assertReleased("footerPrune")(ext.Layout.footerPrune(spark, dir))
    assertReleased("footerPruneStr")(ext.Layout.footerPruneStr(spark, dir))
    assertReleased("deltaRead")(ext.Layout.deltaRead(spark, dir))
    assertReleased("deltaFold")(ext.Layout.deltaFold(spark, dir))
    assertReleased("compactionExec")(ext.Layout.compactionExec(spark, dir))
    assertReleased("footerPruneMixed")(ext.Layout.footerPruneMixed(spark, dir))
    assertReleased("lakeE2e")(ext.Layout.lakeE2e(spark, dir))
    assertReleased("lakeEvolve")(ext.Layout.lakeEvolve(spark, dir))
    assertReleased("lakeVacuum")(ext.Layout.lakeVacuum(spark, dir))
    assertReleased("lakeTimetravel")(ext.Layout.lakeTimetravel(spark, dir))
    assertReleased("lakeWiden")(ext.Layout.lakeWiden(spark, dir))
    assertReleased("lakeChanges")(ext.Layout.lakeChanges(spark, dir))
    assertReleased("cdcApply")(ext.Layout.cdcApply(spark, dir))
    assertReleased("lakeDelete")(ext.Layout.lakeDelete(spark, dir))
    assertReleased("lakeIngestStream")(
      streaming.LakeIngestStream.lakeIngestStream(spark, dir))
    assertReleased("bucketedAttribution")(
      sources.BucketedTables.bucketedAttribution(spark, dir))
    assertReleased("kAnonView")(ext.Redaction.kAnonView(spark, dir))
    assertReleased("containment")(ext.Dedup.containment(spark, dir))
    assertReleased("minhashEstQuality")(ext.Dedup.minhashEstQuality(spark, dir))
    // the loop family always released internally (the discipline the
    // conversions above adopted) — keep it pinned here too
    assertReleased("dupClusters")(ext.Curation.dupClusters(spark, dir))
  }
}
