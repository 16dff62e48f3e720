package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins.
  *
  * The one manual layout decision Catalyst cannot make for you: two fact
  * tables that will be joined repeatedly on the same key should be written
  * bucketed BY that key with the SAME bucket count — then every future
  * join/aggregation on the key is planned without an Exchange on either
  * side (SortMergeJoin reads co-located buckets directly).
  *
  * At 100 TB this converts the recurring orders⋈lineitem shuffle
  * (re-paid by every query) into a one-off write-time cost. The reference
  * has no analog (its "layout" is a Postgres index,
  * `database/init_fonte.sql:13`); this is the Spark-native counterpart.
  */
object BucketedTables {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * merge-join needs no sort either). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket-join two managed tables on `key` — with matching bucket
    * layouts the physical plan contains NO Exchange and NO Sort. The
    * MERGE hint matters at demo scale: on a table small enough to
    * broadcast, Catalyst would otherwise pick BroadcastHashJoin and pay a
    * BroadcastExchange; at the scale bucketing exists for, sort-merge is
    * what the planner picks anyway. */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).hint("merge").join(spark.table(rightTable), key)
}
