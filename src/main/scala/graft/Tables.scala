package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver's parquet star schema (TESTDATA.md).
  *
  * Parquet is the engine's source of truth — the reference's HTTP/Postgres
  * layers (reference `api/app/database.py:41-64`) are transport, not
  * semantics (SURVEY.md S1/S2). Filters and projections applied downstream
  * of these readers reach the scan via Catalyst pushdown, so the readers
  * stay bare.
  */
object Tables {

  /** Inferred-schema cache keyed by (path, mtime signature): every bare
    * `spark.read.parquet` schedules a schema-inference job (~90 ms of
    * driver latency), and composition queries read the same tables 4-6
    * times PER INVOCATION — across the 195-query registry this was
    * thousands of redundant metadata jobs per bench run. The mtime key
    * self-invalidates when a fixture dir is rewritten (overwrite
    * changes the directory's entries); a non-local or unstat-able path
    * yields signature 0 and falls back to plain inference, never a
    * stale schema. The cache holds schemas only (KBs), keyed by
    * path — session-independent because the FILES define the schema. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), org.apache.spark.sql.types.StructType]()

  /** Change signature of the path: newest lastModified among the path,
    * its direct children, and one nested level of grandchildren (the
    * `key=value` partition-dir layout), PLUS the file count and total
    * byte size over the same set — mtime alone has 1-second granularity
    * on some filesystems, so a fixture rewritten within the same second
    * with a changed schema could be served the stale cached schema; a
    * rewrite that changes any file's size or the file census misses the
    * cache regardless of timestamps. The grandchild level matters
    * because an IN-PLACE rewrite of a file inside a partition
    * subdirectory touches neither the parent dir's mtime (only entry
    * creation/deletion does) nor any direct-child size — a directory's
    * File.length() is not its contents' size (ADVICE r13). Rewrites
    * nested DEEPER than one partition level are out of the signature's
    * scope; none of this repo's fixtures nest further. Empty string
    * when the path is not a stat-able local file. */
  private def mtimeSignature(path: String): String =
    try {
      val f = new java.io.File(path)
      if (!f.exists) ""
      else {
        def ls(d: java.io.File): Seq[java.io.File] =
          if (d.isDirectory) Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
          else Nil
        val children = ls(f)
        val grand = children.flatMap(ls)
        val all = children ++ grand
        val maxM = (f.lastModified +: all.map(_.lastModified)).max
        s"$maxM:${all.size}:${all.map(_.length).sum + f.length}"
      }
    } catch { case scala.util.control.NonFatal(_) => "" }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) (TESTDATA/FIXTURES): Spark has
    // no nanosecond timestamp type and rejects the column outright; read it
    // as raw nanos and truncate to micros below — same truncation DuckDB
    // applies when it coerces TIMESTAMP_NS to its microsecond TIMESTAMP.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The driver owns SparkSession construction (no config-time
    // GraftExtensions), and every query path reads through here — so this
    // is the session-level installation point for the engine's native
    // optimizations. Both registrations are idempotent and O(1).
    graft.functions.Md5ConvRewrite.register(spark)
    graft.functions.BloomFilter.register(spark)
    val path = s"$dir/$name.parquet"
    val sig = mtimeSignature(path)
    if (sig.isEmpty) spark.read.parquet(path)
    else {
      val schema = schemaCache.computeIfAbsent((path, sig),
        _ => spark.read.parquet(path).schema)
      spark.read.schema(schema).parquet(path)
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      // integer `div`, not `/`: epoch-nanos (~1.7e18) overflows a double's
      // 53-bit mantissa, so float division would corrupt timestamps
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
      // TIMESTAMP_NTZ, which unix_micros / timestamp arithmetic rejects
      // outright. Every entry point pins session TZ to UTC, so the cast
      // reinterprets the same wall-clock micros with zero value shift —
      // and matches DuckDB, which treats the column as plain TIMESTAMP.
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
