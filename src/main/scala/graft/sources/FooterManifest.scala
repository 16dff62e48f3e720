package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed parquet-footer manifest: one row per (file, column) with
  * row count and min/max range, read from the REAL file footers — the
  * metadata every lakehouse pruning layer (and Spark's own row-group
  * filter pushdown) consults.
  *
  * Why this exists: [[graft.ext.Layout]] PLANS z-ordered layouts;
  * `writeZOrdered`/`writeZCelled` write them. This is the production
  * read-back piece — the stats come from what parquet actually
  * persisted, so a reader can prune files before touching data; the
  * registry's `x_zorder_prune` and `x_footer_prune` run the full
  * plan → write → read-back-prune loop through it under the oracle
  * gate. At 100 TB a table is 10⁵–10⁶ files: the footer
  * reads are distributed (`mapPartitions` over the file list — each
  * task opens only footers, ~KB per file, zero data pages), while the
  * driver holds only the file-name list, the same metadata the
  * FileIndex already materializes for any scan. The manifest itself is
  * files×columns rows — a frame, joinable/aggregable like any other, so
  * pruning is an ordinary range predicate on it, not a planner hack.
  *
  * Column coverage: numeric and date physical types (INT32/INT64/FLOAT/
  * DOUBLE) surface as doubles — the range-pruning use case; binary/
  * string stats are skipped (truncation semantics differ by writer).
  * A row group with missing or empty stats yields a NULL range row, so
  * a pruning consumer can (and must) treat that file as always-needed —
  * the conservative reader contract, spec-pinned.
  */
object FooterManifest {

  /** One (file, column) manifest row; `min_v`/`max_v` are None when any
    * row group lacks usable stats for the column. */
  case class FooterStat(file: String, n_rows: Long, column: String,
      min_v: Option[Double], max_v: Option[Double])

  /** Recursive parquet part-file listing (driver-side, file NAMES only). */
  private def listParquet(spark: SparkSession, dir: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[String] = fs.listStatus(p).toSeq.flatMap { st =>
      if (st.isDirectory) walk(st.getPath)
      else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath.toString)
      else Nil
    }
    if (fs.exists(root)) walk(root) else Nil
  }

  /** Build the manifest for `columns` of every parquet file under `dir`.
    * Footer reads run on executors, one task per ~`filesPerTask` files. */
  def build(spark: SparkSession, dir: String, columns: Seq[String],
      filesPerTask: Int = 64): DataFrame = {
    import spark.implicits._
    val files = listParquet(spark, dir)
    if (files.isEmpty)
      return spark.emptyDataset[FooterStat].toDF()
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, files.size / filesPerTask + 1))
    val colList = columns // stable serializable copy for the closure
    spark.createDataset(files).repartition(parts)
      .mapPartitions { it =>
        // executor-local Configuration: footers resolve the filesystem
        // from the path URI; default conf suffices for hdfs:///file:/ —
        // object-store credentials ride the cluster-wide core-site
        val conf = new org.apache.hadoop.conf.Configuration()
        it.flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(f), conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            import scala.jdk.CollectionConverters._
            val blocks = reader.getFooter.getBlocks.asScala.toSeq
            val nRows = blocks.map(_.getRowCount).sum
            colList.map { c =>
              // fold row-group ranges; any group without usable stats
              // poisons the column to NULL (conservative)
              val ranges = blocks.map { b =>
                b.getColumns.asScala.find(_.getPath.toDotString == c)
                  .map(_.getStatistics)
                  .filter(s => s != null && !s.isEmpty && s.hasNonNullValue)
                  .flatMap { s =>
                    (s.genericGetMin, s.genericGetMax) match {
                      case (mn: Number, mx: Number) =>
                        Some((mn.doubleValue, mx.doubleValue))
                      case _ => None // binary/string stats: not range-pruned
                    }
                  }
              }
              val folded =
                if (blocks.isEmpty || ranges.exists(_.isEmpty)) None
                else Some((ranges.flatten.map(_._1).min, ranges.flatten.map(_._2).max))
              FooterStat(f, nRows, c, folded.map(_._1), folded.map(_._2))
            }
          } finally reader.close()
        }
      }.toDF()
  }

  /** Total row count of the parquet file(s) under `path`, from footer
    * metadata alone — the catalog-statistics answer to "how big is this
    * table", with NO Spark job (a `df.count()`, even metadata-optimized,
    * schedules a job per invocation). Driver-side sequential footer
    * reads: right for the sizing decisions this serves (e.g.
    * [[graft.ext.Similarity]]'s LSH plane count — an index-build-time
    * constant), where the input is one table's worth of footers; a
    * 10⁵-file lake table should go through the distributed [[build]]
    * and aggregate `n_rows` instead. */
  def rowCountFromFooters(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    listParquet(spark, path).map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new Path(f), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      } finally reader.close()
    }.sum
  }

  /** Files a range query must read, decided from a [[build]] manifest:
    * a file is pruned iff ANY queried column's manifest range provably
    * misses the query box; it survives otherwise — and a NULL range
    * keeps the file (the conservative contract). `box` maps column →
    * [lo, hi] inclusive. */
  def filesToRead(manifest: DataFrame, box: Map[String, (Double, Double)]): DataFrame = {
    // per (file, column): does this column rule the file OUT?
    val prunable = box.foldLeft(lit(false)) { case (acc, (c, (lo, hi))) =>
      acc || (col("column") === c && col("min_v").isNotNull &&
        (col("max_v") < lo || col("min_v") > hi))
    }
    manifest
      .groupBy(col("file"))
      .agg(max(prunable.cast("int")).as("pruned"), first(col("n_rows")).as("n_rows"))
      // zero-row files prune unconditionally: they have no stats (no row
      // groups) but also provably no matching rows
      .where(col("pruned") === 0 && col("n_rows") > 0)
      .select(col("file"), col("n_rows"))
  }
}
