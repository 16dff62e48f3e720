package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: run named queries N times (default 2) against a
  * data dir and print per-run wall times + the formatted physical plan of
  * the first run. Usage:
  *   runMain graft.Profile <sfDir> [runs] [query ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(2)
    val names = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // separate knob for shuffle-partition experiments (defaults to cpus,
    // matching Bench): lets a profile isolate task-scheduling overhead
    // from parallelism
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // default 100 entries overflows on the iterative queries (~155
      // generated classes per dupClusters run), so EVERY run recompiles
      // everything — static conf, must be set at session build
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "2000"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // explicit-file-list reads: driver-side listing up to 1024 paths
      // (see Bench.scala for the full rationale; parameterised via env)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PAR_THRESHOLD", "1024"))
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    val selected = SparkEntry.queries.filter { case (n, _) => names.isEmpty || names(n) }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        // clear per RUN, not just per query: internal persist()s stay hot
        // across runs otherwise (cache manager keys on canonicalized
        // plans) and later runs measure cached reads, not execution
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s ${times.map(t => f"$t%7.2f").mkString(" ")}")
      if (names.nonEmpty) {
        val df = fn(spark, sfDir)
        df.count() // materialize so AQE settles on the final plan
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
