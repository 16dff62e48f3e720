package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: write `.explain("formatted")` output for named queries to
  * files (`<outDir>/<name>.txt`) — the plan-shape evidence the
  * optimization rounds commit under `plans/`. Usage:
  *   runMain graft.PlanDump <sfDir> <outDir> [query ...]   (default: Bench.headline)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.drop(1).headOption.getOrElse("/tmp/plans")
    val names = if (args.length > 2) args.drop(2).toSeq else Bench.headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // explicit-file-list reads: driver-side listing up to 1024 paths
      // (see Bench.scala for the full rationale; parameterised via env)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PAR_THRESHOLD", "1024"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val all = SparkEntry.queries
    names.foreach { name =>
      all.get(name).foreach { fn =>
        try {
          spark.catalog.clearCache()
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/$name.txt"),
            plan.getBytes("UTF-8"))
          println(s"[plandump] wrote $name")
        } catch { case e: Throwable =>
          println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
