package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fns = SparkEntry.queries.toSeq.sortBy(_._1)
    // One untimed warm-up pass (disable with SPARK_GRAFT_WARMUP=0): the
    // timed numbers then measure the engine's steady state instead of
    // one-off JVM/classloader/Janino-codegen costs, which otherwise
    // dominate (~1s/query) and swing ±50% with host noise.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0")
      fns.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => }
      }
    val results = fns.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
