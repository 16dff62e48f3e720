package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary jaccard stage profiler (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  -> $r"); r
    }

    val docSh = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"),
        expr("array_distinct(transform(sequence(1, size(w) - 2), i -> concat_ws(' ', w[i-1], w[i], w[i+1])))").as("ss"))
      .select(col("doc_id"), size(col("ss")).as("n_sh"), explode(col("ss")).as("s"))
    time("docSh") { docSh.count() }
    time("docSh2") { docSh.count() }

    val informative = docSh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .where(col("df").between(2, 100)).select("s")
    time("informative") { informative.count() }

    val shr = docSh.join(broadcast(informative), "s").hint("merge")
    time("shr") { shr.count() }

    val joined = shr.as("x")
      .join(shr.as("y"), col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
    time("selfjoin") { joined.count() }
    time("selfjoin2") { joined.count() }

    val agg = joined.groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n_sh").as("n_a"), col("y.n_sh").as("n_b"))
      .agg(count(lit(1)).as("inter"))
    time("agg") { agg.count() }
    spark.stop()
  }
}
