package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.SaveMode

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  /** user 1 walks a → a → b → a: consecutive duplicates must collapse,
    * the return to `a` must open a NEW version (not merge with v1). */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-scd2").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "a", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "a", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 1L, "b", 1.0, "{}"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), 1L, "a", 1.0, "{}"),
      (5L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 2L, "c", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/events.parquet")
    d
  }

  test("SCD2 collapses runs, reopens on return, closes intervals end-to-end") {
    val rows = Incremental.scd2Intervals(spark, dir)
      .collect().map(r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("version"), r.getAs[String]("state"),
          r.getAs[java.sql.Timestamp]("valid_from").toString,
          r.getAs[java.sql.Timestamp]("valid_to").toString,
          r.getAs[Int]("is_current"), r.getAs[Long]("n_events")))
    val u1 = rows.filter(_._1 == 1L)
    assert(u1.length === 3, s"a-run, b, a-return = 3 versions: ${u1.mkString(";")}")
    assert(u1(0) === ((1L, 1L, "a", "2024-01-01 00:00:00.0", "2024-01-01 02:00:00.0", 0, 2L)))
    assert(u1(1) === ((1L, 2L, "b", "2024-01-01 02:00:00.0", "2024-01-01 03:00:00.0", 0, 1L)))
    assert(u1(2)._3 === "a" && u1(2)._6 === 1 && u1(2)._5.startsWith("9999-12-31"),
      s"returned state is a NEW current version with the open-end sentinel: ${u1(2)}")
    val u2 = rows.filter(_._1 == 2L)
    assert(u2.length === 1 && u2(0)._6 === 1, "single-event user is one current version")
    // intervals tile the timeline: each valid_to == next valid_from
    assert(u1(0)._5 === u1(1)._4 && u1(1)._5 === u1(2)._4)
  }
}
