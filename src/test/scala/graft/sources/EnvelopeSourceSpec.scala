package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** DSv2 envelope source: parses the reference's API payload shape, one
  * partition per file, with V2 column pruning. */
class EnvelopeSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-envelope")
    // two captured daily payloads in the reference's serialization shape
    // (api/app/main.py:143-158; isoformat timestamps, count, filters)
    Files.writeString(d.resolve("day1.json"),
      """{"data": [
        |  {"timestamp": "2025-08-10T00:00:00", "wind_speed": 11.5, "power": 1058.0, "ambient_temprature": 21.3},
        |  {"timestamp": "2025-08-10T00:01:00", "wind_speed": 12.1, "power": 1171.3, "ambient_temprature": null}
        |], "count": 2,
        |"filters": {"start_date": "2025-08-10", "end_date": null, "variables": null},
        |"metadata": {"frequency": "1 minuto"}}""".stripMargin)
    Files.writeString(d.resolve("day2.json"),
      """{"data": [
        |  {"timestamp": "2025-08-11T00:00:00", "wind_speed": 2.4, "power": 0.0, "ambient_temprature": 19.9}
        |], "count": 1, "filters": {}, "metadata": {}}""".stripMargin)
    d.toString
  }

  private def read = spark.read
    .format("graft.sources.EnvelopeSource")
    .load(dir)

  test("reads all envelope files with the reference schema, nulls preserved") {
    val rows = read.orderBy("timestamp").collect()
    assert(rows.length === 3)
    assert(read.schema === EnvelopeSource.referenceSchema)
    assert(rows(0).getDouble(1) === 11.5)
    assert(rows(0).getTimestamp(0) === java.sql.Timestamp.valueOf("2025-08-10 00:00:00"))
    assert(rows(1).isNullAt(3), "JSON null must surface as SQL NULL")
    assert(rows(2).getDouble(2) === 0.0)
  }

  test("V2 column pruning reaches the scan: projected read parses only 2 fields") {
    val df = read.select("timestamp", "power")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("EnvelopeScan ReadSchema: struct<timestamp:timestamp,power:double>"),
      s"pruned schema must reach the V2 scan:\n$scan")
    assert(df.collect().map(_.getDouble(1)).sorted === Array(0.0, 1058.0, 1171.3))
  }

  test("one input partition per envelope file (parallel parse shape)") {
    assert(read.rdd.getNumPartitions === 2)
  }

  test("aggregates compose over the source like any table") {
    import org.apache.spark.sql.functions._
    val r = read.agg(count(lit(1)), round(avg("wind_speed"), 2)).head()
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === 8.67)
  }
}
