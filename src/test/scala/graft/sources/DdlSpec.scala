package graft.sources

import graft.SparkSpec

/** S6 round-trip: explicit CREATE TABLE ... USING parquet DDL, SQL
  * insert/select over it, DESCRIBE introspection, idempotent re-create. */
class DdlSpec extends SparkSpec {

  test("CREATE TABLE USING parquet round-trips: insert, select, describe, drop") {
    val t = "graft_ddl_spec_source"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Ddl.createSourceTable(spark, t)
    try {
      // idempotent: IF NOT EXISTS must tolerate a second create
      Ddl.createSourceTable(spark, t)

      spark.sql(
        s"""INSERT INTO $t VALUES
           |(1, TIMESTAMP '2025-08-10 00:00:00', 11.5, 1058.0, 21.3),
           |(2, TIMESTAMP '2025-08-10 00:01:00', 12.1, 1171.3, NULL)""".stripMargin)
      val rows = spark.sql(s"SELECT id, wind_speed, ambient_temprature FROM $t ORDER BY id")
        .collect()
      assert(rows.length === 2)
      assert(rows(0).getDouble(1) === 11.5)
      assert(rows(1).isNullAt(2), "NULL must round-trip through parquet")

      // DESCRIBE surfaces the reference schema, misspelling and comments included
      val desc = Ddl.describeTable(spark, t).collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
      assert(desc("ambient_temprature")._1 === "double")
      assert(desc("timestamp")._1 === "timestamp")
      assert(desc("wind_speed")._2 === "wind speed in m/s",
        "column COMMENT must survive into the catalog")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
    assert(!spark.catalog.tableExists(t))
  }

  test("external table: data at an explicit LOCATION outlives DROP TABLE") {
    val loc = java.nio.file.Files.createTempDirectory("graft-ddl-ext").toString
    val t = "graft_ddl_spec_ext"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Ddl.createSourceTable(spark, t, Some(loc))
    spark.sql(s"INSERT INTO $t VALUES (1, TIMESTAMP '2025-08-10 00:00:00', 2.4, 0.0, 19.9)")
    spark.sql(s"DROP TABLE $t")
    // parquet files remain; a re-created table over the same location sees them
    Ddl.createSourceTable(spark, t, Some(loc))
    try assert(spark.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0) === 1L)
    finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("malformed identifiers are rejected before reaching the SQL text") {
    for (bad <- Seq("x; DROP TABLE y", "a-b", "", "db.", ".t", "t (id INT)", "a'b"))
      assertThrows[IllegalArgumentException](Ddl.createSourceTable(spark, bad))
    assertThrows[IllegalArgumentException](Ddl.describeTable(spark, "x; SELECT 1"))
  }

  test("a quoted LOCATION path cannot break out of its string literal") {
    val base = java.nio.file.Files.createTempDirectory("graft-ddl-q")
    // a directory name containing a single quote must arrive intact
    val loc = base.resolve("odd'name").toString
    val t = "graft_ddl_spec_quote"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Ddl.createSourceTable(spark, t, Some(loc))
    try {
      spark.sql(s"INSERT INTO $t VALUES (1, TIMESTAMP '2025-08-10 00:00:00', 2.4, 0.0, 19.9)")
      assert(spark.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0) === 1L)
      assert(new java.io.File(loc).exists, "data must land under the quoted path")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
