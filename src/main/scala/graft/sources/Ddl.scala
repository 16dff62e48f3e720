package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Explicit DDL surface (SURVEY §2.1 S6) — the reference's database
  * bootstrap re-expressed as Spark SQL DDL over parquet tables
  * (`database/init_fonte.sql:4-20`):
  *
  *  - `CREATE TABLE (id SERIAL, timestamp, wind_speed, power,
  *    ambient_temprature)` → `CREATE TABLE ... USING parquet` with the
  *    same columns and COMMENTs. Postgres' auto-incrementing SERIAL has
  *    no distributed analog (a global counter is a single point of
  *    contention at any scale); ingest assigns ids explicitly — the
  *    engine's deterministic-hash discipline — so the column is plain
  *    BIGINT here.
  *  - `CREATE INDEX ON data(timestamp)` → no secondary indexes over
  *    parquet; the Spark-native counterpart is layout (daily partition
  *    dirs in [[PartitionedSink]], bucketing in [[BucketedTables]]) plus
  *    parquet min/max pruning, which the engine's scans already use.
  *  - `COMMENT ON TABLE/COLUMN` → inline `COMMENT` clauses, surfaced by
  *    `DESCRIBE TABLE`.
  *
  * The misspelled `ambient_temprature` is load-bearing reference fidelity
  * (`api/app/main.py:69,124`).
  */
object Ddl {

  /** Column DDL shared by [[createSourceTable]] and CTAS callers. */
  private val sourceColumns: String =
    """id BIGINT NOT NULL COMMENT 'row id (assigned by ingest, not SERIAL)',
      |timestamp TIMESTAMP NOT NULL COMMENT 'measurement timestamp',
      |wind_speed DOUBLE COMMENT 'wind speed in m/s',
      |power DOUBLE COMMENT 'power in kW',
      |ambient_temprature DOUBLE COMMENT 'ambient temperature in Celsius'""".stripMargin

  /** Guard for interpolated identifiers — the same fail-loud discipline as
    * the P8 validation module ([[graft.ops.Validation]]): a `db.table`
    * path of plain identifiers only, so a hostile or mistyped name cannot
    * rewrite the DDL text it is spliced into. */
  private def validateIdentifier(table: String): String = {
    require(table.split('.').forall(_.matches("[A-Za-z_][A-Za-z0-9_]*"))
      && table.nonEmpty && !table.endsWith(".") && !table.startsWith("."),
      s"not a valid table identifier: '$table'")
    table
  }

  /** `CREATE TABLE IF NOT EXISTS` for the reference source table. Pass a
    * `location` for an external table (data outlives DROP TABLE); omit it
    * for a managed table in the session warehouse. */
  def createSourceTable(spark: SparkSession, table: String,
      location: Option[String] = None): Unit = {
    // single quotes in the path are SQL-escaped by doubling, so a quoted
    // location can never terminate the string literal early
    val loc = location.map(l => s" LOCATION '${l.replace("'", "''")}'").getOrElse("")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS ${validateIdentifier(table)} ($sourceColumns)
         |USING parquet
         |COMMENT 'sensor data: timestamp, wind speed, power, ambient temperature'
         |$loc""".stripMargin)
  }

  /** `DESCRIBE TABLE` as data — the introspection the reference exposes
    * through information_schema (`dagster/assets.py:261-307`); pairs with
    * the driver-side [[graft.ops.Analytics.catalogStructure]]. */
  def describeTable(spark: SparkSession, table: String): DataFrame =
    spark.sql(s"DESCRIBE TABLE ${validateIdentifier(table)}")

  /** External DAY-partitioned fact table over a [[PartitionedSink]] lake
    * path — the catalog face of the daily layout. The sink writes `day=…`
    * directories straight to storage (catalog-less by design: ingest
    * must not depend on metastore availability); this DDL +
    * [[discoverPartitions]] is how a 100 TB lake operator registers that
    * layout for SQL users, partition pruning included. */
  def createDailyTable(spark: SparkSession, table: String,
      location: String): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS ${validateIdentifier(table)}
         |($sourceColumns, day DATE COMMENT 'daily partition (derived from timestamp)')
         |USING parquet
         |PARTITIONED BY (day)
         |LOCATION '${location.replace("'", "''")}'""".stripMargin)

  /** `MSCK REPAIR TABLE`: sync the catalog with partition directories
    * written BEHIND it (each [[PartitionedSink.writeDaily]] run can add
    * late days). Until this runs, a freshly-registered external
    * partitioned table sees zero rows — partition metadata, not file
    * listing, drives its scans. */
  def discoverPartitions(spark: SparkSession, table: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE ${validateIdentifier(table)}")

  /** `SHOW PARTITIONS` as data (one `day=…` row per registered partition). */
  def showPartitions(spark: SparkSession, table: String): DataFrame =
    spark.sql(s"SHOW PARTITIONS ${validateIdentifier(table)}")
}
