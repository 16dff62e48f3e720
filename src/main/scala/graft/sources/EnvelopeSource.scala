package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 reader for the reference's HTTP-API JSON envelope —
  * `{"data": [{col: val}, …], "count": N, "filters": {…}, "metadata": {…}}`
  * (`api/app/main.py:143-158`; timestamps ISO-serialized at `:139-141`).
  *
  * SURVEY.md §2.1 S1 maps the API to plain table reads (the API is
  * transport, the table is truth) — this source is the LITERAL-fidelity
  * option: point the engine at a directory of captured envelope payloads
  * and they scan like any table, with V2 column pruning (a projection of
  * 2 columns parses and materializes only those 2 fields).
  *
  * Scale shape: the driver lists files (one InputPartition per envelope
  * file — the API pages by day, so files ≙ daily partitions); executors
  * parse in parallel. No driver-side row materialization anywhere.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.EnvelopeSource")
  *     .schema(EnvelopeSource.referenceSchema)   // or rely on the default
  *     .load("/path/to/envelopes")
  * }}}
  */
class EnvelopeSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EnvelopeSource.referenceSchema

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EnvelopeTable(schema, properties.get("path"))
}

object EnvelopeSource {
  /** The reference source table's shape (`database/init_fonte.sql:4-10`) —
    * including its load-bearing `ambient_temprature` misspelling
    * (`api/app/main.py:69,124`). */
  val referenceSchema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("wind_speed", DoubleType),
    StructField("power", DoubleType),
    StructField("ambient_temprature", DoubleType)))
}

private class EnvelopeTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"envelope($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EnvelopeScanBuilder(tableSchema, path, options)
}

/** Column pruning: Spark hands us the narrowed schema; the reader then
  * parses only those fields out of each JSON record. */
private class EnvelopeScanBuilder(fullSchema: StructType, path: String,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new EnvelopeScan(required, path, options)
}

private class EnvelopeScan(schema: StructType, path: String,
    options: CaseInsensitiveStringMap) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"EnvelopeScan ReadSchema: ${schema.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val files =
      if (fs.getFileStatus(hPath).isDirectory)
        fs.listStatus(hPath).filter(_.isFile).map(_.getPath.toString)
          .filter(_.endsWith(".json")).sorted
      else Array(path)
    files.map(f => EnvelopeInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val bc = spark.sparkContext.broadcast(conf)
    EnvelopeReaderFactory(schema, bc)
  }
}

private case class EnvelopeInputPartition(file: String) extends InputPartition

private case class EnvelopeReaderFactory(schema: StructType,
    conf: Broadcast[SerializableConfiguration]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EnvelopeReader(partition.asInstanceOf[EnvelopeInputPartition].file, schema,
      conf.value.value)
}

/** Parses one envelope file; emits one InternalRow per `data[]` element,
  * materializing only the pruned schema's fields. */
private class EnvelopeReader(file: String, schema: StructType,
    hadoopConf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[JsonNode] = {
    val p = new Path(file)
    val in = FileSystem.get(p.toUri, hadoopConf).open(p)
    try {
      val root = new ObjectMapper().readTree(in)
      val data = root.get("data")
      require(data != null && data.isArray, s"$file: envelope has no data[] array")
      data.elements().asScala.toVector.iterator
    } finally in.close()
  }
  private var cur: JsonNode = _

  override def next(): Boolean = { val h = rows.hasNext; if (h) cur = rows.next(); h }

  override def get(): InternalRow = {
    val values = schema.fields.map { f =>
      val node = cur.get(f.name)
      if (node == null || node.isNull) null
      else f.dataType match {
        case TimestampType =>
          // reference serializes datetime.isoformat() (`api/app/main.py:141`)
          DateTimeUtils.stringToTimestampAnsi(
            UTF8String.fromString(node.asText), java.time.ZoneOffset.UTC)
        case DoubleType  => node.asDouble
        case LongType    => node.asLong
        case IntegerType => node.asInt
        case StringType  => UTF8String.fromString(node.asText)
        case dt => throw new IllegalArgumentException(
          s"EnvelopeSource: unsupported field type $dt for '${f.name}'")
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = ()
}
