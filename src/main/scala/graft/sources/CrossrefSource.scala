package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.SparkSession

import graft.ingest.Crossref

/** DataSource V2 connector for CrossRef page files — the S1 cluster path
  * (SURVEY §2.1): `spark.read.format("graft.sources.CrossrefSource")
  * .load(dir)` yields one row per WORK (the `message.items` explode is
  * done inside the partition reader), with one InputPartition per page
  * file so a thousand-executor cluster scans a cursor-sharded dump in
  * parallel.
  *
  * Column pruning is honored (SupportsPushDownRequiredColumns): the
  * reader materializes only the requested top-level work fields. In live
  * deployment the same shape fetches cursor shards over HTTP instead of
  * reading files; the driver loop of the reference (PIPE:563-733) maps to
  * the planner enumerating cursor ranges as partitions.
  */
class CrossrefSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Crossref.workSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    // honor a user-supplied read schema (fields must be a subset of the
    // work schema — the reader materializes by name)
    new CrossrefTable(properties.get("path"), schema)
}

class CrossrefTable(path: String, schema0: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"crossref($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new CrossrefScanBuilder(
      Option(options.get("path")).getOrElse(path), schema0)
}

class CrossrefScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // the engine asks only for what the query needs; keep field order
    required = requiredSchema
  }

  override def build(): Scan = new CrossrefScan(path, required)
}

case class CrossrefPagePartition(file: String) extends InputPartition

class CrossrefScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
          .filter(f => f.endsWith(".jsonl") || f.endsWith(".json"))
      else Array(path)
    files.sorted.map(CrossrefPagePartition(_): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the session's Hadoop settings to the reader tasks — a bare
    // `new Configuration()` there would drop spark.hadoop.* (fs creds,
    // custom schemes) and fail on non-default filesystems. BROADCAST
    // once (Hadoop's compact writable form) instead of embedding a
    // hundreds-of-entries map in every task closure and rebuilding a
    // Configuration entry-by-entry per partition reader.
    val sc = SparkSession.active.sparkContext
    val bc = sc.broadcast(
      new SerializableHadoopConf(sc.hadoopConfiguration))
    new CrossrefReaderFactory(required, bc)
  }
}

/** Hadoop `Configuration` is not `java.io.Serializable`; this wrapper
  * round-trips it through its own compact Writable form (the same idea
  * as Spark's internal SerializableConfiguration, which is
  * private[spark]).
  */
class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

class CrossrefReaderFactory(required: StructType,
    conf: org.apache.spark.broadcast.Broadcast[SerializableHadoopConf])
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new CrossrefPageReader(
      partition.asInstanceOf[CrossrefPagePartition].file, required,
      conf)
}

/** Reads one JSONL page file, parses each envelope line with Jackson
  * (shipped with Spark), and emits one InternalRow per work item,
  * projected to the required schema. Absent fields → null, matching the
  * reference's defensive `.get` reads.
  */
class CrossrefPageReader(file: String, required: StructType,
    confBc: org.apache.spark.broadcast.Broadcast[SerializableHadoopConf])
    extends PartitionReader[InternalRow] {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val stream = {
    val p = new Path(file)
    p.getFileSystem(confBc.value.value).open(p)
  }
  private val lines = new java.io.BufferedReader(
    new java.io.InputStreamReader(stream, "UTF-8"))
  private var items: Iterator[com.fasterxml.jackson.databind.JsonNode] =
    Iterator.empty
  private var current: InternalRow = _

  private def nextItems(): Boolean = {
    var line = lines.readLine()
    while (line != null && line.trim.isEmpty) line = lines.readLine()
    if (line == null) false
    else {
      val node = mapper.readTree(line)
      val arr = node.path("message").path("items")
      items =
        if (arr.isArray) arr.elements().asScala
        else Iterator.empty
      true
    }
  }

  override def next(): Boolean = {
    while (!items.hasNext) if (!nextItems()) return false
    current = JsonNodeConverter.toRow(items.next(), required)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = { lines.close() }
}

/** JsonNode → InternalRow conversion driven by the required StructType —
  * only requested fields are materialized (the pruning contract).
  */
object JsonNodeConverter {
  import com.fasterxml.jackson.databind.JsonNode
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  def toRow(node: JsonNode, schema: StructType): InternalRow = {
    val values = schema.fields.map(f => convert(node.get(f.name), f.dataType))
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  private def convert(n: JsonNode, dt: DataType): Any = {
    if (n == null || n.isNull) return null
    dt match {
      case StringType =>
        if (n.isValueNode) UTF8String.fromString(n.asText()) else null
      case IntegerType => if (n.isNumber) Int.box(n.asInt()) else null
      case LongType => if (n.isNumber) Long.box(n.asLong()) else null
      case DoubleType => if (n.isNumber) Double.box(n.asDouble()) else null
      case BooleanType => if (n.isBoolean) Boolean.box(n.asBoolean()) else null
      case at: ArrayType =>
        if (!n.isArray) null
        else {
          val elems = n.elements().asScala
            .map(e => convert(e, at.elementType)).toArray[Any]
          new GenericArrayData(elems): ArrayData
        }
      case st: StructType => if (n.isObject) toRow(n, st) else null
      case _ => null
    }
  }
}
