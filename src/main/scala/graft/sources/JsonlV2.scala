package graft.sources

import java.util

import scala.collection.JavaConverters._
import scala.io.Source

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 implementation of a flat-JSONL reader — the last
  * rung of the Spark extension ladder (expression → SQL registration →
  * plan/strategy/exec → optimizer rule → CONNECTOR): `spark.read
  * .format("graft-jsonl")` with
  *
  *  - distributed schema INFERENCE from a bounded sample (first 100 lines;
  *    long ⊂ double ⊂ string widening),
  *  - COLUMN PRUNING pushed into the scan (SupportsPushDownRequiredColumns:
  *    only requested fields are extracted from each parsed line),
  *  - FILTER PUSHDOWN (SupportsPushDownFilters: =, <, <=, >, >=, IsNotNull
  *    evaluated inside the partition reader, so filtered rows never reach
  *    Spark; Spark re-evaluates residually — the conservative contract),
  *  - one InputPartition per file (the natural split unit for line data;
  *    a production source would add intra-file byte-range splits).
  *
  * The scan's `description()` reports PushedFilters + ReadSchema exactly
  * like the built-in file sources, so `.explain` shows what reached the
  * scan and PlanSpec can assert it. Registered via the DataSourceRegister
  * META-INF service as short name `graft-jsonl`.
  */
class GraftJsonlSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-jsonl"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonlV2.inferSchema(JsonlV2.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftJsonlTable(schema,
      JsonlV2.pathOf(new CaseInsensitiveStringMap(properties)))
}

class GraftJsonlTable(tblSchema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-jsonl $path"
  override def schema(): StructType = tblSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftJsonlScanBuilder(tblSchema, path)
}

class GraftJsonlScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(JsonlV2.supported)
    // return every filter as residual: Spark re-evaluates (correctness
    // belt-and-braces), while the reader already skips non-matching rows
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GraftJsonlScan(fullSchema, required, pushed, path)
}

class GraftJsonlScan(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], path: String) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftJsonlScan PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    JsonlV2.listFiles(path).map(f => GraftJsonlPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftJsonlReaderFactory(fullSchema.json, required.json, pushed)
}

case class GraftJsonlPartition(file: String) extends InputPartition

/** Ships as (schema-json, filters) — StructType itself is not serializable
  * across all Spark versions, its JSON form always is. */
class GraftJsonlReaderFactory(fullJson: String, requiredJson: String,
    pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftJsonlPartitionReader(
      DataType.fromJson(fullJson).asInstanceOf[StructType],
      DataType.fromJson(requiredJson).asInstanceOf[StructType],
      pushed, p.asInstanceOf[GraftJsonlPartition].file)
}

class GraftJsonlPartitionReader(full: StructType, required: StructType,
    pushed: Array[Filter], file: String) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper
  private val src = Source.fromInputStream(
    FileSystem.get(new java.net.URI(file),
      new org.apache.hadoop.conf.Configuration())
      .open(new Path(file)), "UTF-8")
  private val lines = src.getLines()
  private var current: InternalRow = _

  private def fieldValue(node: JsonNode, name: String, dt: DataType): Any = {
    val v = node.get(name)
    if (v == null || v.isNull) null
    else dt match {
      case LongType => v.asLong()
      case DoubleType => v.asDouble()
      case _ => UTF8String.fromString(if (v.isTextual) v.asText() else v.toString)
    }
  }

  private def matches(node: JsonNode): Boolean = pushed.forall {
    case EqualTo(a, v) => cmpTo(node, a, v).contains(0)
    case GreaterThan(a, v) => cmpTo(node, a, v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmpTo(node, a, v).exists(_ >= 0)
    case LessThan(a, v) => cmpTo(node, a, v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmpTo(node, a, v).exists(_ <= 0)
    case IsNotNull(a) => val v = node.get(a); v != null && !v.isNull
    case _ => true
  }

  /** sign of (node.field compared to the filter literal); None when the
    * field is null/absent (SQL comparison semantics: never matches) */
  private def cmpTo(node: JsonNode, attr: String, l: Any): Option[Int] = {
    val f = full.fields.find(_.name == attr).getOrElse(return None)
    val raw = node.get(attr)
    if (raw == null || raw.isNull) return None
    f.dataType match {
      case LongType => Some(java.lang.Long.compare(raw.asLong(), toLong(l)))
      case DoubleType => Some(java.lang.Double.compare(raw.asDouble(), toDouble(l)))
      case _ =>
        val s = if (raw.isTextual) raw.asText() else raw.toString
        Some(s.compareTo(l.toString))
    }
  }

  private def toLong(v: Any): Long = v match {
    case n: Number => n.longValue(); case s => s.toString.toLong
  }
  private def toDouble(v: Any): Double = v match {
    case n: Number => n.doubleValue(); case s => s.toString.toDouble
  }

  override def next(): Boolean = {
    while (lines.hasNext) {
      val line = lines.next()
      if (line.trim.nonEmpty) {
        val node = mapper.readTree(line)
        if (matches(node)) {
          current = new GenericInternalRow(
            required.fields.map(f => fieldValue(node, f.name, f.dataType)))
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = src.close()
}

/** Shared driver-side helpers: path resolution, file listing, inference. */
object JsonlV2 {

  /** Filters the reader knows how to evaluate (reported as pushed). */
  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: IsNotNull => true
    case _ => false
  }

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-jsonl requires a path")
    p
  }

  def listFiles(path: String): Seq[String] = {
    val hconf = SparkSession.active.sessionState.newHadoopConf()
    val fs = FileSystem.get(new java.net.URI(path), hconf)
    val st = fs.getFileStatus(new Path(path))
    val files =
      if (st.isDirectory) fs.listStatus(new Path(path)).toSeq.map(_.getPath)
      else Seq(st.getPath)
    files.filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .map(_.toString).sorted
  }

  /** Bounded-sample inference: first 100 lines of the first file; per field
    * the narrowest of long ⊂ double ⊂ string that fits every observation.
    * Fields sort by name for a deterministic column order. */
  def inferSchema(path: String): StructType = {
    val mapper = new ObjectMapper
    val first = listFiles(path).headOption
      .getOrElse(throw new IllegalArgumentException(s"no files under $path"))
    val hconf = SparkSession.active.sessionState.newHadoopConf()
    val fs = FileSystem.get(new java.net.URI(first), hconf)
    val src = Source.fromInputStream(fs.open(new Path(first)), "UTF-8")
    try {
      val kinds = scala.collection.mutable.LinkedHashMap[String, DataType]()
      src.getLines().take(100).filter(_.trim.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        node.fields().asScala.foreach { e =>
          val dt =
            if (e.getValue.isIntegralNumber) LongType
            else if (e.getValue.isNumber) DoubleType
            else StringType
          kinds(e.getKey) = (kinds.get(e.getKey), dt) match {
            case (None, d) => d
            case (Some(a), b) if a == b => a
            case (Some(LongType), DoubleType) | (Some(DoubleType), LongType) => DoubleType
            case _ => StringType
          }
        }
      }
      StructType(kinds.toSeq.sortBy(_._1).map { case (n, t) =>
        StructField(n, t, nullable = true)
      })
    } finally src.close()
  }
}
