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
import org.apache.spark.sql.connector
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate
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

  // writes land in empty directories, where inference has nothing to read:
  // accept the dataframe's schema from Spark instead of inferring
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonlV2.inferSchema(JsonlV2.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftJsonlTable(schema,
      JsonlV2.pathOf(new CaseInsensitiveStringMap(properties)))
}

class GraftJsonlTable(tblSchema: StructType, path: String)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-jsonl $path"
  override def schema(): StructType = tblSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftJsonlScanBuilder(tblSchema, path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftJsonlWriteBuilder(info.schema(), path, info.queryId())
}

/** BATCH WRITE with the standard two-phase task-commit protocol: each task
  * writes to `path/_temporary/<query>/<task-uuid>.jsonl`, task commit()
  * reports the temp file, and the DRIVER-side job commit() renames every
  * reported file into `path/` — a failed/speculative task's file is simply
  * never reported, and abort() sweeps the temp dir. That is the same
  * visibility contract the built-in file sources give (output appears
  * all-or-nothing on job success) without requiring a rename-atomic store.
  * Append-only: like the read side, a fresh directory per staging run. */
class GraftJsonlWriteBuilder(schema: StructType, path: String, queryId: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder {
  import org.apache.spark.sql.connector.write._
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftJsonlBatchWrite(schema.json, path, queryId)
  }
}

case class GraftJsonlCommit(tempFile: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

class GraftJsonlBatchWrite(schemaJson: String, path: String, queryId: String)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  private def fs = FileSystem.get(new java.net.URI(path),
    SparkSession.active.sessionState.newHadoopConf())
  private def tempDir = new Path(path, s"_temporary/$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftJsonlWriterFactory(schemaJson, path, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs
    f.mkdirs(new Path(path))
    messages.foreach { case GraftJsonlCommit(tmp) =>
      val src = new Path(tmp)
      val dst = new Path(path, src.getName)
      // a false return (destination exists, permissions, cross-FS move)
      // would silently drop this task's output — fail the job instead, so
      // commit stays all-or-nothing
      if (!f.rename(src, dst))
        throw new java.io.IOException(s"jsonl commit: rename $src -> $dst failed")
    }
    f.delete(tempDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    fs.delete(tempDir, true)
}

class GraftJsonlWriterFactory(schemaJson: String, path: String, queryId: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new GraftJsonlDataWriter(
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      path, queryId, partitionId, taskId)
}

class GraftJsonlDataWriter(schema: StructType, path: String, queryId: String,
    partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val fs = FileSystem.get(new java.net.URI(path),
    new org.apache.hadoop.conf.Configuration())
  // taskId in the name keeps speculative/retried attempts from colliding
  private val tempFile =
    new Path(path, s"_temporary/$queryId/part-$partitionId-$taskId.jsonl")
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(tempFile, true), "UTF-8"))
  private val mapper = new ObjectMapper

  override def write(row: InternalRow): Unit = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) node.putNull(f.name)
      else f.dataType match {
        case LongType => node.put(f.name, row.getLong(i))
        case DoubleType => node.put(f.name, row.getDouble(i))
        case _ => node.put(f.name, row.getUTF8String(i).toString)
      }
    }
    out.write(mapper.writeValueAsString(node))
    out.write("\n")
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    GraftJsonlCommit(tempFile.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(tempFile, false)
  }

  override def close(): Unit = ()
}

class GraftJsonlScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[JsonlAgg] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(JsonlV2.supported)
    // return every filter as residual: Spark re-evaluates (correctness
    // belt-and-braces), while the reader already skips non-matching rows
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** PARTIAL aggregate pushdown (supportCompletePushDown stays false): each
    * partition emits one pre-aggregated row per group and Spark runs the
    * final merge (sum-of-counts, sum-of-sums, min-of-mins…). This is the
    * connector-side version of map-side combine: a 1000-file scan ships
    * |groups| rows per file instead of every line. Only translations this
    * reader can hold exactly are accepted — COUNT(*)/COUNT(col)/SUM/MIN/MAX
    * over single BIGINT fields (and COUNT over any field); anything else
    * (double sums would reorder float addition, expressions, DISTINCT)
    * refuses pushdown and falls back to a plain scan. */
  override def pushAggregation(agg: aggregate.Aggregation): Boolean = {
    def fieldOf(e: connector.expressions.Expression): Option[StructField] = e match {
      case nr: connector.expressions.NamedReference if nr.fieldNames.length == 1 =>
        fullSchema.fields.find(_.name == nr.fieldNames.head)
      case _ => None
    }
    val groups = agg.groupByExpressions.toSeq.map(fieldOf)
    // Global (no GROUP BY) aggregates don't push: a fully-filtered
    // partition emits zero partial rows, so a pushed global COUNT over an
    // all-filtered file would yield no row where the unpushed plan returns
    // 0 — refuse rather than diverge on the empty case.
    if (groups.isEmpty || groups.exists(_.isEmpty)) return false
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: aggregate.CountStar => Some(JsonlAggCol("count_star", ""))
      case c: aggregate.Count if !c.isDistinct =>
        fieldOf(c.column).map(f => JsonlAggCol("count", f.name))
      case s: aggregate.Sum if !s.isDistinct =>
        fieldOf(s.column).filter(_.dataType == LongType)
          .map(f => JsonlAggCol("sum", f.name))
      case m: aggregate.Min =>
        fieldOf(m.column).filter(_.dataType == LongType)
          .map(f => JsonlAggCol("min", f.name))
      case m: aggregate.Max =>
        fieldOf(m.column).filter(_.dataType == LongType)
          .map(f => JsonlAggCol("max", f.name))
      case _ => None
    }
    if (specs.exists(_.isEmpty)) return false
    pushedAgg = Some(JsonlAgg(groups.map(_.get.name), specs.map(_.get)))
    true
  }

  override def build(): Scan =
    new GraftJsonlScan(fullSchema, required, pushed, pushedAgg, path)
}

/** One accepted aggregate column: kind ∈ count_star|count|sum|min|max. */
case class JsonlAggCol(kind: String, field: String)

/** The pushed (partial) aggregation: group field names + agg columns. */
case class JsonlAgg(groupFields: Seq[String], aggs: Seq[JsonlAggCol]) {
  /** Scan output schema Spark expects: group columns first, then one
    * BIGINT per aggregate (count/sum/min/max of BIGINT are all BIGINT). */
  def schema(full: StructType): StructType = StructType(
    groupFields.map(g => full.fields.find(_.name == g).get) ++
      aggs.zipWithIndex.map { case (a, i) =>
        StructField(s"${a.kind}_${if (a.field.isEmpty) "star" else a.field}_$i",
          LongType, nullable = true)
      })
}

class GraftJsonlScan(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], agg: Option[JsonlAgg], path: String)
    extends Scan with Batch {

  override def readSchema(): StructType =
    agg.map(_.schema(fullSchema)).getOrElse(required)

  override def description(): String =
    s"GraftJsonlScan PushedFilters: [${pushed.mkString(", ")}], " +
      agg.map(a => s"PushedAggregation: [${a.aggs.map(c => s"${c.kind}(${c.field})")
        .mkString(", ")}], PushedGroupBy: [${a.groupFields.mkString(", ")}], ").getOrElse("") +
      s"ReadSchema: ${readSchema().catalogString}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    JsonlV2.listFiles(path).map(f => GraftJsonlPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftJsonlReaderFactory(fullSchema.json, required.json, pushed, agg)
}

case class GraftJsonlPartition(file: String) extends InputPartition

/** Ships as (schema-json, filters) — StructType itself is not serializable
  * across all Spark versions, its JSON form always is. */
class GraftJsonlReaderFactory(fullJson: String, requiredJson: String,
    pushed: Array[Filter], agg: Option[JsonlAgg]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val full = DataType.fromJson(fullJson).asInstanceOf[StructType]
    val file = p.asInstanceOf[GraftJsonlPartition].file
    agg match {
      case Some(a) => new GraftJsonlAggReader(full, pushed, a, file)
      case None => new GraftJsonlPartitionReader(full,
        DataType.fromJson(requiredJson).asInstanceOf[StructType], pushed, file)
    }
  }
}

/** Per-partition PRE-AGGREGATION reader: streams the file once, holds one
  * accumulator row per group (|groups| ≪ |lines| memory), then emits the
  * partial rows. Spark's final aggregate merges partials across partitions,
  * so semantics equal the unpushed plan exactly — integers only, no float
  * reorder. */
class GraftJsonlAggReader(full: StructType, pushed: Array[Filter],
    agg: JsonlAgg, file: String) extends PartitionReader[InternalRow] {

  private val inner = new GraftJsonlPartitionReader(full, full, pushed, file)

  // per group: (counts/sums seeded 0; min/max seeded null via hasValue=false)
  private final class Acc {
    val vals = new Array[Long](agg.aggs.length)
    val has = new Array[Boolean](agg.aggs.length)
  }

  private lazy val rows: Iterator[InternalRow] = {
    val fieldIdx = full.fields.map(_.name).zipWithIndex.toMap
    val gIdx = agg.groupFields.map(fieldIdx)
    val aIdx = agg.aggs.map(a => if (a.field.isEmpty) -1 else fieldIdx(a.field))
    val groups = scala.collection.mutable.LinkedHashMap[Seq[Any], Acc]()
    while (inner.next()) {
      val row = inner.get()
      // safe to hold across lines: the inner reader builds a fresh
      // GenericInternalRow (fresh UTF8Strings) per line, no buffer reuse
      val key = gIdx.map(i => row.get(i, full.fields(i).dataType))
      val acc = groups.getOrElseUpdate(key, new Acc)
      var j = 0
      while (j < agg.aggs.length) {
        val spec = agg.aggs(j)
        val isNull = aIdx(j) >= 0 && row.isNullAt(aIdx(j))
        spec.kind match {
          case "count_star" => acc.vals(j) += 1; acc.has(j) = true
          case "count" => if (!isNull) { acc.vals(j) += 1 }; acc.has(j) = true
          case "sum" => if (!isNull) { acc.vals(j) += row.getLong(aIdx(j)); acc.has(j) = true }
          case "min" => if (!isNull) {
            val v = row.getLong(aIdx(j))
            if (!acc.has(j) || v < acc.vals(j)) acc.vals(j) = v
            acc.has(j) = true
          }
          case "max" => if (!isNull) {
            val v = row.getLong(aIdx(j))
            if (!acc.has(j) || v > acc.vals(j)) acc.vals(j) = v
            acc.has(j) = true
          }
        }
        j += 1
      }
    }
    inner.close()
    groups.iterator.map { case (key, acc) =>
      val aggVals: Seq[Any] = agg.aggs.indices.map { j =>
        agg.aggs(j).kind match {
          case "count_star" | "count" => acc.vals(j)
          case _ => if (acc.has(j)) acc.vals(j) else null
        }
      }
      new GenericInternalRow((key ++ aggVals).toArray[Any])
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = inner.close()
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
