package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a TypedImperativeAggregate — the
  * custom-aggregate rung of the extension ladder (mutable sketch buffer, so
  * DeclarativeAggregate doesn't fit).
  *
  * Finds the top-k most frequent string values in bounded memory
  * (`capacity` counters per partial aggregate, merged map-side like any
  * partial agg) instead of materializing the full value→count table — at
  * 100 TB vocabulary scale that table IS the problem. Metwally et al.'s
  * guarantee: every true heavy hitter with freq > N/capacity survives, and
  * when capacity ≥ |distinct values| counts are exact (no evictions) — which
  * makes the operator oracle-checkable on data with a bounded vocabulary.
  *
  * Result: array<struct<token:string, cnt:long>>, the k highest counts,
  * ties broken by token ascending (deterministic output).
  */
case class ApproxTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  require(k > 0 && capacity >= k, s"need capacity >= k > 0, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty

  private def bump(buf: scala.collection.mutable.HashMap[String, Long],
      key: String, by: Long): Unit = {
    buf.get(key) match {
      case Some(c) => buf.update(key, c + by)
      case None if buf.size < capacity => buf.update(key, by)
      case None =>
        // SpaceSaving eviction: replace the minimum counter, inheriting its
        // count (over-estimates by at most min, never under-estimates rank)
        val (minK, minV) = buf.minBy { case (kk, vv) => (vv, kk) }
        buf.remove(minK)
        buf.update(key, minV + by)
    }
  }

  override def update(buf: scala.collection.mutable.HashMap[String, Long],
      input: InternalRow): scala.collection.mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) bump(buf, v.toString, 1L)
    buf
  }

  override def merge(buf: scala.collection.mutable.HashMap[String, Long],
      other: scala.collection.mutable.HashMap[String, Long]): scala.collection.mutable.HashMap[String, Long] = {
    // deterministic merge order so evictions (if any) are reproducible
    other.toSeq.sortBy { case (kk, vv) => (-vv, kk) }
      .foreach { case (kk, vv) => bump(buf, kk, vv) }
    buf
  }

  override def eval(buf: scala.collection.mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (kk, vv) => (-vv, kk) }.take(k)
    new GenericArrayData(top.map { case (kk, vv) =>
      InternalRow(UTF8String.fromString(kk), vv)
    }.toArray[Any])
  }

  override def serialize(buf: scala.collection.mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, vv) => out.writeUTF(kk); out.writeLong(vv) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ApproxTopK =
    copy(child = newChildren.head)
  override def prettyName: String = "approx_top_k"
}

object ApproxTopK {
  /** Column API: heavy-hitters top-k of a string column. */
  def approxTopK(c: Column, k: Int, capacity: Int): Column =
    CatalystBridge.toColumn(
      ApproxTopK(CatalystBridge.toExpression(c), k, capacity).toAggregateExpression())
}
