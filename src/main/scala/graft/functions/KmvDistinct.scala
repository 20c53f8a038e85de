package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** K-minimum-values distinct-count sketch (Bar-Yossef et al.) as a
  * TypedImperativeAggregate — the cardinality-sketch rung of the extension
  * ladder next to SpaceSaving's ApproxTopK.
  *
  * Keeps only the k smallest DISTINCT hash values seen (bounded memory,
  * merge = union-keep-k-smallest — order-independent, hence deterministic
  * under any partitioning, unlike HLL whose register layout is
  * engine-internal). Estimate: with hashes uniform on [0, 2^60),
  * E[kth smallest] ≈ k/(n+1)·2^60, so n̂ = (k−1)·2^60 / v_k (the unbiased
  * KMV estimator); when fewer than k distinct hashes exist the sketch holds
  * them all and the count is EXACT.
  *
  * Because the input hash is engine-portable (first 15 md5 nibbles, see
  * Relational.qKmvDistinct) and the estimator is a fixed closed form on
  * exact integers, the whole sketch is DuckDB-oracle-able — the selling
  * point over approx_count_distinct's rows-only check.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.TreeSet[Long]] {

  require(k > 1, s"need k > 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): scala.collection.mutable.TreeSet[Long] =
    scala.collection.mutable.TreeSet.empty

  private def add(buf: scala.collection.mutable.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) buf.add(v)
    else if (v < buf.last && !buf.contains(v)) { buf.remove(buf.last); buf.add(v) }

  override def update(buf: scala.collection.mutable.TreeSet[Long],
      input: InternalRow): scala.collection.mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: scala.collection.mutable.TreeSet[Long],
      other: scala.collection.mutable.TreeSet[Long]): scala.collection.mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  /** n̂ = (k−1)·2^60 / v_k, or the exact size when the sketch isn't full.
    * 255·2^60 is exactly representable (8-bit mantissa), v_k→double is the
    * same IEEE nearest-rounding DuckDB applies to BIGINT→DOUBLE, and
    * math.round matches DuckDB round() for positives — so this expression
    * is replicated verbatim in the oracle SQL. */
  override def eval(buf: scala.collection.mutable.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toLong
    else math.round((k - 1).toDouble * 1152921504606846976.0 / buf.last.toDouble)

  override def serialize(buf: scala.collection.mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = scala.collection.mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_distinct"
}

object KmvDistinct {
  /** Column API: KMV distinct estimate of a long hash column. */
  def kmvDistinct(c: Column, k: Int): Column =
    CatalystBridge.toColumn(
      KmvDistinct(CatalystBridge.toExpression(c), k).toAggregateExpression())
}
