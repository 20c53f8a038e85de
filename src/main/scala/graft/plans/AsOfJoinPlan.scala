package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class operator: for every left row, the single
  * right row with the same key and the greatest time <= the left row's time
  * (LEFT OUTER semantics — unmatched left rows pair with nulls).
  *
  * Spark has no native as-of join; composing it from union + window works
  * (operators/AsOf.asofJoinComposed) but materializes a carried-forward
  * column per attribute and pays a window over the UNION of both sides. This
  * physical operator instead sort-merges the two sides directly — the plan a
  * time-series engine would pick:
  *
  *   - requiredChildDistribution co-hash-partitions both sides on the key
  *     (EnsureRequirements inserts the exchanges; at 100 TB these are the
  *     only shuffles, same as an equi-join),
  *   - requiredChildOrdering sorts each partition by (key, time),
  *   - doExecute streams both sorted iterators with a two-pointer merge —
  *     O(n+m) per partition, constant memory (one buffered right row).
  *
  * Registered via spark.experimental.extraStrategies (see operators/AsOf).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      // one-row lookahead into the right side + the best match so far for
      // the CURRENT left key (right rows are consumed at most once: O(n+m))
      var rHead: InternalRow = null
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null

      def peekRight(): InternalRow = {
        if (rHead == null && rIter.hasNext) rHead = rIter.next()
        rHead
      }

      lIter.map { lRow =>
        val k = lk.eval(lRow)
        val t = lt.eval(lRow)
        if (lastMatchKey == null || keyOrd.compare(lastMatchKey, k) != 0) {
          lastMatch = null; lastMatchKey = k
        }
        if (k != null && t != null) {
          var done = false
          while (!done && peekRight() != null) {
            val rKeyV = rk.eval(rHead)
            val cmp = if (rKeyV == null) -1 else keyOrd.compare(rKeyV, k)
            if (cmp < 0) {
              rHead = null // behind the current key: discard
            } else if (cmp > 0) {
              done = true // ahead of the current key: keep buffered
            } else {
              val rTimeV = rt.eval(rHead)
              if (rTimeV == null) {
                // a null time can never be "nearest preceding"; discard and
                // keep scanning (nulls sort FIRST, so stopping here would
                // wedge the merge and starve every later right row of the key)
                rHead = null
              } else if (timeOrd.compare(rTimeV, t) <= 0) {
                lastMatch = rHead.copy(); rHead = null
              } else {
                done = true // too new for this left row (and all before it)
              }
            }
          }
        }
        proj(joined(lRow, if (lastMatch != null) lastMatch else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
