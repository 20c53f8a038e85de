package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.graft.CatalystBridge
import graft.functions.DotProduct

/** Session extensions: makes graft's native expressions SQL-callable.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   spark.sql("SELECT dot_product(a.embedding, b.embedding) ...")
  *
  * `GraftExtensions.install(spark)` registers the same functions on an
  * already-running session (useful in notebooks / the driver harness, where
  * the session exists before the library loads).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotProductDescriptor)
    e.injectFunction(GraftExtensions.kmvDistinctDescriptor)
    e.injectOptimizerRule(graft.plans.ApproxDistinctRule)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def dotProductBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"dot_product expects 2 arguments, got ${args.length}")
    DotProduct(args.head, args(1))
  }

  private[graft] val dotProductDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    dotProductBuilder)

  /** kmv_distinct(hash_col, k): the bounded-memory KMV cardinality sketch
    * (functions/KmvDistinct) as a SQL-callable aggregate — k must be a
    * positive integer literal (it sizes the sketch buffer, so it cannot be
    * data-dependent). The analyzer wraps the returned AggregateFunction in
    * its AggregateExpression, same as builtin aggregates. */
  private def kmvDistinctBuilder(args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    require(args.length == 2,
      s"kmv_distinct expects (hash_col, k), got ${args.length} args")
    val k = args(1) match {
      case Literal(v: Int, _)  => v
      case Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"kmv_distinct: k must be an integer literal, got $other")
    }
    graft.functions.KmvDistinct(args.head, k)
  }

  private[graft] val kmvDistinctDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_distinct"),
    new ExpressionInfo(classOf[graft.functions.KmvDistinct].getName,
      "kmv_distinct"),
    kmvDistinctBuilder)

  /** Register on a live session: the SQL function plus the approx-distinct
    * optimizer rule (via experimentalMethods — the supported post-hoc hook;
    * the rule no-ops unless spark.graft.approxDistinct=true). */
  def install(spark: SparkSession): Unit = {
    CatalystBridge.registerFunction(spark, "dot_product", dotProductBuilder)
    CatalystBridge.registerFunction(spark, "kmv_distinct", kmvDistinctBuilder)
    val rule = graft.plans.ApproxDistinctRule(spark)
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[graft.plans.ApproxDistinctRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }
}
