package graft.plans

import graft.functions.KmvDistinct
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Opt-in APPROXIMATE QUERY PROCESSING as a Catalyst optimizer rule — the
  * `Rule[LogicalPlan]` rung of the extension ladder (next to the DotProduct
  * expression, its SQL registration, and the as-of LogicalPlan/Strategy).
  *
  * When `spark.graft.approxDistinct=true`, every single-column
  * `count(DISTINCT x)` in the logical plan is rewritten to the bounded-memory
  * KMV sketch (k=256) over the engine-portable md5-prefix hash — the
  * classic warehouse trade: a 100 TB exact distinct needs a full shuffle of
  * all distinct values, while the sketch ships 256 longs per group and
  * merges by union. Flag off (the default): the rule is a strict no-op, so
  * installing it costs nothing.
  *
  * The rewrite happens at OPTIMIZATION time on the analyzed plan (Spark
  * plans single-distinct aggregates during physical planning, so the
  * `isDistinct` AggregateExpression is still intact here), and it preserves
  * the aggregate's resultId, so downstream references never notice the swap.
  */
case class ApproxDistinctRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Same portable hash as Relational.qKmvDistinct: first 15 md5 nibbles.
    * All casts are EXPLICIT — the analyzer (which would insert the
    * string→binary implicit cast for md5) has already run by optimization
    * time, so an implicitly-typed tree would leave the plan unresolved. */
  private def portableHash(x: Expression): Expression =
    Cast(Conv(Substring(Md5(Cast(Cast(x, StringType), BinaryType)),
      Literal(1), Literal(15)), Literal(16), Literal(10)), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.getOption("spark.graft.approxDistinct").contains("true")) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(Count(Seq(x)), _, true, None, _) =>
        ae.copy(aggregateFunction = KmvDistinct(portableHash(x), 256),
          isDistinct = false)
    }
}
