package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the per-row MinHash signature hot path.
  *
  * The streaming near-dup probe computes, per arriving row, the minimum of
  * `xxhash64(lit(i), shingle)` over a shingle ARRAY for i = 0..k−1. As
  * higher-order functions (`array_min(transform(...))` × k) that is k
  * interpreted array traversals per row — ScaleSmoke attributed the sf10
  * arrival-side linear term almost entirely to them (r15 verdict item 3b).
  * This expression makes ONE pass over the array computing all k running
  * minima in a primitive long[] inside whole-stage codegen.
  *
  * Hash parity is EXACT with the built-in: Spark's `xxhash64(lit(i), x)`
  * folds children left to right from seed 42 — `hashInt(i, 42)` then
  * `hashUTF8String(x, ·)` — so each per-i seed is precomputed once and the
  * per-element work is the same `XXH64.hashUTF8String` call the builtin
  * makes. The staged corpus index (built with the builtin) and this probe
  * therefore agree bit for bit; MinHashSigSpec asserts it on real shingles.
  *
  * Null semantics mirror `array_min(transform(...))`: null input or empty
  * array → null; null elements are skipped (the builtin's null child
  * contributes no hash and array_min ignores nulls).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string>, got ${other.sql}")
    }

  /** Per-i seeds: xxhash64's fold of the leading int literal, hoisted out
    * of the per-element loop (hashInt(i, 42) is constant per i). */
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) null
    else {
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          var k = 0
          while (k < numHashes) {
            val h = XXH64.hashUTF8String(s, seeds(k))
            if (h < mins(k)) mins(k) = h
            k += 1
          }
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val mins = ctx.freshName("mins")
      val str = ctx.freshName("str")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      org.apache.spark.unsafe.types.UTF8String $str =
         |        $a.getUTF8String($i);
         |      for (int $k = 0; $k < $numHashes; $k++) {
         |        long $h = $xxh.hashUTF8String($str, $seedsRef[$k]);
         |        if ($h < $mins[$k]) $mins[$k] = $h;
         |      }
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** All k per-row MinHash minima of `xxhash64(lit(i), element)` over an
    * array<string> column, as one array<long> column (codegen'd, one
    * array pass). */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    toColumn(MinHashSig(toExpression(shingles), numHashes))
}
