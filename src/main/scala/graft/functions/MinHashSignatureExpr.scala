package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over a shingle-hash array: element i is
  * `min over shingles s of xxhash64(i, s)` — BIT-IDENTICAL to the HOF
  * formulation `transform(sequence(0, n-1), i => array_min(transform(sh,
  * s => xxhash64(i, s))))` because both chain Spark's XXH64 with seed 42
  * (`h = hashInt(i, 42)` — sequence() yields array<int> — then
  * `h = hashLong(s, h)`); the per-hash prefix is precomputed once.
  *
  * Why native: the HOF form is CodegenFallback — numHashes × |shingles|
  * interpreted, boxed lambda calls per document. At 32 hashes × ~200
  * shingles × corpus size that interpretation dominated the MinHash
  * dedup queries; this is two tight JIT'd long loops.
  *
  * Null shingle elements are skipped (cannot occur from the shingle
  * builders; defensive). An empty shingle array yields an array of null
  * elements, matching `array_min(empty) = null` in the HOF form.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, "numHashes must be >= 1")

  // hashInt(i, seed=42) prefixes, fixed at plan time (the HOF's hash
  // index comes from sequence() as an INT — hashInt, not hashLong)
  private lazy val prefixes: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](numHashes)
    var h = 0
    while (h < numHashes) {
      val seed = prefixes(h)
      var best = Long.MaxValue
      var seen = false
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val v = XXH64.hashLong(arr.getLong(j), seed)
          if (!seen || v < best) { best = v; seen = true }
        }
        j += 1
      }
      out(h) = if (seen) best else null
      h += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prefRef = ctx.addReferenceObj("prefixes", prefixes, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val seen = ctx.freshName("seen")
      val v = ctx.freshName("v")
      s"""
         |int $n = $arr.numElements();
         |Object[] $out = new Object[$numHashes];
         |for (int $h = 0; $h < $numHashes; $h++) {
         |  long $best = Long.MAX_VALUE;
         |  boolean $seen = false;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$arr.isNullAt($j)) {
         |      long $v = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
         |        $arr.getLong($j), $prefRef[$h]);
         |      if (!$seen || $v < $best) { $best = $v; $seen = true; }
         |    }
         |  }
         |  $out[$h] = $seen ? (Object) java.lang.Long.valueOf($best) : null;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object MinHashSignatureExpr {
  def apply(c: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSignatureExpr(GraftBridge.expression(c), numHashes))
}
