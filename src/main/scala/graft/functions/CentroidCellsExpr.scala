package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: the 1-based indices of the `nProbe`
  * centroids with the highest dot product against the input vector,
  * best first (ties → lower index). With unit-norm centroids, argmax of
  * dot product equals argmax of cosine — the row vector's norm is a
  * constant factor across centroids — so this is IVF cell assignment
  * (`nProbe = 1`) and query probing (`nProbe > 1`) in one expression.
  *
  * Why native: the HOF formulation (an `array(...)` of 16 `aggregate`-fold
  * cosines, sorted by comparator lambda) is CodegenFallback — ~k·dim boxed
  * multiply-adds per row. This generates one tight nested loop plus an
  * `nProbe`-pass selection inside WholeStageCodegen, with the centroid
  * matrix as a codegen reference object.
  *
  * Vector elements beyond the centroid dimension are ignored; null
  * elements count as 0.0.
  */
case class CentroidCellsExpr(child: Expression, centroids: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {

  private val k = centroids.length
  require(nProbe >= 1 && nProbe <= k, s"nProbe must be in [1, $k]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_cells requires array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      val n = math.min(arr.numElements(), cent.length)
      var d = 0.0
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val x = if (fl) arr.getFloat(j).toDouble else arr.getDouble(j)
          d += x * cent(j)
        }
        j += 1
      }
      scores(c) = d
      c += 1
    }
    val out = new Array[Long](nProbe)
    val taken = new Array[Boolean](k)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!taken(i) && scores(i) > bestScore) { best = i; bestScore = scores(i) }
        i += 1
      }
      taken(best) = true
      out(p) = best + 1L
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, arr => {
      val scores = ctx.freshName("scores")
      val taken = ctx.freshName("taken")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val cent = ctx.freshName("cent")
      val p = ctx.freshName("p")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val i = ctx.freshName("i")
      s"""
         |double[] $scores = new double[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  double[] $cent = $matRef[$c];
         |  int $n = java.lang.Math.min($arr.numElements(), $cent.length);
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$arr.isNullAt($j)) {
         |      $d += (double) $arr.$getter($j) * $cent[$j];
         |    }
         |  }
         |  $scores[$c] = $d;
         |}
         |long[] $out = new long[$nProbe];
         |boolean[] $taken = new boolean[$k];
         |for (int $p = 0; $p < $nProbe; $p++) {
         |  int $best = -1;
         |  double $bestScore = Double.NEGATIVE_INFINITY;
         |  for (int $i = 0; $i < $k; $i++) {
         |    if (!$taken[$i] && $scores[$i] > $bestScore) { $best = $i; $bestScore = $scores[$i]; }
         |  }
         |  $taken[$best] = true;
         |  $out[$p] = $best + 1L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidCellsExpr =
    copy(child = newChild)
  override def prettyName: String = "centroid_cells"
}

object CentroidCellsExpr {
  /** Column-level entry point. */
  def apply(c: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    GraftBridge.column(CentroidCellsExpr(GraftBridge.expression(c), centroids, nProbe))
}
