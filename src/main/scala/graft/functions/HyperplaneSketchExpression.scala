package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: random-hyperplane sign sketch of an
  * embedding, packed into `ceil(nPlanes/64)` long words (bit i of word
  * i/64 = sign of v·planes(i)).
  *
  * Why an Expression and not the higher-order-function formulation
  * (`transform`/`aggregate`/`zip_with`): Spark's HOF expressions are
  * `CodegenFallback` — every multiply is an interpreted, boxed expression
  * eval. A 512-plane × 64-dim sketch is ~33k multiply-adds per row; the
  * HOF form made the sketch the dominant cost of embedding near-dup.
  * This expression reads float/double elements directly from ArrayData
  * and generates a tight nested Java loop inside WholeStageCodegen,
  * referencing the plane matrix as a codegen reference object.
  *
  * Vector elements beyond the plane dimension are ignored; shorter
  * vectors use the available prefix; null elements count as 0.0.
  */
case class HyperplaneSketchWideExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  private val nPlanes = planes.length
  private val nWords = (nPlanes + 63) / 64

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sketch requires array<float|double>, got ${other.catalogString}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val words = new Array[Long](nWords)
    val fl = isFloat
    var p = 0
    while (p < nPlanes) {
      val plane = planes(p)
      val n = math.min(arr.numElements(), plane.length)
      var d = 0.0
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val x = if (fl) arr.getFloat(j).toDouble else arr.getDouble(j)
          d += x * plane(j)
        }
        j += 1
      }
      if (d >= 0) words(p / 64) |= (1L << (p % 64))
      p += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, arr => {
      val words = ctx.freshName("words")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val plane = ctx.freshName("plane")
      val n = ctx.freshName("n")
      s"""
         |long[] $words = new long[$nWords];
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double[] $plane = $matRef[$p];
         |  int $n = java.lang.Math.min($arr.numElements(), $plane.length);
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$arr.isNullAt($j)) {
         |      $d += (double) $arr.$getter($j) * $plane[$j];
         |    }
         |  }
         |  if ($d >= 0) $words[$p / 64] |= (1L << ($p % 64));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketchWideExpr =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_sketch"
}

object HyperplaneSketchWideExpr {
  /** Column-level entry point. */
  def apply(c: Column, planes: Seq[Array[Double]]): Column =
    GraftBridge.column(HyperplaneSketchWideExpr(GraftBridge.expression(c), planes.toArray))
}
