package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * codegen'd higher-order functions (no UDFs — stays inside whole-stage
  * codegen; SURVEY §7 step 7).
  *
  * Exactness: elements are cast to double and accumulated LEFT-TO-RIGHT
  * (`aggregate` is a sequential fold), which the DuckDB oracle mirrors with
  * `list_reduce(list_transform(...))` — identical operation order gives
  * bit-identical doubles, so similarity queries compare exactly.
  */
object VectorFunctions {

  /** Dot product with double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; null when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na > 0 && nb > 0, d / (na * nb)).otherwise(lit(null))
  }

  /** Random-hyperplane sign sketch: bit i of the result = sign of
    * v·planes(i). The plane matrix travels as ONE typed literal and the
    * bits accumulate in one aggregate loop — 32 separate per-plane dot
    * expressions made Janino compile ~9s of generated code; this form
    * compiles in milliseconds with identical output.
    */
  def hyperplaneSketch(v: Column, planes: Seq[Array[Double]]): Column = {
    val m = typedlit(planes.map(_.toSeq))
    aggregate(
      sequence(lit(0), lit(planes.length - 1)),
      lit(0L),
      (acc, i) => {
        val plane = element_at(m, i + 1) // literal matrix → constant-time access
        val d = aggregate(zip_with(v, plane, (x, y) => x.cast("double") * y),
          lit(0.0), (a, b) => a + b)
        acc + when(d >= 0, pow(lit(2.0), i).cast("long")).otherwise(lit(0L))
      })
  }

  // ---- DuckDB oracle mirrors (same fold order → bit-identical) ----------

  def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  def cosineSql(a: String, b: String): String =
    s"""(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"""
}
