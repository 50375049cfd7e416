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
    * v·planes(i). Requires ≤ 64 planes; delegates to the native
    * codegen'd [[HyperplaneSketchWideExpr]] and unwraps the single word.
    */
  def hyperplaneSketch(v: Column, planes: Seq[Array[Double]]): Column = {
    require(planes.length <= 64, "hyperplaneSketch packs into one long; use hyperplaneSketchWide")
    element_at(HyperplaneSketchWideExpr(v, planes), 1)
  }

  /** Wide random-hyperplane sketch: packs `planes.length` sign bits into
    * an `array<long>` of ⌈n/64⌉ words (bit i of word ⌊i/64⌋ = sign of
    * v·planes(i)). Word layout is little-endian in plane index, so word 1
    * holds planes 0..63 — callers can reuse its low bits as LSH band keys
    * and the full array as a hamming prefilter with one sketch
    * computation. Native codegen'd expression (see
    * [[HyperplaneSketchWideExpr]] for why not HOFs).
    */
  def hyperplaneSketchWide(v: Column, planes: Seq[Array[Double]]): Column =
    HyperplaneSketchWideExpr(v, planes)

  /** Hamming distance between two `array<long>` sketches of `words`
    * elements. Unrolled into `words` codegen'd `bit_count(xor)` terms —
    * the `zip_with`+`aggregate` HOF form is CodegenFallback and pays
    * boxed interpretation per word per pair, which matters when this
    * runs per candidate pair.
    */
  def hammingWide(a: Column, b: Column, words: Int): Column =
    (1 to words).map(i =>
      bit_count(element_at(a, i).bitwiseXOR(element_at(b, i))).cast("long"))
      .reduce(_ + _)

  // ---- DuckDB oracle mirrors (same fold order → bit-identical) ----------

  def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  def cosineSql(a: String, b: String): String =
    s"""(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"""
}
