package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProductExpr, HyperplaneSketchWideExpr, JaccardSortedExpr, MinHashSignatureExpr, SimHash64, TopKPairsAgg}
import graft.ops.Hyperplanes

/** Session extension wiring for the engine's native expressions, so a
  * cluster enables them with
  * `--conf spark.sql.extensions=graft.GraftExtensions` and every SQL user
  * gets them without touching Scala (the Spark-sanctioned way to ship
  * custom Catalyst expressions; reference's engine exposes its function
  * surface the same all-sessions way).
  *
  * Registered functions:
  *  - `simhash64(tokens)` — 64-bit SimHash of a token array;
  *  - `hyperplane_sketch(vec, seed, nbits, dim)` — wide random-hyperplane
  *    sign sketch as `array<long>` (seed/nbits/dim must be literals; the
  *    plane matrix is derived deterministically from the seed, so SQL and
  *    Scala callers agree bit-for-bit);
  *  - `top_k_pairs(id, score, k)` — bounded-heap exact top-k aggregate
  *    returning `array<struct<neighbor_id, cosine>>`, best first.
  *
  * [[GraftFunctions.registerAll]] installs the same set into an already
  * running session (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        // 5-arg form: (className, db, NAME, usage, extended)
        new ExpressionInfo("graft", null, name, usage, ""),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
}

object GraftFunctions {

  private def literalInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def literalLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, usage, builder) for every SQL-exposed native function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      "simhash64(tokens) - 64-bit SimHash of an array<string>",
      exprs => SimHash64(exprs.head)),
    ("dotp",
      "dotp(a, b) - dot product of two float/double arrays, left-fold double accumulation",
      exprs => {
        require(exprs.length == 2, "dotp(a, b)")
        DotProductExpr(exprs(0), exprs(1))
      }),
    ("jaccard_sorted",
      "jaccard_sorted(a, b) - Jaccard similarity of two sorted distinct bigint arrays",
      exprs => {
        require(exprs.length == 2, "jaccard_sorted(a, b)")
        JaccardSortedExpr(exprs(0), exprs(1))
      }),
    ("minhash_signature",
      "minhash_signature(shingles, n) - n-element MinHash signature of a bigint array",
      exprs => {
        require(exprs.length == 2, "minhash_signature(shingles, n)")
        MinHashSignatureExpr(exprs(0), literalInt(exprs(1), "n"))
      }),
    ("hyperplane_sketch",
      "hyperplane_sketch(vec, seed, nbits, dim) - sign sketch packed into array<long>",
      exprs => {
        require(exprs.length == 4, "hyperplane_sketch(vec, seed, nbits, dim)")
        val seed = literalLong(exprs(1), "seed")
        val nBits = literalInt(exprs(2), "nbits")
        val dim = literalInt(exprs(3), "dim")
        HyperplaneSketchWideExpr(exprs.head,
          Hyperplanes.generate(seed, nBits, dim).toArray)
      }),
    ("top_k_pairs",
      "top_k_pairs(id, score, k) - exact top-k (score desc, id asc) bounded-heap aggregate",
      exprs => {
        require(exprs.length == 3, "top_k_pairs(id, score, k)")
        TopKPairsAgg(exprs(0), exprs(1), literalInt(exprs(2), "k"))
      }))

  /** Install the same functions into a live session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => builder(exprs), "built-in")
    }
}
