package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProductExpr, FreqItemsAgg, FreqMergeAgg, FreqTopItemsExpr, HyperplaneSketchWideExpr, JaccardSortedExpr, KllDoublesAgg, KllMergeAgg, KllSummaryExpr, KmvBottomKAgg, MinHashSignatureExpr, SimHash64, ThetaDiffExpr, ThetaEstimateExpr, ThetaPairExpr, ThetaSketchAgg, ThetaUnionAgg, TopKPairsAgg}
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
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        // 5-arg form: (className, db, NAME, usage, extended)
        new ExpressionInfo("graft", null, name, usage, ""),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
    // NO injectOptimizerRule: a window-top-1 → argmin-aggregate rewrite
    // was built, A/B-measured, and DELETED — Spark 4's own
    // InferWindowGroupLimit already plans a PARTIAL WindowGroupLimit
    // before the exchange (map-side per-group top-k with codegen'd
    // sort), and the interpreted aggregate measured 1.2× slower at sf10.
    // DECISIONS.md records the full finding; the engine's window-form
    // operators (J1/W1) get the optimal plan from stock Spark.
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
  private def literalDouble(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
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
      }),
    // the mergeable-sketch tier (q243-q248): aggregates emit serialized
    // sketch bytes, scalars read them — same monoids as the Scala API
    ("theta_sketch",
      "theta_sketch(v, lgK) - theta distinct-set sketch of a bigint column (compact bytes)",
      exprs => {
        require(exprs.length == 2, "theta_sketch(v, lgK)")
        ThetaSketchAgg(exprs(0), literalInt(exprs(1), "lgK"))
      }),
    ("theta_union",
      "theta_union(sketch, lgK) - union of serialized theta sketches (compact bytes)",
      exprs => {
        require(exprs.length == 2, "theta_union(sketch, lgK)")
        ThetaUnionAgg(exprs(0), literalInt(exprs(1), "lgK"))
      }),
    ("theta_estimate",
      "theta_estimate(sketch) - distinct estimate of a serialized theta sketch",
      exprs => {
        require(exprs.length == 1, "theta_estimate(sketch)")
        ThetaEstimateExpr(exprs.head)
      }),
    ("theta_pair",
      "theta_pair(a, b) - struct(union_est, intersect_est) of two theta sketches",
      exprs => {
        require(exprs.length == 2, "theta_pair(a, b)")
        ThetaPairExpr(exprs(0), exprs(1))
      }),
    ("theta_diff",
      "theta_diff(a, b) - A-NOT-B distinct estimate of two theta sketches",
      exprs => {
        require(exprs.length == 2, "theta_diff(a, b)")
        ThetaDiffExpr(exprs(0), exprs(1))
      }),
    ("freq_sketch",
      "freq_sketch(item, maxMapSize) - frequent-items sketch of a string column (bytes)",
      exprs => {
        require(exprs.length == 2, "freq_sketch(item, maxMapSize)")
        FreqItemsAgg(exprs(0), literalInt(exprs(1), "maxMapSize"))
      }),
    ("freq_merge",
      "freq_merge(sketch, maxMapSize) - merge of serialized frequent-items sketches",
      exprs => {
        require(exprs.length == 2, "freq_merge(sketch, maxMapSize)")
        FreqMergeAgg(exprs(0), literalInt(exprs(1), "maxMapSize"))
      }),
    ("freq_top_items",
      "freq_top_items(sketch) - heavy hitters with [lower, upper] brackets, NO_FALSE_NEGATIVES",
      exprs => {
        require(exprs.length == 1, "freq_top_items(sketch)")
        FreqTopItemsExpr(exprs.head)
      }),
    ("kll_sketch",
      "kll_sketch(v, k) - KLL quantile sketch of a double column (bytes)",
      exprs => {
        require(exprs.length == 2, "kll_sketch(v, k)")
        KllDoublesAgg(exprs(0), literalInt(exprs(1), "k"))
      }),
    ("kll_merge",
      "kll_merge(sketch, k) - merge of serialized KLL sketches",
      exprs => {
        require(exprs.length == 2, "kll_merge(sketch, k)")
        KllMergeAgg(exprs(0), literalInt(exprs(1), "k"))
      }),
    ("kll_summary",
      "kll_summary(sketch, rank, ...) - struct(n, min_value, max_value, quantiles) at the literal ranks",
      exprs => {
        require(exprs.length >= 2, "kll_summary(sketch, rank, ...)")
        KllSummaryExpr(exprs.head, exprs.tail.map(literalDouble(_, "rank")))
      }),
    ("kmv_bottom_k",
      "kmv_bottom_k(v, k) - the k smallest distinct bigints (deterministic KMV sketch state)",
      exprs => {
        require(exprs.length == 2, "kmv_bottom_k(v, k)")
        KmvBottomKAgg(exprs(0), literalInt(exprs(1), "k"))
      }))

  /** Install the same functions into a live session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => builder(exprs), "built-in")
    }
}
