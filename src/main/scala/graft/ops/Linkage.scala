package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy record linkage (entity resolution) — the blocking + edit-distance
  * discipline (Fellegi-Sunter style candidate generation): records are
  * grouped into small BLOCKS by cheap deterministic keys, and the quadratic
  * comparison runs only inside a block. The all-pairs comparison is never a
  * production shape; at 100 TB the entire scale story is the blocking key.
  *
  * Scale posture:
  *  - the block self-join shuffles both sides on the block key once; AQE
  *    reuses the exchange for the window-based size cap (same key);
  *  - oversized blocks (stopword-like keys — the skew risk, exactly the
  *    jaccardJoinPrefix df-cap situation) are DROPPED via `maxBlock`, a
  *    deterministic knob mirrored in the oracle, not silently sampled;
  *  - the in-block comparison uses Spark's THRESHOLDED `levenshtein(l, r, t)`
  *    (banded DP, O(t·n) per pair, early exit) rather than the full O(n·m)
  *    distance; the oracle states the unthresholded distance with a `<= t`
  *    filter — same result set, slower oracle, fast engine.
  */
object Linkage {

  /** Candidate near-match pairs within blocks: all (a, b) with equal
    * non-null block keys, `a.keyCol < b.keyCol`, and
    * `levenshtein(a.nameCol, b.nameCol) <= maxDist`. Blocks larger than
    * `maxBlock` records are excluded entirely (deterministic skew guard —
    * a degenerate key like an empty token would otherwise reintroduce the
    * quadratic all-pairs blowup the blocking exists to prevent).
    *
    * Output: (k1, name1, k2, name2, dist), dist as BIGINT.
    */
  def fuzzyPairs(df: DataFrame, keyCol: String, nameCol: String,
                 blockCols: Seq[Column], maxDist: Int, maxBlock: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist >= 0: $maxDist")
    require(maxBlock >= 2, s"maxBlock >= 2: $maxBlock")
    val blocks = blockCols.zipWithIndex.map { case (c, i) => c.alias(s"__b$i") }
    val bNames = blocks.indices.map(i => s"__b$i")
    val base = df.select((col(keyCol) +: col(nameCol) +: blocks): _*)
      .filter(bNames.map(col(_).isNotNull).reduce(_ && _))
    val sized = base.withColumn("__bsz",
      count(lit(1)).over(Window.partitionBy(bNames.map(col): _*)))
    val capped = sized.filter(col("__bsz") <= maxBlock).drop("__bsz")
    val joinCond = bNames.map(n => col(s"a.$n") === col(s"b.$n")).reduce(_ && _) &&
      (col(s"a.$keyCol") < col(s"b.$keyCol"))
    val d = levenshtein(col(s"a.$nameCol"), col(s"b.$nameCol"), maxDist)
    capped.alias("a").join(capped.alias("b"), joinCond)
      // sound prefilter: edit distance >= |length delta|, so a cheap
      // length check skips the DP for most in-block pairs
      .filter(abs(length(col(s"a.$nameCol")) - length(col(s"b.$nameCol"))) <= maxDist)
      .withColumn("__d", d)
      .filter(col("__d") >= 0) // thresholded form returns -1 above maxDist
      .select(
        col(s"a.$keyCol").alias("k1"), col(s"a.$nameCol").alias("name1"),
        col(s"b.$keyCol").alias("k2"), col(s"b.$nameCol").alias("name2"),
        col("__d").cast("long").alias("dist"))
  }

  /** Resolve fuzzy match pairs into entity clusters: connected components
    * over the [[fuzzyPairs]] match graph (transitive closure — A≈B and
    * B≈C put all three in one entity even when A and C exceed the edit
    * budget). Reuses the dedup family's pointer-doubling components
    * (O(log d) rounds); output is (key, entity_id = min key of the
    * component), singletons included.
    */
  def resolveEntities(df: DataFrame, keyCol: String, nameCol: String,
                      blockCols: Seq[Column], maxDist: Int, maxBlock: Int): DataFrame = {
    val pairs = fuzzyPairs(df, keyCol, nameCol, blockCols, maxDist, maxBlock)
      .select(col("k1").cast("long").alias("id_a"), col("k2").cast("long").alias("id_b"))
    val labels = Dedup.connectedComponentsFast(pairs)
    df.select(col(keyCol).cast("long").alias(keyCol)).distinct()
      .join(labels.withColumnRenamed("id", keyCol), Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("component"), col(keyCol)).alias("entity_id"))
  }
}
