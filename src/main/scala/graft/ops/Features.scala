package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Feature-engineering operators for ML training pipelines: categorical
  * dictionary encoding, leakage-safe target encoding, and grouped
  * closed-form OLS. All three follow the exactness policy (integer /
  * decimal accumulation, one identical double derivation at the end) so
  * their outputs hash-verify cross-engine.
  */
object Features {

  private val Acc = DecimalType(30, 8)

  /** Dense dictionary encoding of a categorical column: terms get stable
    * ids 1..|vocab| in lexicographic order, and rows join their id. The
    * ordered pass runs over the DISTINCT terms (dictionary-sized, not
    * corpus-sized); the encode join broadcasts the dictionary — at 100 TB
    * the corpus never shuffles for an encode. Lexicographic ids are
    * REPRODUCIBLE across runs and engines, unlike hash or first-seen
    * ordering.
    */
  def dictionaryEncode(df: DataFrame, termCol: String, idCol: String): DataFrame = {
    val dict = df.select(col(termCol)).distinct()
      .withColumn(idCol,
        row_number().over(Window.orderBy(col(termCol))).cast("long"))
    df.join(broadcast(dict), Seq(termCol))
  }

  /** Leave-one-out target encoding: each row's category is encoded as the
    * mean of the TARGET over the OTHER rows of the category —
    * `(Σy − y) / (n − 1)` — the standard leakage control (plain mean
    * encoding lets a row see its own label; LOO is what you train on).
    * Singleton categories get null (no other rows to average).
    *
    * One hash aggregate (decimal Σy + count per category) broadcast back;
    * the per-row subtraction/divide is map-side. Exactness: Σy
    * accumulates in decimal; `(Σy − y)` happens in decimal (exact), and
    * ONE double divide ends the chain.
    */
  def targetEncodeLOO(df: DataFrame, catCol: String, targetCol: String,
                      outCol: String): DataFrame = {
    val agg = df.groupBy(col(catCol))
      .agg(sum(col(targetCol).cast(Acc)).alias("__sy"),
        count(col(targetCol)).alias("__n"))
    df.join(broadcast(agg), Seq(catCol))
      .withColumn(outCol,
        when(col("__n") > 1,
          (col("__sy") - col(targetCol).cast(Acc)).cast(DoubleType) /
            (col("__n") - 1)))
      .drop("__sy", "__n")
  }

  /** Grouped closed-form OLS of y on x: slope = cov/var, intercept =
    * ȳ − slope·x̄, plus R² — derived from exact decimal raw moments
    * (n, Σx, Σx², Σy, Σy², Σxy), the q152 discipline: one map-side-
    * combined aggregate per group, order-independent where a streaming
    * double accumulator is not, and the divide/multiply derivation is the
    * same expression chain in any engine. Degenerate groups (zero x
    * variance) yield nulls, not division blow-ups.
    */
  def groupedOls(df: DataFrame, groupCols: Seq[String], xCol: String,
                 yCol: String): DataFrame = {
    val x = col(xCol); val y = col(yCol)
    val m = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).alias("n"),
        sum(x.cast(Acc)).alias("__sx"), sum((x * x).cast(Acc)).alias("__sx2"),
        sum(y.cast(Acc)).alias("__sy"), sum((y * y).cast(Acc)).alias("__sy2"),
        sum((x * y).cast(Acc)).alias("__sxy"))
    val n = col("n").cast(DoubleType)
    def D(c: String) = col(c).cast(DoubleType)
    val vx = D("__sx2") / n - (D("__sx") / n) * (D("__sx") / n)
    val vy = D("__sy2") / n - (D("__sy") / n) * (D("__sy") / n)
    val cov = D("__sxy") / n - (D("__sx") / n) * (D("__sy") / n)
    val slope = cov / vx
    m.select(groupCols.map(col) ++ Seq(
      col("n"),
      round(when(vx > 0, slope), 6).alias("slope"),
      round(when(vx > 0, D("__sy") / n - slope * (D("__sx") / n)), 6)
        .alias("intercept"),
      round(when(vx > 0 && vy > 0, (cov * cov) / (vx * vy)), 6).alias("r2")): _*)
  }
}
