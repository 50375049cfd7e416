package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-ordering): interleave the low bits of
  * several integer dimensions into one Morton key, so sorting by the key
  * co-locates rows that are close in EVERY dimension at once. Writing a
  * 100 TB table range-partitioned + sorted by this key is what makes
  * min/max zone pruning effective for predicates on either dimension —
  * a single-column sort layout prunes only its own column.
  *
  * The key is pure bit arithmetic composed from codegen'd builtins
  * (shift/and/add — no UDF): each input bit lands at a disjoint output
  * position, so the disjoint terms SUM into the interleaved value with
  * no carries; the identical formula is emitted as portable SQL by
  * [[zOrderSql]] for cross-engine verification.
  */
object Layout {

  /** Morton (Z-order) key over `dims` non-negative integer columns,
    * taking the low `bits` of each. Bit `i` of dimension `d` maps to
    * output position `i * D + (D - 1 - d)` — dimension 0 owns the most
    * significant bit of each round, so it is the primary sort among
    * equals. Result fits a signed long for `bits * D <= 62`.
    *
    * Callers normalize dimensions first (e.g. `pmod(k, 1 << bits)`, a
    * day number, a bucketed price) — the key interleaves whatever low
    * bits it is given.
    */
  def zOrderKey(dims: Seq[Column], bits: Int): Column = {
    val d = dims.length
    require(d >= 2, "z-order needs at least 2 dimensions")
    require(bits >= 1 && bits * d <= 62, s"bits * dims must be <= 62: $bits * $d")
    val terms = for {
      i <- 0 until bits
      (c, dim) <- dims.zipWithIndex
    } yield shiftleft(
      shiftrightunsigned(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * d + (d - 1 - dim))
    terms.reduce(_ + _)
  }

  /** The exact [[zOrderKey]] formula as portable SQL over the given
    * column expressions (DuckDB and Spark SQL share `>>`, `&`, `<<`).
    */
  def zOrderSql(dims: Seq[String], bits: Int): String = {
    val d = dims.length
    val terms = for {
      i <- 0 until bits
      (c, dim) <- dims.zipWithIndex
    } yield s"(((($c) >> $i) & 1) << ${i * d + (d - 1 - dim)})"
    terms.mkString("(", " + ", ")")
  }

  /** Write-side layout: range-partition on the Morton key and sort each
    * partition by it — the clustered layout whose per-file min/max
    * statistics prune on EVERY interleaved dimension. Range partitioning
    * samples the key distribution, so output files get balanced row
    * counts even when the key space is skewed.
    */
  def zOrderLayout(df: DataFrame, zKey: Column, numPartitions: Int): DataFrame =
    df.withColumn("__z", zKey)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
