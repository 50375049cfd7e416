package graft.ops

import org.apache.spark.sql.DataFrame

/** Set operators (SURVEY §2.7 U1). */
object SetOps {

  /** Union by column NAME, tolerating columns missing on either side
    * (missing → null) — the reference's train/test application union where
    * `TARGET` exists only in train (silver/processor.py:96).
    */
  def unionByNameTolerant(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)
}
