package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join: salt the skewed side's key into N sub-keys and
  * replicate the other side across all salts, so one hot key spreads over N
  * tasks instead of stalling a single reducer — the classic remedy when one
  * join key holds a disproportionate share of rows (AQE's skew-join split
  * covers sort-merge cases; explicit salting also covers hash aggregation
  * feeding joins and gives deterministic partitioning control).
  *
  * The join result is identical to the unsalted join for any salt count —
  * pinned by SaltedJoinSpec.
  */
object SaltedJoin {

  /** Inner equi-join of `skewed` (salted) against `compact` (replicated).
    * `salts` multiplies the compact side's rows — keep it small (8–32) and
    * the compact side dimension-sized. */
  def saltedInner(
      skewed: DataFrame,
      compact: DataFrame,
      skewedKey: String,
      compactKey: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    // deterministic per-row salt: hash of the whole row spreads a hot key
    // uniformly; any per-row value works — correctness is salt-independent
    val l = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(salts)).cast("int"))
    val r = compact.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l("__salt") === r("__salt") && col(skewedKey) === col(compactKey))
      .drop("__salt")
  }
}
