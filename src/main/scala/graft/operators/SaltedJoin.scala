package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join via key-selective salting: detect the hot keys,
  * salt only their rows into N sub-keys (replicating the compact side's
  * matching rows across the salts), while cold keys ride the same single
  * join un-replicated on salt 0 — so one hot key spreads over N tasks
  * instead of stalling a single reducer, and the cold majority pays no
  * replication at all. (AQE's
  * skew-join split covers sort-merge cases at runtime; explicit salting is
  * the deterministic-partitioning answer, and the one that composes with
  * downstream keyed aggregation.)
  *
  * Scale notes:
  *   - hot-key detection is a groupBy count over the skewed side — itself
  *     skew-proof, because partial aggregation collapses the hot key
  *     map-side; the detected set is then bounded by construction
  *     (a key must exceed `hotFactor` x an average reducer's share, so at
  *     most shufflePartitions / hotFactor keys qualify) — always
  *     driver-collectable, never corpus-sized;
  *   - only hot-key rows of the compact side replicate (x salts), so the
  *     replication cost is |compact ∩ hot| x salts, not |compact| x salts.
  *
  * The join result is identical to the unsalted join for any salt count and
  * any hot-key set — pinned by SaltedJoinSpec.
  */
object SaltedJoin {

  /** Inner equi-join of `skewed` against `compact` with key-selective
    * salting. `salts` spreads each hot key over that many reducers (8–32
    * is plenty); pass `salts = 0` to derive it from the measured
    * imbalance — enough sub-keys that the hottest key's per-task share
    * shrinks to one average reducer's share, capped at 4 x the shuffle
    * parallelism. A key is hot when it holds more than `hotFactor` x the
    * average per-reducer row share. */
  def saltedInner(
      skewed: DataFrame,
      compact: DataFrame,
      skewedKey: String,
      compactKey: String,
      salts: Int,
      hotFactor: Int = 4): DataFrame = {
    require(salts >= 0 && hotFactor > 0)
    // a caller column named __salt would be clobbered by withColumn and
    // deleted by the final drop — refuse loudly (the Merge.outer
    // guard-column precedent)
    require(!skewed.columns.contains("__salt") &&
      !compact.columns.contains("__salt"),
      "SaltedJoin: '__salt' is reserved for the salting machinery")
    val spark = skewed.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions.max(1)

    val counts = skewed.groupBy(col(skewedKey)).agg(count(lit(1)).as("__cnt"))
      .persist()
    try {
      val stats = counts.agg(sum(col("__cnt")), max(col("__cnt"))).collect()(0)
      // an EMPTY skewed side aggregates to one all-null row — there is
      // nothing to salt; the plain join returns the empty result
      if (stats.isNullAt(0))
        return skewed.join(compact, skewed(skewedKey) === compact(compactKey))
      val total = stats.getLong(0)
      val maxCnt = stats.getLong(1)
      val avgShare = (total.toDouble / nPart).max(1.0)
      val threshold = (avgShare * hotFactor).toLong.max(1L)
      val chosenSalts =
        if (salts > 0) salts
        else math.ceil(maxCnt / avgShare).toLong.min(4L * nPart).max(2L).toInt
      val hot = counts.filter(col("__cnt") > threshold)
        .select(col(skewedKey)).collect().map(_.get(0)).toSeq

      if (hot.isEmpty) {
        // frame-qualified keys: bare col() is AMBIGUOUS whenever the two
        // sides share the key name (the ordinary case)
        skewed.join(compact, skewed(skewedKey) === compact(compactKey))
      } else {
        // ONE join, one scan per side: hot rows get a deterministic per-row
        // salt (hash of the whole row spreads a hot key uniformly; any
        // per-row value works — correctness is salt-independent), cold rows
        // all take salt 0; the compact side explodes across the salts only
        // for hot keys and emits the single salt 0 otherwise.
        val ls = skewed.withColumn("__salt",
          when(col(skewedKey).isin(hot: _*),
            pmod(xxhash64(skewed.columns.toIndexedSeq.map(col): _*), lit(chosenSalts)).cast("int"))
            .otherwise(lit(0)))
        val rs = compact.withColumn("__salt",
          explode(when(col(compactKey).isin(hot: _*),
            sequence(lit(0), lit(chosenSalts - 1)))
            .otherwise(array(lit(0)))))
        ls.join(rs,
            ls("__salt") === rs("__salt") &&
              ls(skewedKey) === rs(compactKey))
          .drop("__salt")
      }
    } finally counts.unpersist()
  }
}
