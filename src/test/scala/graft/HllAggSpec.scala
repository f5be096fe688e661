package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HllAgg, VecMaxAgg}

class HllAggSpec extends AnyFunSuite {
  import TestSpark.spark
  import HllAgg.{hll_sketch, M, P, RHO_MAX, WINDOW}

  // 63-bit hashes of 0..n-1 — the agg_hll_distinct / events_stream_hll
  // input shape (mix64 then unsigned shift), shared with KmvAggSpec
  private def hashes(n: Int): Seq[Long] =
    (0 until n).map(i => graft.functions.Mix64.mix(i.toLong) >>> 1)

  /** Plain-Scala reference registers: per bucket the MAX of
    * rho = 1 + leading zeros of the masked suffix. */
  private def refRegs(hs: Seq[Long]): Seq[Long] = {
    val regs = new Array[Long](M)
    hs.foreach { h =>
      val b = (h >>> WINDOW).toInt
      val w = h & ((1L << WINDOW) - 1)
      val rho = java.lang.Long.numberOfLeadingZeros(w) - P
      if (rho > regs(b)) regs(b) = rho
    }
    regs.toSeq
  }

  private def sketchOf(hs: Seq[Long], parts: Int): Seq[Long] = {
    import spark.implicits._
    hs.toDF("h").repartition(parts)
      .agg(hll_sketch(col("h")).as("regs"))
      .collect().head.getSeq[Long](0)
  }

  test("registers equal the plain-Scala reference under any partitioning " +
      "and input order") {
    val base = hashes(3000) ++ hashes(500) // duplicates on purpose
    val expect = refRegs(base)
    for (parts <- Seq(1, 3, 32); in <- Seq(base, base.reverse)) {
      assert(sketchOf(in, parts) == expect, s"parts=$parts")
    }
  }

  test("register merge is idempotent: a replayed partial cannot corrupt " +
      "the state (the max-merge property, shared with KMV's union)") {
    val agg = HllAgg(org.apache.spark.sql.graftshim.ColumnBridge
      .expression(col("h")))
    def buf(hs: Seq[Long]): Array[Byte] = {
      val b = agg.createAggregationBuffer()
      hs.foreach { h =>
        val bucket = (h >>> WINDOW).toInt
        val w = h & ((1L << WINDOW) - 1)
        val rho = (java.lang.Long.numberOfLeadingZeros(w) - P).toByte
        if (rho > b(bucket)) b(bucket) = rho
      }
      b
    }
    val b = buf(hashes(700).drop(300))
    val once = agg.merge(buf(hashes(400)), b).toSeq
    val twice = agg.merge(agg.merge(buf(hashes(400)), b), b).toSeq
    assert(once == twice)
    // and self-merge is the identity
    assert(agg.merge(buf(hashes(400)), buf(hashes(400))).toSeq ==
      buf(hashes(400)).toSeq)
  }

  test("raw estimator is within 3 sigma on a planted 40k-distinct set") {
    val n = 40000
    val regs = sketchOf(hashes(n), 16)
    val s = regs.map(r => BigInt(1) << (RHO_MAX - r.toInt)).sum
    val est = HllAgg.EST_NUM / s.toDouble
    assert(est > HllAgg.LC_THRESHOLD) // the raw branch is the one live here
    val sigma = 1.04 / math.sqrt(M.toDouble)
    assert(math.abs(est - n) / n <= 3 * sigma,
      s"est=$est exact=$n rel=${math.abs(est - n) / n}")
  }

  test("linear counting is within 3 sigma at low cardinality") {
    val n = 300
    val regs = sketchOf(hashes(n), 4)
    val v = regs.count(_ == 0L)
    assert(v > 0)
    val raw = HllAgg.EST_NUM /
      regs.map(r => BigInt(1) << (RHO_MAX - r.toInt)).sum.toDouble
    assert(raw <= HllAgg.LC_THRESHOLD) // the correction branch is live
    val est = M.toDouble * math.log(M.toDouble / v)
    assert(math.abs(est - n) / n <= 3 * 1.04 / math.sqrt(M.toDouble),
      s"est=$est exact=$n")
  }

  test("vec_max over per-group sketches is bit-identical to the one-shot " +
      "sketch (the MV-rewrite identity) and idempotent under re-feeding") {
    import spark.implicits._
    val rows = hashes(5000).zipWithIndex.map { case (h, i) => (i % 13, h) }
    val df = rows.toDF("g", "h")
    val oneShot = df.agg(hll_sketch(col("h")).as("regs"))
      .collect().head.getSeq[Long](0)
    val grouped = df.groupBy("g").agg(hll_sketch(col("h")).as("regs"))
    val merged = grouped.agg(VecMaxAgg.vec_max(col("regs")).as("regs"))
      .collect().head.getSeq[Long](0)
    assert(merged == oneShot)
    // feeding the stored sketches in twice changes nothing (idempotence —
    // the property the add-merge VecSumAgg rollup does NOT have)
    val doubled = grouped.union(grouped)
      .agg(VecMaxAgg.vec_max(col("regs")).as("regs"))
      .collect().head.getSeq[Long](0)
    assert(doubled == oneShot)
  }

  test("negative input fails loudly, null input is skipped") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(1L, -5L).toDF("h").agg(hll_sketch(col("h"))).collect()
    }
    assert(ex.getMessage != null)
    val got = Seq(Some(7L), None).toDF("h")
      .agg(hll_sketch(col("h")).as("regs")).collect().head.getSeq[Long](0)
    assert(got == refRegs(Seq(7L)))
  }

  test("vec_max length mismatch fails loudly (mixed sketch geometries)") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("v").coalesce(1)
        .agg(VecMaxAgg.vec_max(col("v"))).collect()
    }
    assert(ex.getMessage != null)
  }
}
