package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvAgg

class KmvAggSpec extends AnyFunSuite {
  import TestSpark.spark
  import KmvAgg.{kmv_sketch, K}

  // 63-bit hashes of 0..n-1 — the agg_kmv_distinct / events_stream_distinct
  // input shape (mix64 then unsigned shift)
  private def hashes(n: Int): Seq[Long] =
    (0 until n).map(i => graft.functions.Mix64.mix(i.toLong) >>> 1)

  test("sketch is the K smallest distinct hashes, sorted, under any " +
      "partitioning and input order") {
    import spark.implicits._
    val base = hashes(5000) ++ hashes(1000) // duplicates on purpose
    val expect = base.distinct.sorted.take(K)
    for (parts <- Seq(1, 3, 32); in <- Seq(base, base.reverse)) {
      val got = in.toDF("h").repartition(parts)
        .agg(kmv_sketch(col("h")).as("sk"))
        .collect().head.getSeq[Long](0)
      assert(got == expect, s"parts=$parts")
    }
  }

  test("below K the sketch IS the distinct set (exact regime)") {
    import spark.implicits._
    val base = hashes(100) ++ hashes(40)
    val got = base.toDF("h").repartition(5)
      .agg(kmv_sketch(col("h")).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(got == base.distinct.sorted)
    assert(got.length == 100)
  }

  test("merge is idempotent: a replayed partial cannot corrupt the state") {
    val agg = KmvAgg(org.apache.spark.sql.graftshim.ColumnBridge
      .expression(col("h")))
    def buf(hs: Seq[Long]): KmvAgg.Buf = {
      val b = agg.createAggregationBuffer()
      hs.foreach(b.insert)
      b
    }
    val a = buf(hashes(400))
    val b = buf(hashes(700).drop(300))
    val once = agg.merge(buf(hashes(400)), b)
    // merge the SAME partial twice — set-union semantics must absorb it
    // (the property the add-merge CMS/quantile sketches do NOT have)
    val twice = agg.merge(agg.merge(buf(hashes(400)), b), b)
    assert(once.arr.slice(0, once.size).toSeq ==
      twice.arr.slice(0, twice.size).toSeq)
    // and self-merge is the identity
    val self = agg.merge(a, buf(hashes(400)))
    assert(self.arr.slice(0, self.size).toSeq ==
      hashes(400).distinct.sorted.take(K))
  }

  test("estimator at K is within 3 sigma on a planted 20k-distinct set") {
    import spark.implicits._
    val n = 20000
    val sk = hashes(n).toDF("h").repartition(16)
      .agg(kmv_sketch(col("h")).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(sk.length == K)
    val est = KmvAgg.estNumerator(K) / sk(K - 1)
    val sigma = 1.0 / math.sqrt(K - 2.0)
    assert(math.abs(est - n) / n <= 3 * sigma,
      s"est=$est exact=$n rel=${math.abs(est - n) / n}")
  }

  test("parameterized k: the k=64 sketch equals the first 64 of the " +
      "default sketch (agg_kmv_distinct's batch size)") {
    import spark.implicits._
    val base = hashes(3000)
    val full = base.toDF("h").repartition(7)
      .agg(kmv_sketch(col("h")).as("sk"))
      .collect().head.getSeq[Long](0)
    val small = base.toDF("h").repartition(7)
      .agg(kmv_sketch(col("h"), 64).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(small == full.take(64))
    assert(small == base.distinct.sorted.take(64))
  }

  test("negative input fails loudly, null input is skipped") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(1L, -5L).toDF("h").agg(kmv_sketch(col("h"))).collect()
    }
    assert(ex.getMessage != null)
    val got = Seq(Some(7L), None, Some(3L)).toDF("h")
      .agg(kmv_sketch(col("h")).as("sk")).collect().head.getSeq[Long](0)
    assert(got == Seq(3L, 7L))
  }
}
