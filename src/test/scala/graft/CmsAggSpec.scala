package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CmsAgg, Mix64}

class CmsAggSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  private val W = 256
  private val SEEDS = Seq(0x243F6A8885A308D3L, 0x13198A2E03707344L,
    0xA4093822299F31D0L)

  private def stream = graft.Tables.load(spark, SF, "orders")
    .select(col("o_custkey").as("k"))

  test("one-pass sketch equals the d-way union + groupBy counter build") {
    val sk = stream
      .agg(CmsAgg.cms(col("k"), SEEDS, W).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(sk.length == SEEDS.length * W)

    val relational = SEEDS.zipWithIndex.map { case (seed, r) =>
      stream.select(lit(r).as("r"),
        pmod(Mix64.mix64(col("k"), seed), lit(W)).as("b"))
    }.reduce(_ unionByName _)
      .groupBy("r", "b").agg(count(lit(1)).as("c"))
      .collect()
      .map(x => (x.getInt(0) * W + x.getLong(1).toInt, x.getLong(2)))
      .toMap

    sk.zipWithIndex.foreach { case (c, i) =>
      assert(c == relational.getOrElse(i, 0L), s"counter $i")
    }
  }

  test("point estimate over-approximates true counts (CMS guarantee)") {
    val sk = stream.agg(CmsAgg.cms(col("k"), SEEDS, W).as("sk"))
      .collect().head.getSeq[Long](0)
    val truth = stream.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    truth.foreach { case (k, n) =>
      val est = SEEDS.zipWithIndex.map { case (seed, r) =>
        val b = (Mix64.mix(k ^ seed) & (W - 1)).toInt
        sk(r * W + b)
      }.min
      assert(est >= n, s"estimate for key $k")
    }
  }
}
