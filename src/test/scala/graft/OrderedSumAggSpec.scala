package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.OrderedSumAgg

class OrderedSumAggSpec extends AnyFunSuite {
  import TestSpark.spark

  // adversarial doubles: many magnitudes, so addition order genuinely
  // changes the result (the property the aggregate exists to pin down)
  private def rows(n: Int): Seq[(Int, Long, Double)] =
    (0 until n).map { i =>
      val m = graft.functions.Mix64.mix(i.toLong)
      val mag = (m & 63).toInt - 32
      (i % 17, m >>> 40, math.copySign(math.pow(2.0, mag), (m & 1) - 0.5))
    }

  test("bit-identical to the collect_list ordered fold, under any " +
      "partitioning (the graph_pagerank replay identity)") {
    import spark.implicits._
    val base = rows(20000)
    val viaLambda = base.toDF("g", "k", "v").repartition(5)
      .groupBy("g")
      .agg(expr("aggregate(array_sort(collect_list(struct(k, v))), " +
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.v)").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (parts <- Seq(1, 3, 32)) {
      val got = base.toDF("g", "k", "v").repartition(parts)
        .groupBy("g")
        .agg(OrderedSumAgg.ordered_sum(col("k"), col("v")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(got == viaLambda, s"parts=$parts")
    }
  }

  test("the in-place dual-array quicksort survives adversarial shapes " +
      "(all-equal, sorted, reverse, few-distinct, NaN/-0.0 tie bits)") {
    // the end-to-end tests stress the sort on RANDOM data; quicksort
    // defects classically hide in degenerate patterns — the Sedgewick
    // sentinel scheme's scans must terminate and stay in bounds on
    // all-equal input, and the (key, value-bits) tiebreak must order
    // -0.0 / NaN payloads canonically
    def check(pairs: Seq[(Long, Double)]): Unit = {
      val buf = new OrderedSumAgg.Buf(8)
      pairs.foreach { case (k, v) => buf.append(k, v) }
      buf.orderedSum() // sorts in place
      val got = (0 until buf.size)
        .map(i => (buf.ks(i), java.lang.Double.doubleToRawLongBits(buf.vs(i))))
      val want = pairs
        .map { case (k, v) => (k, java.lang.Double.doubleToRawLongBits(v)) }
        .sorted
      assert(got == want, s"shape of size ${pairs.size} mis-sorted")
    }
    val nan2 = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val shapes: Seq[Seq[(Long, Double)]] = Seq(
      Seq.empty,
      Seq((5L, 1.0)),
      Seq.fill(1000)((7L, 3.25)),                       // all-equal
      (0 until 1000).map(i => (i.toLong, i * 0.5)),     // sorted
      (0 until 1000).map(i => ((999 - i).toLong, 1.0)), // reverse
      (0 until 1000).map(i => ((i % 3).toLong, (i % 2).toDouble)), // few-distinct
      (0 until 257).map(i => (42L, Seq(0.0, -0.0, Double.NaN, nan2,
        Double.NegativeInfinity, -1.5)(i % 6))),        // tie-bit zoo
      (0 until 17).map(i => (graft.functions.Mix64.mix(i.toLong),
        math.pow(-2.0, i % 9))))                        // just past insertion cut
    shapes.foreach(check)
  }

  test("duplicate keys fold in one canonical order (value-bits tiebreak)") {
    import spark.implicits._
    // all pairs share one key; permuted input and any partitioning must
    // still produce one bit-exact result
    val vs = rows(5000).map(_._3)
    val results = Seq(vs, vs.reverse, scala.util.Random.shuffle(vs)).flatMap {
      in => Seq(1, 7, 32).map { parts =>
        in.map(v => (1L, v)).toDF("k", "v").repartition(parts)
          .agg(OrderedSumAgg.ordered_sum(col("k"), col("v")).as("s"))
          .collect().head.getDouble(0)
      }
    }
    assert(results.distinct.size == 1, s"got ${results.distinct}")
  }

  test("nulls are skipped; empty group folds to 0.0") {
    import spark.implicits._
    val got = Seq((Some(1L), Some(2.0)), (None, Some(9.0)),
        (Some(3L), None), (Some(2L), Some(1.0)))
      .toDF("k", "v")
      .agg(OrderedSumAgg.ordered_sum(col("k"), col("v")).as("s"))
      .collect().head.getDouble(0)
    assert(got == 3.0)
    val empty = Seq((Option.empty[Long], Option.empty[Double])).toDF("k", "v")
      .agg(OrderedSumAgg.ordered_sum(col("k"), col("v")).as("s"))
      .collect().head.getDouble(0)
    assert(empty == 0.0)
  }
}
