package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QuantileSketchAgg

class QuantileSketchAggSpec extends AnyFunSuite {
  import TestSpark.spark
  import QuantileSketchAgg.quantile_sketch

  // deterministic log-normal-ish spread: values span the small exact
  // cells, several octaves, and a heavy tail — the shapes the sketch's
  // relative-error contract must hold across
  private def values: Seq[Long] =
    (0 until 5000).map { i =>
      val m = graft.functions.Mix64.mix(i.toLong)
      // non-negative, spread over ~2^0 .. 2^40
      (m & ((1L << (1 + (i % 41))) - 1)).abs
    }

  test("sketch value is bit-identical under any partitioning / merge order") {
    import spark.implicits._
    val base = values
    val sketches = Seq(1, 3, 32).map { parts =>
      base.toDF("v").repartition(parts)
        .agg(quantile_sketch(col("v")).as("sk"))
        .collect().head.getSeq[Long](0)
    }
    assert(sketches(0).length == QuantileSketchAgg.SIZE)
    assert(sketches(0) == sketches(1) && sketches(1) == sketches(2),
      "counter arrays differ across partitionings")
    // reversed input order too — update order must not matter
    val rev = base.reverse.toDF("v").repartition(7)
      .agg(quantile_sketch(col("v")).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(rev == sketches(0), "counter array differs under reversed input")
  }

  test("bucket midpoint estimate is within the 1/64 relative-error " +
      "contract at every rank target") {
    import spark.implicits._
    val base = values.sorted
    val n = base.length
    val sk = base.toDF("v").agg(quantile_sketch(col("v")).as("sk"))
      .collect().head.getSeq[Long](0).toArray
    def mid(idx: Int): Long =
      if (idx < 32) idx.toLong
      else {
        val w = 1L << ((idx - 32) / 32)
        (32 + (idx - 32) % 32) * w + (w - 1) / 2
      }
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val r = math.ceil(q * n).toLong
      // estimate: mid of the first bucket whose cumulative count covers r
      var cum = 0L; var i = 0
      while (cum < r && i < sk.length) { cum += sk(i); i += 1 }
      val est = mid(i - 1)
      val exact = base((r - 1).toInt)
      if (exact < 32) assert(est == exact, s"q=$q small-value cell not exact")
      else assert(math.abs(est - exact).toDouble <= exact / 64.0 + 1e-9,
        s"q=$q: est=$est exact=$exact")
    }
  }

  test("composes in groupBy and total counter mass equals group sizes") {
    import spark.implicits._
    val df = values.zipWithIndex
      .map { case (v, i) => (i % 3, v) }.toDF("g", "v")
    val rows = df.groupBy("g").agg(quantile_sketch(col("v")).as("sk"),
      count(lit(1)).as("n")).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getSeq[Long](1).sum == r.getLong(2), s"group ${r.getInt(0)}")
    }
  }

  test("integral inputs widen: INT/SMALLINT/TINYINT sketch identically " +
      "to the BIGINT cast (r10 ADVICE — no mandatory explicit cast)") {
    import spark.implicits._
    val vs = (0 until 500).map(i =>
      (graft.functions.Mix64.mix(i.toLong) & 0x7f).toInt)
    val asLong = vs.map(_.toLong).toDF("v")
      .agg(quantile_sketch(col("v")).as("sk"))
      .collect().head.getSeq[Long](0)
    for (t <- Seq("int", "smallint", "tinyint")) {
      val got = vs.toDF("v").select(col("v").cast(t).as("v"))
        .agg(quantile_sketch(col("v")).as("sk"))
        .collect().head.getSeq[Long](0)
      assert(got == asLong, s"type=$t")
    }
    // non-integral still rejected at analysis time
    val ex = intercept[Exception] {
      Seq(1.5).toDF("v").agg(quantile_sketch(col("v"))).collect()
    }
    assert(ex.getMessage.contains("integral") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("negative input fails loudly, null input is skipped") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(1L, -5L).toDF("v").agg(quantile_sketch(col("v"))).collect()
    }
    assert(ex.getMessage != null)
    val withNull = Seq(Some(7L), None, Some(40L)).toDF("v")
      .agg(quantile_sketch(col("v")).as("sk")).collect().head.getSeq[Long](0)
    assert(withNull.sum == 2L)
    assert(withNull(7) == 1L) // small cell is exact
  }
}
