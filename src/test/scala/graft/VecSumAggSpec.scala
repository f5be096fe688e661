package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{QuantileSketchAgg, VecSumAgg}

class VecSumAggSpec extends AnyFunSuite {
  import TestSpark.spark

  test("element-wise sum under any partitioning; nulls skipped; " +
      "all-null group folds to empty") {
    import spark.implicits._
    val vecs: Seq[Option[Seq[Long]]] = Seq(
      Some(Seq(1L, 2L, 3L)), Some(Seq(10L, 0L, 5L)), None,
      Some(Seq(0L, 0L, 1L)))
    for (parts <- Seq(1, 2, 32)) {
      val got = vecs.toDF("v").repartition(parts)
        .agg(VecSumAgg.vec_sum(col("v")).as("s"))
        .collect().head.getSeq[Long](0)
      assert(got == Seq(11L, 2L, 9L), s"parts=$parts")
    }
    val empty = Seq[Option[Seq[Long]]](None, None).toDF("v")
      .agg(VecSumAgg.vec_sum(col("v")).as("s"))
      .collect().head.getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("summed per-group quantile sketches are bit-identical to the " +
      "one-shot sketch over the same rows (the MV-rewrite identity)") {
    import spark.implicits._
    val vals = (0 until 4000).map { i =>
      val m = graft.functions.Mix64.mix(i.toLong)
      (i % 7, (m & ((1L << (1 + (i % 30))) - 1)).abs)
    }
    val df = vals.toDF("g", "v")
    val oneShot = df.agg(
        QuantileSketchAgg.quantile_sketch(col("v")).as("sk"))
      .collect().head.getSeq[Long](0)
    val merged = df.groupBy("g")
      .agg(QuantileSketchAgg.quantile_sketch(col("v")).as("sk"))
      .agg(VecSumAgg.vec_sum(col("sk")).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(merged == oneShot)
  }

  test("length mismatch fails loudly (mixed sketch geometries)") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("v").coalesce(1)
        .agg(VecSumAgg.vec_sum(col("v"))).collect()
    }
    assert(ex.getMessage != null)
  }
}
