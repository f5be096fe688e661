package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashAgg, Mix64}

class MinHashAggSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  private val N = 64

  private def grams = graft.Tables.load(spark, SF, "documents")
    .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    .select(col("doc_id"), xxhash64(col("tok")).as("h"))

  test("one-pass aggregate equals the 64-column composed form bit-for-bit") {
    val onePass = grams.groupBy("doc_id")
      .agg(MinHashAgg.minhash(col("h"), N).as("sig"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector))

    val composedCols = (0 until N).map(i =>
      min(Mix64.mix64(col("h"), MinHashAgg.GOLDEN * i)).as(s"m$i"))
    val composed = grams.groupBy("doc_id")
      .agg(composedCols.head, composedCols.tail: _*)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), (1 to N).map(r.getLong(_)).toVector))

    assert(onePass.toSeq == composed.toSeq)
  }

  test("signature length and range") {
    val row = grams.groupBy("doc_id")
      .agg(MinHashAgg.minhash(col("h"), 16).as("sig"))
      .limit(1).collect().head
    val sig = row.getSeq[Long](1)
    assert(sig.length == 16)
    assert(sig.forall(_ != Long.MaxValue)) // every doc has tokens
  }
}
