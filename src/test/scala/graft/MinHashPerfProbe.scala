package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashAgg, Mix64}

/** Perf probe at bench SF: composed 64-min-columns vs one-pass aggregate. */
class MinHashPerfProbe extends AnyFunSuite {
  test("signature computation timing at sf0.1") {
    val spark = TestSpark.spark
    val grams = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val composedCols = (0 until 64).map(i =>
      min(Mix64.mix64(col("h"), MinHashAgg.GOLDEN * i)).as(s"m$i"))
    def runComposed() = grams.groupBy("doc_id")
      .agg(composedCols.head, composedCols.tail: _*)
      .write.format("noop").mode("overwrite").save()
    def runOnePass() = grams.groupBy("doc_id")
      .agg(MinHashAgg.minhash(col("h"), 64).as("sig"))
      .write.format("noop").mode("overwrite").save()
    runComposed(); runOnePass() // warm
    info(f"composed: ${(1 to 3).map(_ => time(runComposed())).min}%.3f s")
    info(f"one-pass: ${(1 to 3).map(_ => time(runOnePass())).min}%.3f s")
  }
}
