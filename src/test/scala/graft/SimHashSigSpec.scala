package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Mix64, RollingHash, SimHashSig}

/** The one-pass SimHashSig expression must be bit-equal to the relational
  * form it replaced: explode(split) -> mix64(rolling_hash(tok)) -> 64
  * +-1 bit sums per doc -> strictly-positive bit rule. */
class SimHashSigSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def relational(texts: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    val toks = texts.toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"),
        Mix64.mix64(RollingHash.rolling_hash(col("tok"))).as("h"))
    val bitSums = (0 until 64).map(k =>
      sum(shiftrightunsigned(col("h"), k).bitwiseAND(lit(1L)) * 2 - 1)
        .as(s"v$k"))
    val sigBits = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 64).map(k =>
      when(col(s"v$k") > 0, lit(1L << k)).otherwise(lit(0L))).reduce(_ + _)
    sigBits.select(col("doc_id"), simhash.as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def native(texts: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
      .select(col("doc_id"), SimHashSig.simhash_sig(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bit-equal to the relational 64-bit-sum form on real documents") {
    import spark.implicits._
    val texts = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    assert(native(texts) == relational(texts))
  }

  test("edge cases: empty, single token, consecutive spaces, unicode") {
    val texts = Seq(
      0L -> "", 1L -> " ", 2L -> "one", 3L -> "one two",
      4L -> "a  b", 5L -> " lead trail ", 6L -> "жüज tokens here")
    assert(native(texts) == relational(texts))
  }
}
