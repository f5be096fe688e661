package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WordGramHashes

/** The native one-pass shingle hasher must be bit-equal to the composed
  * column form it replaces: per-word xxhash64, then multi-arg xxhash64
  * over each length-3 window of word hashes. */
class WordGramHashesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def composedFrom(texts: Seq[String]): Seq[Seq[Long]] =
    texts.toDF("text")
      .select(expr("transform(split(text, ' '), w -> xxhash64(w))").as("hw"))
      .select(when(size(col("hw")) >= 3, expr(
        "transform(sequence(0, size(hw) - 3), i -> xxhash64(hw[i], hw[i+1], hw[i+2]))"))
        .otherwise(expr("array()").cast("array<bigint>")).as("g"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq

  private def native(texts: Seq[String]): Seq[Seq[Long]] =
    texts.toDF("text")
      .select(WordGramHashes.word_gram_hashes(col("text"), 3).as("g"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq

  test("bit-equal to the composed xxhash64 form on real documents") {
    val texts = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select("text").as[String].collect().toSeq
    assert(native(texts) == composedFrom(texts))
  }

  test("edge cases: empty, short, consecutive/leading/trailing spaces") {
    val texts = Seq(
      "", " ", "  ", "one", "one two", "one two three",
      "one two three four", " lead", "trail ", "a  b c", "  a b c  ",
      "unicode жüज token stream here")
    assert(native(texts) == composedFrom(texts))
  }

  test("fewer than n words yields an empty array, never null") {
    val out = Seq("a b").toDF("text")
      .select(WordGramHashes.word_gram_hashes(col("text"), 3).as("g"))
      .collect()
    assert(out.head.getSeq[Long](0).isEmpty)
  }
}
