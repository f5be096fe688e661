package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Multimodal, TextOps}

class TextMultimodalSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  test("token stats are internally consistent") {
    val df = TextOps.textTokens(spark, SF)
    assert(df.filter(col("n_types") > col("n_tokens")).count() == 0)
    assert(df.filter(col("type_token_ratio") > 1.0 || col("type_token_ratio") <= 0.0).count() == 0)
  }

  test("quality: measured char count matches the n_chars metadata column") {
    val df = TextOps.textQuality(spark, SF)
    assert(df.filter(!col("n_chars_ok")).count() == 0)
  }

  test("langid emits a prediction for every doc from the fixed label set") {
    val df = TextOps.textLangid(spark, SF)
    val langs = Set("en", "es", "de", "fr", "zh")
    assert(df.filter(!col("predicted").isin(langs.toSeq.map(lit): _*)).count() == 0)
    assert(df.count() == graft.Tables.load(spark, SF, "documents").count())
  }

  test("fingerprints are unique on this corpus (no exact dupes planted)") {
    val df = TextOps.textFingerprint(spark, SF)
    assert(df.select("fp").distinct().count() == df.count())
  }

  test("multimodal decode emits valid metadata for every payload") {
    val df = Multimodal.multimodalDecode(spark, SF)
    assert(df.filter(col("width") < 64 || col("width") >= 512).count() == 0)
    assert(df.filter(col("n_frames") < 1 || col("n_frames") > 30).count() == 0)
    assert(df.count() == graft.Tables.load(spark, SF, "documents").count())
  }

  test("frame sampling: every 5th frame, within bounds") {
    val df = Multimodal.multimodalFrameSample(spark, SF)
    assert(df.filter(col("frame_no") % 5 =!= 0).count() == 0)
    assert(df.filter(col("frame_no") >= col("n_frames")).count() == 0)
  }
}
