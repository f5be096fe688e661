package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The in-engine BPE trainer must equal a plain-Scala reference
  * implementation of the sequential algorithm run on the same
  * word-frequency table — an independent check that the distributed
  * pair-count + greedy array-fold merge is the textbook algorithm, not
  * an approximation of it. */
class BpeSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  private def referenceBpe(
      freqs: Map[String, Long], rounds: Int): Seq[(Int, String, String, Long)] = {
    var words: Map[Vector[String], Long] = freqs.toSeq
      .map { case (w, f) => w.map(_.toString).toVector -> f }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (k <- 1 to rounds) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      val ((a, b), cnt) = counts.toSeq
        .minBy { case ((l, r), c) => (-c, l, r) }
      out += ((k, a, b, cnt))
      words = words.toSeq.map { case (syms, f) =>
        val merged = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            merged += a + b; i += 2
          } else { merged += syms(i); i += 1 }
        }
        merged.result() -> f
      }.groupBy(_._1).map { case (key, v) => key -> v.map(_._2).sum }
    }
    out.result()
  }

  test("distributed BPE equals the sequential reference algorithm") {
    val freqs = Tables.load(spark, SF, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceBpe(freqs, rounds = 6)
    val got = graft.ext.TextOps.textBpeTrain(spark, SF).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq
    assert(got == want)
  }

  test("training stops cleanly when the corpus runs out of pairs " +
      "(r14 review find: the empty argmax threw IndexOutOfBounds)") {
    // single-char words have zero adjacent pairs: round 1's argmax is
    // empty and the trainer must emit an empty merge table, not crash.
    // (A corpus that EXHAUSTS pairs mid-training hits the same path at a
    // later round; the oracle suppresses those rounds via WHERE EXISTS.)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe_degenerate")
    Seq((0L, "a b c", "en", "src", 5L), (1L, "b c a", "en", "src", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ext.TextOps.textBpeTrain(spark, dir.toString)
    assert(out.collect().isEmpty)
  }

  test("greedy fold merges overlapping runs like the sequential walk") {
    // planted run case: pair (a, a) over "aaaa"/"aaa" must merge
    // floor(k/2) leftmost pairs — the overlap case the fold's
    // last-element check must get right
    import spark.implicits._
    val df = Seq(("aaaa", 1L), ("aaa", 1L), ("baab", 1L))
      .toDF("w", "freq")
      .select(col("freq"), split(col("w"), "").as("syms"))
      .select(col("freq"), expr(
        """aggregate(syms, CAST(array() AS array<string>), (acc, x) ->
          |  CASE WHEN size(acc) > 0
          |            AND element_at(acc, size(acc)) = 'a' AND x = 'a'
          |       THEN concat(slice(acc, 1, size(acc) - 1), array('aa'))
          |       ELSE concat(acc, array(x)) END)""".stripMargin).as("m"))
      .collect().map(_.getSeq[String](1).toList)
    assert(df.toList == List(
      List("aa", "aa"), List("aa", "a"), List("b", "aa", "b")))
  }
}
