package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SortedIntersectSize

/** The native merge walk must equal size(array_intersect) on sorted
  * duplicate-free arrays. */
class SortedIntersectSizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("equals size(array_intersect) on random sorted distinct arrays") {
    val gen = for {
      a <- Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted)
      b <- Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted)
    } yield (a, b)
    val p = Prop.forAll(gen) { case (a, b) =>
      SortedIntersectSize.walk(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(b.toArray)) ==
        a.toSet.intersect(b.toSet).size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.toString)
  }

  test("column form matches size(array_intersect) over real shingle sets") {
    import spark.implicits._
    val sets = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        sort_array(array_distinct(graft.functions.WordGramHashes
          .word_gram_hashes(col("text"), 3))).as("hs"))
    val joined = sets.as("a").join(sets.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
        col("a.doc_id") % 17 === col("b.doc_id") % 17)
      .select(
        SortedIntersectSize.sorted_intersect_size(col("a.hs"), col("b.hs"))
          .as("native"),
        size(array_intersect(col("a.hs"), col("b.hs"))).as("builtin"))
    assert(joined.filter(col("native") =!= col("builtin")).count() == 0)
  }
}
