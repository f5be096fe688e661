package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingHash

class RollingHashSpec extends AnyFunSuite {

  private def h(s: String): Long = RollingHash.hash(s.getBytes("UTF-8"))

  test("known algebra: h(c) = c+1; h(ab) = (a+1)*257 + (b+1)") {
    assert(h("") == 0L)
    assert(h("a") == 'a' + 1)
    assert(h("ab") == ('a' + 1) * 257L + ('b' + 1))
  }

  test("values stay under the 2^61-1 modulus and differ on prefixes/suffixes") {
    val p = Prop.forAll(Gen.alphaNumStr) { s =>
      val v = h(s)
      v >= 0 && v < RollingHash.MOD &&
        (s.isEmpty || h(s + "x") != v)
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p).passed)
  }

  test("collision-free across the document corpus, engine-side") {
    import TestSpark.{spark, SF}
    val df = graft.ext.TextOps.textFingerprintRolling(spark, SF)
    assert(df.select("fp_rolling").distinct().count() == df.count())
    // codegen path and interpreted path agree
    val row = df.orderBy("doc_id").collect().head
    val text = graft.Tables.load(spark, SF, "documents")
      .orderBy("doc_id").collect().head.getAs[String]("text")
    assert(row.getAs[Long]("fp_rolling") == h(text))
  }
}
