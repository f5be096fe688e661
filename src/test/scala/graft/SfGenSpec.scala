package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.SfGen

/** The sf1 bench tier is only as good as its generator: schema must match
  * the driver testdata exactly (so every SparkEntry query runs unmodified),
  * money must stay 2-decimal (the exact-decimal strategy depends on it),
  * FKs must hold, output must be deterministic, and the planted structure
  * (near-dup docs, clustered embeddings) must actually be there.
  */
class SfGenSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  private val dir = graft.matview.Materializer.defaultScratch + "/sfgen_spec"
  private lazy val counts = SfGen.generate(spark, dir, scale = 0.01, files = 4)

  private def gen(t: String) = Tables.load(spark, dir, t)

  test("row counts scale linearly and lineitem averages ~4 lines/order") {
    assert(counts("customer") == 1500 && counts("orders") == 15000)
    val li = gen("lineitem").count()
    assert(li >= counts("orders") && li <= counts("orders") * 7)
    assert(math.abs(li.toDouble / counts("orders") - 4.0) < 0.1)
  }

  test("schema matches the driver testdata for every table") {
    Tables.names.foreach { t =>
      val ref = Tables.load(spark, SF, t).schema.fields
        .map(f => f.name -> f.dataType.sql).toSeq
      val got = gen(t).schema.fields
        .map(f => f.name -> f.dataType.sql).toSeq
      assert(got == ref, s"table $t: $got != $ref")
    }
  }

  test("money columns are exact 2-decimal values") {
    val bad = gen("lineitem").select(
      sum(when(abs(col("l_extendedprice") * 100 -
        round(col("l_extendedprice") * 100)) > 1e-9, 1).otherwise(0)) +
      sum(when(abs(col("l_discount") * 100 -
        round(col("l_discount") * 100)) > 1e-9, 1).otherwise(0)))
      .head().getLong(0)
    assert(bad == 0)
  }

  test("referential integrity: FKs land inside their dimensions") {
    assert(gen("lineitem").join(gen("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").isEmpty)
    assert(gen("orders").agg(max("o_custkey")).head().getLong(0)
      < counts("customer"))
    assert(gen("lineitem").agg(max("l_partkey")).head().getLong(0)
      < counts("part"))
  }

  test("generation is deterministic: same dir content on regeneration") {
    def checksum(t: String, cols: Seq[String]): java.math.BigDecimal =
      gen(t).select(sum(xxhash64(cols.map(col): _*)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head().getDecimal(0)
    val before = checksum("lineitem", Seq("l_orderkey", "l_linenumber",
      "l_extendedprice", "l_returnflag", "l_shipdate"))
    val beforeDocs = checksum("documents", Seq("doc_id", "text"))
    SfGen.generate(spark, dir, scale = 0.01, files = 4)
    assert(checksum("lineitem", Seq("l_orderkey", "l_linenumber",
      "l_extendedprice", "l_returnflag", "l_shipdate")) == before)
    assert(checksum("documents", Seq("doc_id", "text")) == beforeDocs)
  }

  test("every 20th document is a planted near-duplicate of its neighbor") {
    val docs = gen("documents").select(col("doc_id"), col("text"))
    val dups = docs.filter(col("doc_id") % 20 === 0 && col("doc_id") > 0)
    val expected = dups.count()
    assert(expected > 0)
    val matched = dups.as("d")
      .join(docs.as("p"), col("d.doc_id") - 1 === col("p.doc_id"))
      .filter(col("d.text").startsWith(col("p.text")))
      .count()
    assert(matched == expected)
  }

  test("embeddings have 64 dims and real cluster geometry") {
    val e = gen("embeddings")
    assert(e.filter(size(col("embedding")) =!= 64).isEmpty)
    // within-cluster mean coordinate deviates from the global mean: the
    // 0.6*center component shifts each label's distribution measurably
    val byLabel = e.select(col("label"),
        aggregate(col("embedding"), lit(0.0d), (a, x) => a + x).as("s"))
      .groupBy("label").agg(avg("s").as("m"))
      .agg(max(abs(col("m")))).head().getDouble(0)
    assert(byLabel > 1.0, s"cluster signal too weak: $byLabel")
  }
}
