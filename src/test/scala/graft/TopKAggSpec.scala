package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg

/** The bounded-heap top-k aggregate must be row-identical to the window
  * form it replaces (row_number over score desc, id asc), including on the
  * partial/final merge path and on groups smaller than k. */
class TopKAggSpec extends AnyFunSuite {
  import TestSpark.spark

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id"))
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("g", "id", "rank", "s")
  }

  private def aggForm(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopKAgg.top_k(col("s"), col("id"), k).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.neighbor_id").as("id"),
        col("t.rank").as("rank"), col("t.score").as("s"))

  test("top-k aggregate equals the row_number window form (with ties)") {
    import spark.implicits._
    // deterministic synthetic data with planted score ties across groups
    val rows = for {
      g <- 0 until 7
      i <- 0 until 53
    } yield (g.toLong, (g * 53 + i).toLong, ((i * 31 + g * 17) % 13) / 4.0)
    val df = rows.toDF("g", "id", "s").repartition(8) // force merge path
    val k = 5
    val expected = windowForm(df, k).orderBy("g", "rank").collect()
    val actual = aggForm(df, k).orderBy("g", "rank").collect()
    assert(actual.toSeq == expected.toSeq)
  }

  test("groups smaller than k return all rows, ranked") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 20L, 0.1))
      .toDF("g", "id", "s")
    val out = aggForm(df, 5).orderBy("g", "rank").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((1L, 11L, 1), (1L, 10L, 2), (2L, 20L, 1)))
  }

  test("brute-force ANN plans the bounded aggregate, not a sort+window") {
    val p = graft.ext.Similarity.similarityTopkBruteforce(spark, TestSpark.SF)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"window in brute-force top-k plan:\n$p")
    assert(p.contains("ObjectHashAggregate") && p.contains("graft_top_k"),
      s"bounded top-k aggregate missing from plan:\n$p")
  }
}
