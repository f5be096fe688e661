package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.bookorders.BookOrdersMart

/** Driver-visible surface for the reference-workload suite: runs the whole
  * Book Orders ETL + 15-MV DAG on the checked-in reference fixtures and
  * reports per-step row counts. The dataset is fixed (the reference dump),
  * so the oracle is the constant table of golden counts from
  * assignment-5.md (cited per row in FIXTURES.md).
  */
object BookOrdersKeys {

  type Q = (SparkSession, String) => DataFrame

  /** Golden (mv, rows) pairs — sources: assignment-5.md:77–82, 148–153,
    * 170, 204, 227, 264, 300, 306, 327, 350, 387, 774, 807, 962, 1035–1070. */
  val goldenCounts: Seq[(String, Long)] = Seq(
    "time" -> 124L,
    "sales" -> 1070L,
    "avg_amnt_view" -> 104L,
    "sum_customer_per_day" -> 198L,
    "avg_spending_by_customer_on_each_day" -> 124L,
    "best_buyers" -> 5L,
    "amount_per_order" -> 222L,
    "ord_avg_amnt" -> 1L,
    "no_of_ord" -> 1L,
    "amount_per_order_by_customer" -> 14L,
    "perc_of_ord" -> 1L,
    "View1" -> 1070L,
    "View2" -> 132L,
    "View3" -> 1006L,
    "customer_spending" -> 25L,
    "sum_per_day_per_city" -> 33L)

  /** S7 script-runner shape: the full ordered pipeline, one row per step. */
  def bookordersPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // fixtures are repo-relative; the sf dir is irrelevant for this suite
    val mart = new BookOrdersMart(s, "src/test/resources/bookorders")
    mart.buildAll().zipWithIndex
      .map { case ((name, rows), i) => (i + 1, name, rows) }
      .toDF("step", "mv", "rows")
      .orderBy("step")
  }

  val entries: Map[String, Q] = Map(
    "bookorders_pipeline" -> (bookordersPipeline _))

  val oracles: Map[String, String] = Map(
    "bookorders_pipeline" -> {
      val rows = goldenCounts.zipWithIndex
        .map { case ((n, c), i) => s"(${i + 1}, '$n', ${c}::BIGINT)" }
        .mkString(", ")
      s"SELECT * FROM (VALUES $rows) t(step, mv, rows) ORDER BY step"
    })
}
