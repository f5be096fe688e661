package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.bookorders.{BookOrdersMart, Model}
import graft.plans.FdRegistry

/** SQL-level golden parity: the reference's own query TEXT (PostgreSQL
  * FD GROUP BY + NATURAL JOIN, assignment-5.sql:191–200) runs unmodified
  * through a GraftExtensions session — the FD rule resolves `GROUP BY
  * customerid` selecting name columns from the Model's declared primary
  * keys, and the result matches the published golden rows exactly.
  */
class GoldenSqlSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private var saved: Option[SparkSession] = None

  private lazy val spark: SparkSession = {
    saved = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-golden-sql")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    saved.foreach { s =>
      SparkSession.setDefaultSession(s)
      SparkSession.setActiveSession(s)
    }
    super.afterAll()
  }

  private lazy val mart: BookOrdersMart = {
    val m = new BookOrdersMart(spark, "src/test/resources/bookorders",
      s"${TestSpark.scratch}/bookorders-sql")
    m.sales.createOrReplaceTempView("sales")
    m.customer.createOrReplaceTempView("customer")
    FdRegistry.clear()
    FdRegistry.declarePrimaryKeys(Model.all, Model.primaryKeys)
    // the declared attribute hierarchy (Assignment5_17.pdf p.1)
    FdRegistry.declareFor("customer", Set("city"), Set("district"))
    FdRegistry.declareFor("customer", Set("district"), Set("country"))
    m
  }

  test("Q4a SQL text runs verbatim and returns the golden top-5") {
    mart // force setup
    val rows = spark.sql(
      """SELECT
        |  customer.CustomerId AS customer_id,
        |  customer.f_name     AS first_name,
        |  customer.l_name     AS last_name,
        |  sum(amnt)           AS spending
        |FROM sales
        |  NATURAL JOIN customer
        |GROUP BY customer.CustomerId
        |ORDER BY spending DESC LIMIT 5""".stripMargin)
      .collect()
      .map(r => (r.getAs[Int]("customer_id"), r.getAs[String]("first_name"),
        r.getAs[String]("last_name"), BigDecimal(r.getDecimal(3))))
    val expected = Seq(
      (1, "Kirk", "Jacson", BigDecimal("17810.00")),
      (3, "Peter", "Andree", BigDecimal("14100.00")),
      (14, "Craig", "Anslow", BigDecimal("11780.00")),
      (2, "May-N", "Leow", BigDecimal("7145.00")),
      (79, "Jiajun", "Liang", BigDecimal("6095.00")))
    assert(rows.toSeq == expected)
  }

  test("district -> country FD resolves in SQL (Q4b's derived-dim shape)") {
    // note: city -> district is declared (Assignment5_17.pdf p.1) but the
    // DATA still violates it after cleanup (Beijing spans two districts) —
    // the declaration resolves the plan; only district -> country is also
    // value-clean, so that is the pair asserted for result equality
    mart
    val byFd = spark.sql(
      """SELECT district, country, sum(amnt) AS spending
        |FROM sales NATURAL JOIN customer
        |GROUP BY district""".stripMargin)
    val explicit = spark.sql(
      """SELECT district, country, sum(amnt) AS spending
        |FROM sales NATURAL JOIN customer
        |GROUP BY district, country""".stripMargin)
    assert(byFd.exceptAll(explicit).isEmpty && explicit.exceptAll(byFd).isEmpty)
  }
}
