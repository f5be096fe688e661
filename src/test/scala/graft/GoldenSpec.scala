package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.bookorders.BookOrdersMart

/** Golden end-to-end suite: the reference's own dataset through the full
  * ETL + every query, asserted against the exact result sets published in
  * assignment-5.md (SURVEY §5). Decimal goldens compare at 1e-6 — the
  * reference prints PG numeric at data-dependent scale (SURVEY §7.2).
  */
class GoldenSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val mart = new BookOrdersMart(
    spark, "src/test/resources/bookorders",
    s"${TestSpark.scratch}/bookorders")

  private def d(df: org.apache.spark.sql.DataFrame): BigDecimal =
    BigDecimal(df.collect().head.getDecimal(0))

  private val EPS = BigDecimal("0.000001")

  test("ingest: dump row counts (dump:123–1648)") {
    assert(mart.author.count() == 14)
    assert(mart.book.count() == 12)
    assert(mart.bookAuthor.count() == 18)
    assert(mart.custOrder.count() == 222)
    assert(mart.customer.count() == 118)
    assert(mart.orderDetail.count() == 1100)
  }

  test("cleanup updates applied (assignment-5.sql:13–15)") {
    assert(mart.customer.filter("city = 'Sidney'").count() == 0)
    val c96 = mart.customer.filter("customerid = 96").collect().head
    assert(c96.getAs[String]("district") == "Povardarje")
    val c100 = mart.customer.filter("customerid = 100").collect().head
    assert(c100.getAs[String]("district") == "Budapest")
  }

  test("time dimension: 124 rows, dense ordered TimeId (md:77–82)") {
    val t = mart.time.collect().sortBy(_.getAs[Int]("timeid"))
    assert(t.length == 124)
    assert(t.head.getAs[Int]("timeid") == 1)
    assert(t.last.getAs[Int]("timeid") == 124)
    val dates = t.map(_.getAs[java.sql.Date]("orderdate").toLocalDate)
    assert(dates.zip(dates.tail).forall { case (a, b) => a.isBefore(b) })
    // Apr/May 2017 occupy TimeIds 108–124 (md:1037–1069)
    val apr = t.filter(r => r.getAs[String]("month") == "April" &&
      r.getAs[Int]("year") == 2017).map(_.getAs[Int]("timeid"))
    assert(apr.min == 108)
  }

  test("sales fact: 1070 rows (md:148–153)") {
    assert(mart.sales.count() == 1070)
  }

  test("Q2: avg-of-avg 202.9588687852809865 (wrong) vs global avg 161.3691588785046729 (md:170–187)") {
    assert((d(mart.avgOfAvg) - BigDecimal("202.9588687852809865")).abs < EPS)
    assert((d(mart.globalAvgAmnt) - BigDecimal("161.3691588785046729")).abs < EPS)
  }

  test("Q2: per-customer-day: 198 rows, avg 872.0454545454545455, weighted recombination identical (md:196–239)") {
    assert(mart.sumCustomerPerDay.count() == 198)
    assert((d(mart.avgSpendingPerCustomerDay) - BigDecimal("872.0454545454545455")).abs < EPS)
    assert((d(mart.weightedTotalAvg) - BigDecimal("872.0454545454545455")).abs < BigDecimal("0.0001"))
  }

  test("Q3a: best_buyers exact golden rows (md:268–275)") {
    val rows = mart.bestBuyers.collect().map(r => (
      r.getAs[Int]("customer_id"), r.getAs[String]("first_name"),
      r.getAs[String]("last_name"), BigDecimal(r.getDecimal(3))))
    val expected = Seq(
      (1, "Kirk", "Jacson", BigDecimal("17810.00")),
      (3, "Peter", "Andree", BigDecimal("14100.00")),
      (14, "Craig", "Anslow", BigDecimal("11780.00")),
      (2, "May-N", "Leow", BigDecimal("7145.00")),
      (79, "Jiajun", "Liang", BigDecimal("6095.00")))
    assert(rows.toSeq == expected)
  }

  test("Q3b: ord_avg_amnt 777.77027… over 222 orders (md:300–313)") {
    assert(mart.amountPerOrder.count() == 222)
    assert((d(mart.ordAvgAmnt) - BigDecimal("777.7702702702702703")).abs < EPS)
  }

  test("Q3b: best buyer issued 14 orders (md:329–334)") {
    assert(mart.noOfOrd.collect().head.getLong(0) == 14)
    assert(mart.amountPerOrderByCustomer.count() == 14)
  }

  test("Q3b: perc_of_ord 71.4285714285714286 and the CASE verdict (md:389–427)") {
    assert((d(mart.percOfOrd) - BigDecimal("71.4285714285714286")).abs < EPS)
    val v = mart.verdict.collect().head.getAs[String]("case")
    assert(v.contains("greater (than average) to medium number of orders"))
  }

  test("Q4: view row counts — View1 1070, View2 132, View3 1006 (md:774, 807)") {
    assert(mart.view1.count() == 1070)
    assert(mart.view2.count() == 132)
    assert(mart.view3.count() == 1006)
  }

  test("Q4a: all four formulations return the identical top-5 (BASELINE.md invariant)") {
    val expected = mart.q4aMart.collect().toSeq
    assert(mart.q4aRaw.collect().toSeq == expected)
    assert(mart.q4aView1.collect().toSeq == expected)
    assert(mart.q4aView2.collect().toSeq == expected)
    // and they equal best_buyers' golden top row
    assert(expected.head.getAs[Int]("customer_id") == 1)
  }

  test("Q4b: all four formulations agree on the top country") {
    val expected = mart.q4bMart.collect().toSeq
    assert(mart.q4bRaw.collect().toSeq == expected)
    assert(mart.q4bView2.collect().toSeq == expected)
    assert(mart.q4bView3.collect().toSeq == expected)
    assert(expected.head.getAs[String]("country") == "New Zealand")
  }

  test("Q5a: merged window report — 25 rows, golden spot checks (md:919–946)") {
    val rows = mart.q5aReport.collect()
    assert(rows.length == 25)
    val r94 = rows.find(_.getAs[Int]("customerid") == 94).get
    assert(r94.getAs[String]("firstname") == "Shweta")
    assert(r94.getAs[String]("city") == "Auckland")
    assert(BigDecimal(r94.getDecimal(3)) == BigDecimal("3615.00"))
    assert((BigDecimal(r94.getDecimal(4)) - BigDecimal("197.5")).abs < EPS)
    val r100 = rows.find(_.getAs[Int]("customerid") == 100).get
    assert((BigDecimal(r100.getDecimal(4)) - BigDecimal("225.8333333333333333")).abs < EPS)
  }

  test("Q5a: MV-based report matches the golden per-city averages (md:977–1004)") {
    val rows = mart.q5aMvReport.collect()
    assert(rows.length == 25)
    val r118 = rows.find(_.getAs[Int]("customerid") == 118).get
    assert(BigDecimal(r118.getDecimal(3)) == BigDecimal("1465.00"))
    assert((BigDecimal(r118.getDecimal(4)) - BigDecimal("1465.0")).abs < EPS)
    val r94 = rows.find(_.getAs[Int]("customerid") == 94).get
    assert((BigDecimal(r94.getDecimal(4)) - BigDecimal("2370.0")).abs < EPS)
    val r105 = rows.find(_.getAs[Int]("customerid") == 105).get
    assert((BigDecimal(r105.getDecimal(4)) - BigDecimal("1776.6666666666666667")).abs < EPS)
  }

  test("Q5b: cumulative sums — 33 rows, Auckland/Wuhan goldens, both formulations identical (md:1035–1130)") {
    val rows = mart.q5bCumulative.collect()
    assert(rows.length == 33)
    def cum(city: String) = rows.filter(_.getAs[String]("city") == city)
      .sortBy(_.getAs[Int]("timeid"))
      .map(r => BigDecimal(r.getDecimal(4))).toSeq
    assert(cum("Auckland") == Seq("360.00", "2610.00", "5415.00", "7110.00").map(BigDecimal(_)))
    assert(cum("Wuhan") == Seq("1735.00", "3260.00", "3455.00", "3705.00", "5330.00").map(BigDecimal(_)))
    // the nested stacked-window formulation is row-identical (md:1094–1130)
    val nested = mart.q5bNested.collect()
    assert(nested.map(_.toSeq.toList).toList == rows.map(_.toSeq.toList).toList)
  }

  test("constraints hold: PKs unique, FKs contained (dump:1652–1736)") {
    import org.apache.spark.sql.functions._
    val tables = Map(
      "author" -> mart.author, "book" -> mart.book,
      "book_author" -> mart.bookAuthor, "cust_order" -> mart.custOrder,
      "customer" -> mart.customer, "order_detail" -> mart.orderDetail)
    graft.bookorders.Model.primaryKeys.foreach { case (t, keys) =>
      val df = tables(t)
      val dupes = df.groupBy(keys.map(col): _*).count().filter(col("count") > 1)
      assert(dupes.count() == 0, s"PK violated in $t")
    }
    assert(mart.orderDetail.join(mart.book, Seq("isbn"), "left_anti").count() == 0)
    assert(mart.custOrder.join(mart.customer, Seq("customerid"), "left_anti").count() == 0)
    assert(mart.orderDetail.join(mart.custOrder, Seq("orderid"), "left_anti").count() == 0)
  }
}
