package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.FdRegistry

/** PG-style FD GROUP BY via GraftExtensions: `GROUP BY customerid` while
  * selecting name columns resolves (first() injected), matching the
  * reference's best-buyers shape verbatim (assignment-5.sql:191–200).
  */
class FdGroupBySpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  // getOrCreate() reuses an existing default session and silently ignores
  // withExtensions — force a genuinely new session, restore after
  private var saved: Option[SparkSession] = None

  private lazy val spark: SparkSession = {
    saved = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-fd-test")
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

  private def setup(): Unit = {
    graft.Tables.load(spark, TestSpark.SF, "customer")
      .createOrReplaceTempView("customer_fd")
    graft.Tables.load(spark, TestSpark.SF, "orders")
      .createOrReplaceTempView("orders_fd")
  }

  test("PG-style FD group-by resolves once the FD is declared") {
    setup()
    FdRegistry.clear()
    FdRegistry.declare("c_custkey", Set("c_name", "c_mktsegment"))
    val df = spark.sql(
      """SELECT c_custkey, c_name, COUNT(*) AS n, SUM(o_totalprice) AS spend
        |FROM orders_fd JOIN customer_fd ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // c_name is the real dependent value, not null
    assert(rows.forall(_.getAs[String]("c_name") != null))
    // equivalent to the explicit group-by-both form
    val explicitForm = spark.sql(
      """SELECT c_custkey, c_name, COUNT(*) AS n, SUM(o_totalprice) AS spend
        |FROM orders_fd JOIN customer_fd ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name""".stripMargin)
    assert(df.exceptAll(explicitForm).isEmpty && explicitForm.exceptAll(df).isEmpty)
  }

  test("transitive FDs: city -> district -> country closure") {
    FdRegistry.clear()
    FdRegistry.declare("city", Set("district"))
    FdRegistry.declare("district", Set("country"))
    assert(FdRegistry.dependentsOf(Set("city")) == Set("district", "country"))
  }

  test("table-scoped FDs do not leak onto same-named columns elsewhere") {
    setup()
    graft.Tables.load(spark, TestSpark.SF, "customer")
      .createOrReplaceTempView("customer2_fd")
    FdRegistry.clear()
    FdRegistry.declareFor("customer_fd", Set("c_custkey"), Set("c_name"))
    // scoped view resolves...
    val ok = spark.sql(
      """SELECT c_custkey, c_name, COUNT(*) AS n FROM customer_fd
        |GROUP BY c_custkey""".stripMargin)
    assert(ok.collect().nonEmpty)
    // ...the other view (same columns, different relation alias) must not
    val e = intercept[Exception] {
      spark.sql(
        """SELECT c_custkey, c_name, COUNT(*) AS n FROM customer2_fd
          |GROUP BY c_custkey""".stripMargin).collect()
    }
    assert(e.getMessage.contains("GROUP BY") ||
      e.getMessage.contains("MISSING_AGGREGATION"))
  }

  test("model primary keys auto-derive FDs, composite keys jointly") {
    FdRegistry.clear()
    FdRegistry.declarePrimaryKeys(
      graft.bookorders.Model.all, graft.bookorders.Model.primaryKeys)
    val cust: FdRegistry.Scope = ("customer", 1L)
    val fromCustomerPk =
      FdRegistry.closure(Set(("customerid", Set(cust))))
    assert(fromCustomerPk.contains(("f_name", Some(cust))))
    assert(fromCustomerPk.contains(("country", Some(cust))))
    // composite PK: both parts needed — and needed in the SAME instance
    // (a self-join's two sides must not unlock each other's FDs)
    val od: FdRegistry.Scope = ("order_detail", 1L)
    val both = FdRegistry.closure(
      Set(("orderid", Set(od)), ("item_no", Set(od))))
    assert(both.contains(("quantity", Some(od))))
    val half = FdRegistry.closure(Set(("orderid", Set(od))))
    assert(!half.exists(_._1 == "quantity"))
    val crossInstance = FdRegistry.closure(
      Set(("orderid", Set(od)), ("item_no", Set(("order_detail", 2L)))))
    assert(!crossInstance.exists(_._1 == "quantity"),
      "determinants split across two instances must not fire the FD")
  }

  test("without the FD declaration the plan still fails analysis") {
    setup()
    FdRegistry.clear()
    val e = intercept[Exception] {
      spark.sql(
        """SELECT c_custkey, c_name, COUNT(*) AS n FROM customer_fd
          |GROUP BY c_custkey""".stripMargin).collect()
    }
    assert(e.getMessage.contains("GROUP BY") || e.getMessage.contains("MISSING_AGGREGATION"))
  }

  test("native as-of strategy is active in the extension session") {
    val strategies = spark.sessionState.planner.strategies
    assert(strategies.exists(_.getClass.getName.contains("AsOfJoinStrategy")) ||
      spark.sessionState.planner.extraPlanningStrategies
        .exists(_.getClass.getName.contains("AsOfJoinStrategy")))
  }

  test("RangeJoinRule rewrites a naive range join to a binned equi join") {
    import org.apache.spark.sql.functions._
    val pts = spark.range(1000).select(col("id").as("p"))
    val ivs = spark.range(50).select((col("id") * 20).as("s"),
      (col("id") * 20 + 10).as("e"))
    val j = pts.join(ivs, col("p") >= col("s") && col("p") < col("e"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested loop survived:\n$plan")
    // each interval [20i, 20i+10) holds exactly 10 points
    assert(j.count() == 500)
  }
}
