package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.ReferentialActions._

/** FK referential actions over orders(o_custkey) -> customer(c_custkey):
  * each action's result relation, not just the counts the driver key
  * reports. */
class ReferentialActionsSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  private def orders = graft.Tables.load(spark, SF, "orders")
  private def deleted = graft.Tables.load(spark, SF, "customer")
    .filter(col("c_custkey") % 97 === 0).select("c_custkey")

  test("ON DELETE CASCADE removes exactly the referencing rows") {
    val refs = orders.join(deleted,
      col("o_custkey") === col("c_custkey"), "left_semi").count()
    val after = onDeleteCascade(orders, Seq("o_custkey"), deleted)
    assert(after.count() == orders.count() - refs)
    assert(after.join(deleted,
      col("o_custkey") === col("c_custkey"), "left_semi").count() == 0)
  }

  test("ON DELETE SET NULL nulls exactly the referencing FKs, keeps rows") {
    val refs = onDeleteRestrictViolations(orders, Seq("o_custkey"), deleted)
    val after = onDeleteSet(orders, Seq("o_custkey"), deleted,
      lit(null).cast("bigint"))
    assert(after.count() == orders.count())
    assert(after.filter(col("o_custkey").isNull).count() == refs)
  }

  test("ON UPDATE CASCADE remaps every referencing FK and only those") {
    val remap = deleted.select(col("c_custkey").as("old_key"),
      (col("c_custkey") + 10000000L).as("new_key"))
    val refs = onDeleteRestrictViolations(orders, Seq("o_custkey"), deleted)
    val after = onUpdateCascade(orders, "o_custkey", remap)
    assert(after.count() == orders.count())
    assert(after.filter(col("o_custkey") >= 10000000L).count() == refs)
    assert(after.join(deleted,
      col("o_custkey") === col("c_custkey"), "left_semi").count() == 0)
  }
}
