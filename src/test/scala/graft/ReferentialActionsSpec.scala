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

  test("same-named FK and parent key survive SET NULL and UPDATE CASCADE " +
      "(the reference's customerid ⟷ customerid shape)") {
    // the fixture's TPC-H names (o_custkey vs c_custkey) never collide,
    // but the reference's FK web names both sides identically — pre-fix,
    // onDeleteSet's drop(parent keys) took the child FK column with it,
    // and onUpdateCascade's withColumn+drop deleted the rewritten FK
    import spark.implicits._
    val child = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "customerid")
    val gone = Seq(20L).toDF("customerid")
    val set = onDeleteSet(child, Seq("customerid"), gone,
      lit(null).cast("bigint"))
    assert(set.columns.toSeq == Seq("id", "customerid"))
    assert(set.count() == 3)
    assert(set.filter(col("customerid").isNull).collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    val remap = Seq((30L, 31L)).toDF("customerid", "new_key")
    val upd = onUpdateCascade(child, "customerid", remap)
    assert(upd.columns.toSeq == Seq("id", "customerid"))
    assert(upd.orderBy("id").collect().map(_.getLong(1)).toSeq ==
      Seq(10L, 20L, 31L))
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
