package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranks

/** The two-phase distributed rank must be value-identical to the naive
  * single-partition `row_number() OVER (ORDER BY ...)` for any total sort
  * order — boundary placement from the range sampler must never show
  * through. Pinned on random date sets (the BookOrdersMart TimeId shape)
  * and on a nullable key with explicit NULL ordering (the orderby_nulls
  * shape).
  */
class RanksSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def naive(df: DataFrame, order: Seq[Column], out: String): DataFrame =
    df.withColumn(out, row_number().over(Window.orderBy(order: _*)))

  test("two-phase rank equals single-partition row_number on random date sets") {
    val rnd = new scala.util.Random(20260813L)
    for (n <- Seq(1, 3, 7, 124, 1500)) {
      val dates = Seq.fill(n)(
        java.time.LocalDate.of(2020, 1, 1).plusDays(rnd.nextInt(4000)))
        .distinct.map(d => java.sql.Date.valueOf(d))
      val df = dates.toDF("orderdate").repartition(5)
      def dump(d: DataFrame) = d.select("orderdate", "timeid").collect()
        .map(r => (r.getDate(0).toString, r.getInt(1))).toSet
      val two = dump(
        Ranks.rowNumberByRange(df, 8, Seq(col("orderdate")), "timeid"))
      val one = dump(naive(df, Seq(col("orderdate")), "timeid"))
      assert(two == one, s"n=$n: two-phase != naive")
    }
  }

  test("two-phase rank honors explicit NULL ordering (nulls_last / nulls_first)") {
    val rows = (1L to 500L).map(i =>
      (i, if (i % 7 == 0) null else s"s${i % 13}"))
    val df = rows.toDF("k", "v").repartition(6)
    for (ord <- Seq(
        Seq(col("v").asc_nulls_last, col("k")),
        Seq(col("v").desc_nulls_first, col("k")))) {
      def dump(d: DataFrame) = d.select("k", "rn").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(dump(Ranks.rowNumberByRange(df, 8, ord, "rn")) ==
        dump(naive(df, ord, "rn")))
    }
  }

  test("two-phase running sum equals the single-partition window scan") {
    val rnd = new scala.util.Random(6L)
    val rows = (1L to 800L).map(i => (i * 13 % 801, 1L + rnd.nextInt(50)))
    val df = rows.toDF("k", "v").repartition(6)
    def dump(d: DataFrame) = d.select("k", "run").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val two = dump(Ranks.runningSumByRange(df, 8, Seq(col("k")), col("v"), "run"))
    val one = dump(df.withColumn("run",
      sum("v").over(Window.orderBy(col("k")))))
    assert(two == one)
  }

  test("staging plan: one range exchange, no window, no single partition") {
    // phase 1 must move the data exactly once (the range exchange) — a
    // window partitioned by the range pid would re-shuffle everything to
    // hashpartitioning(pid); the narrow mapPartitions scan must not
    val df = (1L to 100L).map(i => (i * 7 % 101, 1L)).toDF("k", "v")
      .repartition(4)
    val p = Ranks.scanStaging(df, 8, Seq(col("k")), col("v"))
      .queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning("), s"range exchange missing:\n$p")
    assert(!p.contains("hashpartitioning("),
      s"second full-data exchange in the staging plan:\n$p")
    assert(!p.contains("WindowExec") && !p.contains("Window ["),
      s"window in the staging plan:\n$p")
    assert(!p.contains("SinglePartition"), s"single-partition exchange:\n$p")
  }

  test("running sum is correct with negative values (max_by totals, not max)") {
    val rows = (1L to 400L).map(i => (i * 29 % 401, (i % 11) - 5L))
    val df = rows.toDF("k", "v").repartition(6)
    def dump(d: DataFrame) = d.select("k", "run").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val two = dump(Ranks.runningSumByRange(df, 8, Seq(col("k")), col("v"), "run"))
    val one = dump(df.withColumn("run",
      sum("v").over(Window.orderBy(col("k")))))
    assert(two == one)
  }

  test("two-phase rank output is dense 1..N") {
    val df = (1L to 300L).map(i => (i * 37 % 301, i)).toDF("a", "b")
    val ranks = Ranks.rowNumberByRange(df, 8, Seq(col("a"), col("b")), "rn")
      .select("rn").collect().map(_.getInt(0)).sorted
    assert(ranks.toSeq == (1 to 300).toSeq)
  }
}
