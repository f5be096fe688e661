package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** Dev-only: decimal vs two-level (long-partials, decimal re-sum) Q1. */
object ProfQ1 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-24s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def money(c: Column) = c.cast(DecimalType(12, 2))
    def oneMinus(c: Column) = (lit(1) - c).cast(DecimalType(4, 2))
    def onePlus(c: Column) = (lit(1) + c).cast(DecimalType(4, 2))

    def current = load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-02").cast(TimestampType))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).cast(DoubleType).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        sum(money(col("l_extendedprice")) * oneMinus(col("l_discount")))
          .cast(DoubleType).as("sum_disc_price"),
        sum(money(col("l_extendedprice")) * oneMinus(col("l_discount")) *
          onePlus(col("l_tax"))).cast(DoubleType).as("sum_charge"),
        exactAvg(col("l_quantity")).as("avg_qty"),
        exactAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

    def twoLevel = {
      val e2 = (c: Column) => round(c * 100).cast("long")
      val d100 = lit(100L) - e2(col("l_discount")) / 1 // discount in e2 units
      val l1 = load(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"))
        .agg(
          sum(e2(col("l_quantity"))).as("qty_e2"),
          sum(e2(col("l_extendedprice"))).as("base_e2"),
          sum(e2(col("l_extendedprice")) *
            (lit(100L) - e2(col("l_discount")))).as("disc_e4"),
          sum(e2(col("l_extendedprice")) *
            (lit(100L) - e2(col("l_discount"))) *
            (lit(100L) + e2(col("l_tax")))).as("charge_e6"),
          count(lit(1)).as("nl"))
      def dec(c: Column, unit: String) =
        c.cast(DecimalType(18, 0)) * lit(new java.math.BigDecimal(unit))
      l1.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("qty_e2"), "0.01")).cast(DoubleType).as("sum_qty"),
          sum(dec(col("base_e2"), "0.01")).cast(DoubleType).as("sum_base_price"),
          sum(dec(col("disc_e4"), "0.0001")).cast(DoubleType).as("sum_disc_price"),
          sum(dec(col("charge_e6"), "0.000001")).cast(DoubleType).as("sum_charge"),
          (sum(dec(col("qty_e2"), "0.01")).cast(DoubleType) /
            sum(col("nl"))).as("avg_qty"),
          (sum(dec(col("base_e2"), "0.01")).cast(DoubleType) /
            sum(col("nl"))).as("avg_price"),
          sum(col("nl")).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }

    time("q1_decimal")(current)
    time("q1_two_level")(twoLevel)
    println(s"values_identical=${current.collect().sameElements(twoLevel.collect())}")
    spark.stop()
  }
}
