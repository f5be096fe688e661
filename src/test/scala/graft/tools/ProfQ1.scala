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

    // lane-split: ONE groupBy, every money sum decomposed into 22-bit long
    // "lanes" (all-codegen long adds in the hot path; the BigDecimal work
    // collapses to one recombine per GROUP). Exact up to 2^41 rows/group.
    def laneSplit = {
      val e2 = (c: Column) => round(c * 100).cast("long")
      val MASK = (1L << 22) - 1
      def lanes(v: Column, name: String): Seq[Column] = Seq(
        sum(v.bitwiseAND(MASK)).as(s"${name}_lo"),
        sum(shiftrightunsigned(v, 22)).as(s"${name}_hi"))
      def recombine(name: String, unit: Int): Column =
        ((col(s"${name}_hi").cast(DecimalType(24, 0)) * lit(1L << 22) +
          col(s"${name}_lo")) / lit(unit)).cast(DoubleType)
      val base = e2(col("l_extendedprice"))
      val disc = base * (lit(100L) - e2(col("l_discount")))
      val charge = disc * (lit(100L) + e2(col("l_tax")))
      load(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(e2(col("l_quantity"))).as("qty_e2"),
          (lanes(base, "base") ++ lanes(disc, "disc") ++
            lanes(charge, "charge") :+ count(lit(1)).as("count_order")): _*)
        .select(
          col("l_returnflag"), col("l_linestatus"),
          (col("qty_e2").cast(DecimalType(24, 0)) / lit(100))
            .cast(DoubleType).as("sum_qty"),
          recombine("base", 100).as("sum_base_price"),
          recombine("disc", 10000).as("sum_disc_price"),
          recombine("charge", 1000000).as("sum_charge"),
          ((col("qty_e2").cast(DecimalType(24, 0)) / lit(100))
            .cast(DoubleType) / col("count_order")).as("avg_qty"),
          (recombine("base", 100) / col("count_order")).as("avg_price"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }

    time("q1_decimal")(current)
    time("q1_two_level")(twoLevel)
    time("q1_lane_split")(laneSplit)
    println(s"values_identical=${current.collect().sameElements(twoLevel.collect())}")
    println(s"lane_identical=${current.collect().sameElements(laneSplit.collect())}")
    spark.stop()
  }
}
