package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** Dev-only micro-profiler: times plan variants of one query so hot-path
  * decisions (decimal vs long-cents aggregation, etc.) are made on
  * measurements, not guesses. Not part of the driver surface. */
object Prof {
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
      println(f"$tag%-28s best=${ts.min}%.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val li = load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-02").cast(TimestampType))

    // scan + count only (floor)
    time("scan_count") {
      li.groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("n"))
    }
    // plain double sums (inexact; timing only)
    time("double_sums") {
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity")).as("a"),
        sum(col("l_extendedprice")).as("b"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))).as("d"),
        avg(col("l_quantity")).as("e"),
        avg(col("l_extendedprice")).as("f"),
        count(lit(1)).as("g"))
    }
    // current decimal formulation
    time("decimal_sums") {
      graft.queries.Relational.aggSumGroup3(spark, sfDir)
    }
    // long-cents formulation (exact fixed-point)
    time("long_cents") {
      val cents = round(col("l_extendedprice") * 100).cast(LongType)
      val dpct = round(col("l_discount") * 100).cast(LongType)
      val tpct = round(col("l_tax") * 100).cast(LongType)
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity")).cast(DoubleType).as("sum_qty"),
        (sum(cents).cast(DoubleType) / 100.0).as("sum_base_price"),
        (sum(cents * (lit(100L) - dpct)).cast(DoubleType) / 1e4).as("sum_disc_price"),
        (sum(cents * (lit(100L) - dpct) * (lit(100L) + tpct)).cast(DoubleType) / 1e6).as("sum_charge"),
        count(lit(1)).as("count_order"))
    }
    spark.stop()
  }
}
