package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only: decimal vs long-cents running window sum (the
  * window_cumulative formulation choice; see Relational.windowCumulative).
  * The long-cents lane is bounded by one CUSTOMER's lifetime spend, so
  * unlike a groupBy sum it needs no lane split to be scale-safe. */
object ProfWin {
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
    // the pre-r4 decimal formulation, kept as the comparison baseline
    def decimalForm = {
      val perDay = graft.Tables.load(spark, sfDir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(sum(col("o_totalprice").cast(DecimalType(12, 2))).as("day_spend"))
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
      perDay.select(
        col("o_custkey"), col("o_orderdate"),
        col("day_spend").cast(DoubleType).as("day_spend"),
        sum(col("day_spend")).over(w).cast(DoubleType).as("running_spend"))
        .orderBy("o_custkey", "o_orderdate")
    }
    time("win_decimal")(decimalForm)
    time("win_lane")(graft.queries.Relational.windowCumulative(spark, sfDir))
    println(s"identical=${decimalForm.collect().sameElements(
      graft.queries.Relational.windowCumulative(spark, sfDir).collect())}")
    spark.stop()
  }
}
