package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** Dev-only: decimal vs structurally-bounded long-cents partials for the
  * 5-way join's pre-aggregation. */
object Prof5Way {
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

    def joined(liAgg: DataFrame) = {
      val o = load(spark, sfDir, "orders")
      val c = load(spark, sfDir, "customer")
      val n = load(spark, sfDir, "nation")
      val r = load(spark, sfDir, "region")
      liAgg.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("rev_dec")).cast(DoubleType).as("revenue"),
          sum(col("nl")).as("n_lines"))
        .orderBy("r_name", "n_name")
    }

    val li = load(spark, sfDir, "lineitem")
    time("decimal_partials") {
      joined(li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
            (lit(1) - col("l_discount")).cast(DecimalType(4, 2))).as("rev_dec"),
          count(lit(1)).as("nl")))
    }
    time("long_e4_partials") {
      joined(li.groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev_e4"),
          count(lit(1)).as("nl"))
        .withColumn("rev_dec", col("rev_e4").cast(DecimalType(18, 0)) *
          lit(new java.math.BigDecimal("0.0001")))
        .drop("rev_e4"))
    }
    // value check: both formulations must produce identical doubles
    val a = joined(li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
          (lit(1) - col("l_discount")).cast(DecimalType(4, 2))).as("rev_dec"),
        count(lit(1)).as("nl"))).collect()
    val b = joined(li.groupBy(col("l_orderkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"),
        count(lit(1)).as("nl"))
      .withColumn("rev_dec", col("rev_e4").cast(DecimalType(18, 0)) *
        lit(new java.math.BigDecimal("0.0001")))
      .drop("rev_e4")).collect()
    println(s"values_identical=${a.sameElements(b)}")
    spark.stop()
  }
}
