package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** Dev-only: where do the unbucketed 5-way's 10x seconds go — and which
  * knob (customer broadcast, AQE, shuffle width) moves them. */
object Prof5Way10x {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      graft.matview.Materializer.defaultScratch + "/sf10x")
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
      println(f"$tag%-28s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    def liAgg = load(spark, sfDir, "lineitem").groupBy(col("l_orderkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
        .as("rev_e4"),
        count(lit(1)).as("nl"))
      .withColumn("rev_dec", col("rev_e4").cast(DecimalType(18, 0)) *
        lit(new java.math.BigDecimal("0.0001")))
      .drop("rev_e4")

    def joined(c: DataFrame) = {
      val o = load(spark, sfDir, "orders")
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

    // stages in isolation
    time("liagg_only")(liAgg)
    time("current")(joined(load(spark, sfDir, "customer")))
    time("bcast_customer")(joined(broadcast(load(spark, sfDir, "customer"))))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("aqe_off")(joined(load(spark, sfDir, "customer")))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    time("advisory_8m")(joined(load(spark, sfDir, "customer")))
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    time("parts_64")(joined(load(spark, sfDir, "customer")))
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    // plan shape of the current variant
    joined(load(spark, sfDir, "customer")).explain()
    spark.stop()
  }
}
