package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Dev-only: sf1 stage decomposition of join_natural_5way (ROADMAP r5 item
  * 2) — scan+partial-agg alone vs full query, to locate the floor. */
object Prof5Sf1 {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/target/scratch/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
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
      println(f"[prof5sf1] $tag%-22s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val li = load(spark, dir, "lineitem")
    time("scan_only") {
      li.select("l_orderkey", "l_extendedprice", "l_discount")
        .filter(col("l_orderkey").isNotNull)
    }
    time("scan_partial_agg") {
      li.groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"),
          count(lit(1)).as("nl"))
    }
    time("full_query") {
      graft.SparkEntry.queries("join_natural_5way")(spark, dir)
    }
    // does the 1.5M-row orders BROADCAST (driver-side build) beat a
    // shuffled fact-fact join at sf1? cap the threshold so orders
    // shuffles while customer still broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (8*1024*1024).toString)
    time("full_query_shuffled") {
      graft.SparkEntry.queries("join_natural_5way")(spark, dir)
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (10*1024*1024*1024L).toString)
    // SHUFFLE_HASH-hinted orders join (no driver-side fact build, no sort)
    def hinted(dd: String): DataFrame = {
      val li = load(spark, dd, "lineitem")
      val liAgg = li.groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"),
          count(lit(1)).as("nl"))
        .withColumn("rev_dec", col("rev_e4").cast(org.apache.spark.sql.types.DecimalType(18, 0)) *
          lit(new java.math.BigDecimal("0.0001")))
        .drop("rev_e4")
      liAgg.join(load(spark, dd, "orders").hint("SHUFFLE_HASH"), col("l_orderkey") === col("o_orderkey"))
        .join(load(spark, dd, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(load(spark, dd, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(load(spark, dd, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("rev_dec")).cast(org.apache.spark.sql.types.DoubleType).as("revenue"),
          sum(col("nl")).as("n_lines"))
        .orderBy("r_name", "n_name")
    }
    time("hinted_sf1") { hinted(dir) }
    time("hinted_sf01") { hinted("/root/testdata/sf0.1") }
    time("current_sf01") { graft.SparkEntry.queries("join_natural_5way")(spark, "/root/testdata/sf0.1") }
    spark.stop()
  }
}
