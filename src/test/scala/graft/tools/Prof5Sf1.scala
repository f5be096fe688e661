package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Dev-only: sf1 stage decomposition of join_natural_5way (ROADMAP r5) —
  * scan and partial-agg alone vs the registered query, to locate the
  * floor. The registered plan carries the SHUFFLE_HASH pin on the orders
  * join (Relational.joinNatural5Way); the capped-threshold rep measures
  * what Catalyst would do if broadcast were also off the table for the
  * dimension joins.
  */
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
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      (8 * 1024 * 1024).toString)
    time("full_query_capped_bc") {
      graft.SparkEntry.queries("join_natural_5way")(spark, dir)
    }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.stop()
  }
}
