package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: bit-parity probe — Spark `percentile` vs DuckDB
  * `quantile_cont` interpolation. */
object ProfPct {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.Tables.load(spark, "/root/testdata/sf0.01", "orders")
    df.groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))
      .orderBy("o_orderpriority").collect()
      .foreach(x => println(s"RES ${x.getString(0)} ${x.getDouble(1)} ${x.getDouble(2)}"))
    spark.stop()
  }
}
