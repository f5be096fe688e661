package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway probe main (deleted before commit). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("scratch").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    graft.Tables.load(spark, d, "customer").createOrReplaceTempView("customer")
    graft.Tables.load(spark, d, "orders").createOrReplaceTempView("orders")
    // LATERAL with correlated ORDER BY + LIMIT (top-n per key)
    try {
      val df = spark.sql("""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        ORDER BY c.c_custkey, o.o_orderkey""")
      println("LATERAL-LIMIT OK rows=" + df.count())
      df.show(5)
      df.explain()
    } catch { case e: Throwable => println("LATERAL-LIMIT FAIL: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
