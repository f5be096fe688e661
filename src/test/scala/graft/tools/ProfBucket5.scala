package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only: 5-way join against parquet vs against orderkey-bucketed
  * fact tables (the co-located layout a 100 TB deployment would choose). */
object ProfBucket5 {
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
    val m = graft.matview.Materializer(spark)

    val t0 = System.nanoTime()
    m.createBucketed("b5_lineitem",
      graft.Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount"),
      Seq("l_orderkey"), 32)
    m.createBucketed("b5_orders",
      graft.Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_custkey"),
      Seq("o_orderkey"), 32)
    println(f"bucketed_write=${(System.nanoTime() - t0) / 1e9}%.3f")

    def fiveWay(li: DataFrame, o: DataFrame, merge: Boolean): DataFrame = {
      val c = graft.Tables.load(spark, sfDir, "customer")
      val n = graft.Tables.load(spark, sfDir, "nation")
      val r = graft.Tables.load(spark, sfDir, "region")
      val liAgg = li.groupBy(col("l_orderkey"))
        .agg(
          sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_e4"),
          count(lit(1)).as("nl"))
        .withColumn("rev_dec", col("rev_e4").cast(DecimalType(18, 0)) *
          lit(new java.math.BigDecimal("0.0001")))
        .drop("rev_e4")
      val lo = if (merge)
        liAgg.hint("MERGE").join(o.hint("MERGE"),
          col("l_orderkey") === col("o_orderkey"))
      else liAgg.join(o, col("l_orderkey") === col("o_orderkey"))
      lo
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(col("rev_dec")).cast(DoubleType).as("revenue"),
          sum(col("nl")).as("n_lines"))
        .orderBy("r_name", "n_name")
    }

    def parquet5 = fiveWay(
      graft.Tables.load(spark, sfDir, "lineitem"),
      graft.Tables.load(spark, sfDir, "orders"), merge = false)
    def bucketed5 = fiveWay(
      spark.table("b5_lineitem"), spark.table("b5_orders"), merge = true)

    time("parquet_5way")(parquet5)
    time("bucketed_5way")(bucketed5)
    val ex = (df: DataFrame) => df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    println(s"exchanges parquet=${ex(parquet5)} bucketed=${ex(bucketed5)}")
    println(s"values_identical=${parquet5.collect().sameElements(bucketed5.collect())}")
    spark.stop()
  }
}
