package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: prototype of the ANALYZE-driven join-reorder probe — the
  * stats_join_flip idea one level up (flip the ORDER, not just the
  * strategy). Builds catalog tables from a generated SfGen dir, ANALYZEs
  * them, and times the same worst-order 3-table query with CBO join
  * reorder off vs on.
  *
  *   sbt "Test/runMain graft.tools.ProfReorder [scale] [reps]"
  */
object ProfReorder {
  def main(args: Array[String]): Unit = {
    val scale = args.lift(0).map(_.toDouble).getOrElse(1.0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables.load

    val scratch = graft.matview.Materializer.defaultScratch
    val dir = s"$scratch/sf_reorder"
    println(s"-- generating scale=$scale ...")
    graft.tools.SfGen.generate(spark, dir, scale = scale)

    def mkTable(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      df.write.mode("overwrite")
        .option("path", s"$scratch/$name").saveAsTable(name)
    }
    mkTable("br_li", load(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice"))
    mkTable("br_ord", load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey"))
    mkTable("br_cust", load(spark, dir, "customer")
      .select("c_custkey", "c_nationkey"))
    Seq("br_li", "br_ord", "br_cust").foreach(t => spark.sql(
      s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))

    // worst left-deep order: the two fact-sized tables joined first, the
    // selective dim last
    def query = spark.table("br_li")
      .join(spark.table("br_ord"), col("l_orderkey") === col("o_orderkey"))
      .join(spark.table("br_cust").filter(col("c_nationkey") === 5),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("rev"))

    val touched = Seq("spark.sql.cbo.enabled",
      "spark.sql.cbo.joinReorder.enabled")
    def setCbo(on: Boolean): Unit =
      touched.foreach(k => spark.conf.set(k, on.toString))

    def deepestJoinLeaves: Seq[String] = {
      import org.apache.spark.sql.catalyst.plans.logical.Join
      val joins = query.queryExecution.optimizedPlan
        .collect { case j: Join => j }
      joins.lastOption.toSeq.flatMap(_.collectLeaves().map(_.toString))
    }
    setCbo(false)
    println(s"-- deepest join leaves, cbo off: ${deepestJoinLeaves.map(_.take(60))}")
    setCbo(true)
    println(s"-- deepest join leaves, cbo on:  ${deepestJoinLeaves.map(_.take(60))}")
    query.explain("formatted")

    // interleaved reps
    val samples = (1 to reps).map { _ =>
      Seq(false, true).map { on =>
        setCbo(on)
        val t0 = System.nanoTime()
        query.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
    }
    println(f"-- as_written best ${samples.map(_(0)).min}%.3f  samples ${samples.map(_(0)).map(s => f"$s%.2f")}")
    println(f"-- cbo        best ${samples.map(_(1)).min}%.3f  samples ${samples.map(_(1)).map(s => f"$s%.2f")}")
    spark.stop()
  }
}
