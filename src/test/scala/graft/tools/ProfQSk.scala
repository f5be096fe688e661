package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: split agg_quantile_sketch's cost between the SKETCH pass
  * (one corpus scan into 15 KiB buffers) and the r16-era exact-quantile
  * formulation (per-value counts + Ranks range scan) — kept here as the
  * A/B baseline for the r17 bucket-scan rewrite, which replaced it in
  * the key itself (the exact side now locates each target bucket from
  * the sketch's exact counters and scans only those buckets' rows:
  * ProfKey sf1 4.88 -> 2.14, sf10 21.5 -> 8.2 same-session).
  *
  *   sbt "Test/runMain graft.tools.ProfQSk [dir]"
  */
object ProfQSk {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/target/scratch/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profqsk] $label best=${ts.min}%.2f all=${
        ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
    time("sketch_pass") {
      li.groupBy("flag").agg(
          graft.functions.QuantileSketchAgg.quantile_sketch(col("v")).as("sk"),
          count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    time("exact_counts_ranks") {
      val counts = li.groupBy("flag", "v").agg(count(lit(1)).as("c"))
      graft.operators.Ranks.runningSumByRange(
          counts, 32, Seq(col("flag"), col("v")), col("c"), "gcum")
        .write.format("noop").mode("overwrite").save()
    }
    time("full_key") {
      graft.queries.Extras.aggQuantileSketch(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
