package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage decomposition of one graph_pagerank iteration —
  * edge build/checkpoint cost, then one contrib+fold round with the
  * deterministic ordered fold vs a plain (non-deterministic) sum, to
  * price the cross-engine determinism tax.
  *
  *   sbt "Test/runMain graft.tools.ProfPR [dir]"
  */
object ProfPR {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/scratch/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profpr] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val SER = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val P = 1L << 40
    val e0 = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_suppkey").cast("long").as("src"),
        (col("l_partkey").cast("long") + P).as("dst"))
      .distinct()
    val edges = time("edges build+checkpoint") {
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src"))
        .localCheckpoint(true, SER)
    }
    println(s"[profpr] directed edges: ${edges.count()}")
    val nodes = time("nodes checkpoint") {
      edges.select(col("src").as("id")).distinct().localCheckpoint(true, SER)
    }
    val nNodes = nodes.count()
    println(s"[profpr] nodes: $nNodes")
    val deg = time("deg checkpoint") {
      edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true, SER)
    }
    val ranks = nodes.withColumn("rank", lit(1.0 / nNodes))
    def rd = ranks.join(deg, col("id") === col("src"))
      .select(col("id"), (col("rank") / col("deg")).as("c"))
    def contrib = edges.join(rd.hint("shuffle_hash"), col("src") === col("id"))
      .select(col("dst"), col("src"), col("c"))
    (1 to 2).foreach { r =>
      time(s"iteration (ordered fold) r$r") {
        contrib.groupBy("dst")
          .agg(expr("aggregate(array_sort(collect_list(struct(src, c))), " +
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.c)").as("in_sum"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"iteration (native fold)  r$r") {
        contrib.groupBy("dst")
          .agg(graft.functions.OrderedSumAgg
            .ordered_sum(col("src"), col("c")).as("in_sum"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"iteration (plain sum)    r$r") {
        contrib.groupBy("dst").agg(sum(col("c")).as("in_sum"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"contrib only (no agg)    r$r") {
        contrib.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
