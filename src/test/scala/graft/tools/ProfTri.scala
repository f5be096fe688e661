package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage decomposition of graph_triangle_sketch — the cp build
  * (lineitem⋈orders + repartition + distinct), the sketch aggregate +
  * pair rollup, and the compact-forward triangle core.
  *
  *   sbt "Test/runMain graft.tools.ProfTri [dir]"
  */
object ProfTri {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/target/scratch/sf1")
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
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[proftri] $label best=${ts.min}%.2f all=${
        ts.map(t => f"$t%.2f").mkString(",")}")
    }
    import graft.Tables.load
    // stage A: the distinct (c, p) relation alone (join + one exchange)
    time("cp_distinct") {
      load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
        .join(load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("c"),
          col("l_partkey").cast("long").as("p"))
        .repartition(col("p"))
        .dropDuplicates("c", "p")
        .write.format("noop").mode("overwrite").save()
    }
    // stage B: the sketched edge relation (A + TopKAgg + pair explode +
    // (u,v) rollup)
    time("sketch_edges") {
      graft.ext.Dedup.coPurchaseEdgesSketch(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // stage C: the full key (B + compact-forward triangles)
    time("full_key") {
      graft.SparkEntry.queries("graph_triangle_sketch")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
