package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: one-off 100x scale probe (sf0.1 x 100 ~ sf10: 60M lineitem
  * rows, 500k documents) — the "does the plan survive another 10x"
  * evidence beyond the bench's standing 10x probes. Same disjoint-key
  * replication scheme as Bench's sf10x builder, 64 range-clustered
  * files per fact. */
object Prof100x {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir = graft.matview.Materializer.defaultScratch + "/sf100x"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables._

    val build = !java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/lineitem.parquet"))
    if (build) {
      val copies = spark.range(100).select(col("id").as("cp"))
      def span(t: String, k: String): Long =
        load(spark, sfDir, t).agg(max(col(k).cast("long"))).head().getLong(0) + 1
      val okSpan = span("orders", "o_orderkey")
      val ckSpan = span("customer", "c_custkey")
      val dSpan = span("documents", "doc_id")
      def rep(t: String) = load(spark, sfDir, t).crossJoin(copies)
      def out(t: String) = s"$dir/$t.parquet"
      rep("lineitem")
        .withColumn("l_orderkey", col("l_orderkey") + col("cp") * okSpan)
        .drop("cp").repartitionByRange(64, col("l_orderkey"))
        .write.mode("overwrite").parquet(out("lineitem"))
      rep("orders")
        .withColumn("o_orderkey", col("o_orderkey") + col("cp") * okSpan)
        .withColumn("o_custkey", col("o_custkey") + col("cp") * ckSpan)
        .drop("cp").repartitionByRange(64, col("o_orderkey"))
        .write.mode("overwrite").parquet(out("orders"))
      rep("customer")
        .withColumn("c_custkey", col("c_custkey") + col("cp") * ckSpan)
        .drop("cp").repartitionByRange(64, col("c_custkey"))
        .write.mode("overwrite").parquet(out("customer"))
      rep("documents")
        .withColumn("doc_id", col("doc_id") + col("cp") * dSpan)
        .withColumn("text", when(col("cp") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1c"), col("cp")))))
        .drop("cp").repartitionByRange(64, col("doc_id"))
        .write.mode("overwrite").parquet(out("documents"))
      Seq("nation", "region", "supplier", "part").foreach { t =>
        load(spark, sfDir, t).write.mode("overwrite").parquet(out(t))
      }
    }

    def time(tag: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-24s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("q1_100x")(graft.queries.Relational.aggSumGroup3(spark, dir))
    time("5way_100x")(graft.queries.Relational.joinNatural5Way(spark, dir))
    time("window_100x")(graft.queries.Relational.windowCumulative(spark, dir))
    time("simhash_100x")(graft.ext.Dedup.dedupSimhash(spark, dir))
    time("minhash_100x")(graft.ext.Dedup.dedupMinhashLsh(spark, dir))
    time("jaccard_100x")(graft.ext.Dedup.dedupNgramJaccard(spark, dir))
    spark.stop()
  }
}
