package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: the graph_pagerank DECADE (r15 VERDICT item 5) — at 38s
  * quiet sf10 it is the tier's largest absolute key, and until r16 it
  * had no recorded sf1<->sf10 shape analysis. This runs the FULL
  * 10-superstep key at each given scratch dir through the exact
  * production relations (Dedup.pagerankRelations / pagerankStep — not a
  * copy), timing the base-relation build and every superstep
  * separately, so any superstep whose cost grows faster than O(E)
  * across the decade is named by number instead of buried in one
  * wall-clock total.
  *
  *   sbt "Test/runMain graft.tools.ProfPrDecade [dir ...]"
  *   (defaults: target/scratch/sf1 target/scratch/sf10 — the dirs any
  *   bench run leaves behind)
  *
  * Session geometry matches graft.Bench (local[32], 32 shuffle
  * partitions, AQE + 8m advisory) so the numbers read against the
  * bench tier directly.
  */
object ProfPrDecade {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("target/scratch/sf1", "target/scratch/sf10")
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
    val SER = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    dirs.foreach { dir =>
      val tAll = System.nanoTime()
      var t0 = System.nanoTime()
      val (edges, nodes, deg, nNodes) =
        graft.ext.Dedup.pagerankRelations(
          graft.ext.Dedup.pagerankEdges0(spark, dir), SER)
      val nEdges = edges.count()
      println(f"[prdecade] $dir base build: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        s" (E=$nEdges directed, V=$nNodes)")
      var ranks = nodes.withColumn("rank", lit(1.0 / nNodes))
      var prev: Option[org.apache.spark.sql.DataFrame] = None
      val steps = (1 to 10).map { i =>
        t0 = System.nanoTime()
        val next = graft.ext.Dedup
          .pagerankStep(edges, nodes, deg, ranks, nNodes)
          .localCheckpoint(true, SER)
        prev.foreach(graft.ext.Dedup.unpersistCheckpoint)
        prev = Some(next)
        ranks = next
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[prdecade] $dir superstep $i%2d: $sec%6.2f s")
        sec
      }
      println(f"[prdecade] $dir supersteps min/median/max: " +
        f"${steps.min}%.2f/${steps.sorted.apply(steps.size / 2)}%.2f/" +
        f"${steps.max}%.2f s; total ${(System.nanoTime() - tAll) / 1e9}%.2f s")
      // release this decade's checkpoints before the next dir
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
