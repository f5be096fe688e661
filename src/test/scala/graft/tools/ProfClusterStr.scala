package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: scale probe for STRING-typed CLUSTER BY compaction (the r13
  * path: exact per-value-rollup quantile boundaries through the shared
  * two-phase Ranks scan, then shards in UTF8 binary order). The stress
  * shape is a HIGH-CARDINALITY string cluster column — every row its own
  * distinct value — so the boundary rollup is corpus-sized (the case a
  * naive global window would funnel through one task).
  *
  * Builds a Snapshots table from the tier's orders keyed by the
  * zero-padded order key string, times compactClustered(col, 16 shards),
  * and verifies the clustered layout: a key-range probe must prune to
  * the intersecting shards (zone stats on the string column are
  * disjoint after clustering).
  *
  * Usage: Test/runMain graft.tools.ProfClusterStr [sfDir]
  */
object ProfClusterStr {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/scratch/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val snap = new graft.matview.Snapshots(spark, "target/scratch/clstr")
    val t = f"ord_clstr_${sfDir.hashCode & 0x7fffffff}%08x"
    snap.drop(t)
    val src = graft.Tables.load(spark, sfDir, "orders")
      .select(lpad(col("o_orderkey").cast("string"), 12, "0").as("okey_s"),
        col("o_custkey"), col("o_totalprice"))
    val n = src.count()
    System.err.println(s"[profclstr] rows=$n dir=$sfDir")

    // ingest as 4 arrival-ordered commits (each spans the whole key
    // domain, so pre-clustering zone stats prune NOTHING — the layout
    // problem compaction exists to fix)
    val t0 = System.nanoTime()
    (0 until 4).foreach { j =>
      snap.commitAppendStats(t,
        src.filter(pmod(col("o_custkey"), lit(4)) === j), Seq("okey_s"))
    }
    val ingestSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val shards = snap.compactClustered(t, "okey_s", 16, Seq("okey_s"))
    val compactSec = (System.nanoTime() - t1) / 1e9

    // prune check: a 1/16th key-range probe over the clustered layout
    val lo = f"${(n / 2)}%012d"
    val hi = f"${(n / 2 + n / 16)}%012d"
    val t2 = System.nanoTime()
    val cnt = snap.readLatest(t)
      .filter(col("okey_s") >= lo && col("okey_s") < hi).count()
    val probeSec = (System.nanoTime() - t2) / 1e9
    println(f"PROFCLSTR rows=$n ingest=$ingestSec%.1f compact=$compactSec%.1f" +
      f" shardsVer=$shards probe=$probeSec%.2f probeRows=$cnt" +
      f" perRowUs=${compactSec * 1e6 / n}%.3f")
    spark.stop()
  }
}
