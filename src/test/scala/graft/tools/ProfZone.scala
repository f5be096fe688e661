package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: quantify manifest-level data skipping. Builds a 16-shard
  * time-ordered Snapshots table from the tier's events (the telemetry
  * append shape), then times a 2-shard time-range aggregate three ways:
  * the unpruned scan, the explicit readPruned API, and the plain-filter
  * path with [[graft.plans.SnapshotSkippingRule]] doing the pruning at
  * plan time. The deltas are the feature's value at this tier; at 100 TB
  * the unpruned column is the one that stops being runnable.
  *
  * Usage: Test/runMain graft.tools.ProfZone [sfDir] [reps]
  */
object ProfZone {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/scratch/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val snap = new graft.matview.Snapshots(spark, "target/scratch/zprof")
    // per-tier table: the reuse check below must never hand one tier's
    // shards to another tier's probe
    val t = f"events_zprof_${sfDir.hashCode & 0x7fffffff}%08x"
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("ts"), col("event_type"), col("value"))

    val SHARDS = 16
    // one full-corpus min/max pass, shared by the build and probe phases
    val (mn, mx) = {
      val r = ev.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).collect().head
      (r.getLong(0), r.getLong(1) + 1)
    }
    val step = (mx - mn + SHARDS - 1) / SHARDS
    if (snap.latest(t) < SHARDS - 1) {
      snap.drop(t)
      (0 until SHARDS).foreach { j =>
        val (lo, hi) = (mn + j * step, mn + (j + 1) * step)
        snap.commitAppendStats(t,
          ev.filter(unix_micros(col("ts")) >= lo &&
            unix_micros(col("ts")) < hi), Seq("ts"))
        System.err.println(s"[profzone] committed shard $j")
      }
    }
    val v = snap.latest(t)
    // probe range: shards 6..7 (an eighth of the span)
    val (qlo, qhi) = (mn + 6 * step, mn + 8 * step)
    // bare-attribute conjuncts (ts >= <timestamp literal>) so the
    // optimizer rule's matcher sees them after constant folding; decimal
    // sum so the cross-path equality check is exact, not float-order
    def inRange(df: DataFrame) = df.filter(
      col("ts") >= timestamp_micros(lit(qlo)) &&
      col("ts") < timestamp_micros(lit(qhi)))
    def agg(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(col("value").cast("decimal(18,2)"))).collect().head
      (r.getLong(0), r.getDecimal(1))
    }
    def time(label: String,
        mk: () => DataFrame): (Long, java.math.BigDecimal) = {
      var res: (Long, java.math.BigDecimal) = null
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        res = agg(mk())
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[profzone] $label%-10s best=${times.min}%.3f " +
        s"all=${times.map(x => f"$x%.3f").mkString(",")} rows=${res._1}")
      res
    }

    val full = time("full", () => inRange(snap.read(t, v)))
    val api = time("readPruned", () => {
      val pr = snap.readPruned(t, v, "ts", qlo.toString, (qhi - 1).toString)
      System.err.println(
        s"[profzone] readPruned dirs ${pr.dirsRead}/${pr.dirsTotal}")
      inRange(pr.df)
    })
    graft.plans.SnapshotSkippingRule.ensureInstalled(spark)
    val rule = time("rule", () => {
      val df = inRange(snap.read(t, v))
      System.err.println("[profzone] rule dirs " +
        graft.plans.SnapshotSkippingRule.scanRootDirs(df) + s"/$SHARDS")
      df
    })
    require(full == api && api == rule,
      s"pruned results diverge: full=$full api=$api rule=$rule")
    System.err.println("[profzone] results identical across all paths")
    spark.stop()
  }
}
