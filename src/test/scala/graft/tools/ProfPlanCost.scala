package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev-only: SnapshotSkippingRule planning-cost curve vs commit count
  * (r11 VERDICT item 8). The rule reads O(|dirs|) sidecar files per
  * optimize — fine while compaction bounds |dirs|, but the curve itself
  * was never measured. This probe FABRICATES an N-commit table (one real
  * parquet dir, hard-copied N times with hand-written `_zstats`
  * sidecars carrying disjoint [lo, hi) id ranges — planning cost only
  * touches manifests + sidecars, so the fabrication is faithful to the
  * measured path) and times:
  *
  *   - optimizer planning of a `.filter(...)` that keeps ~1% of dirs
  *     (rule fires, reads every sidecar, rebuilds a small file index),
  *   - the explicit `readPruned` API on the same probe,
  *   - baseline `optimizedPlan` with the rule scoped OUT (the listing +
  *     optimizer cost the rule adds to).
  *
  *   sbt "Test/runMain graft.tools.ProfPlanCost [dirCounts...]"
  */
object ProfPlanCost {
  def main(args: Array[String]): Unit = {
    val counts = if (args.nonEmpty) args.map(_.toInt).toSeq
                 else Seq(100, 1000, 10000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.plans.SnapshotSkippingRule.ensureInstalled(spark)

    val root = graft.matview.Materializer.defaultScratch + "/plancost"
    val snap = new graft.matview.Snapshots(spark, root)

    counts.foreach { n =>
      val t = s"pc_$n"
      snap.drop(t)
      // one REAL commit (rows 0..99) gives the template parquet dir +
      // an authentic v2 sidecar shape to mirror
      val v0 = snap.commitAppendStats(t,
        (0L until 100L).map(i => (i, i * 2)).toDF("id", "v"), Seq("id"))
      val d0 = snap.versionDirs(t, v0).head
      val toCopy = {
        val s = Files.list(Paths.get(d0))
        try {
          val buf = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
          s.iterator().forEachRemaining(p =>
            if (!Files.isDirectory(p)) buf += p)
          buf
        } finally s.close()
      }
      // fabricate dirs 1..n-1 with disjoint id ranges [100i, 100i+100)
      val dirs = (1 until n).map { i =>
        val dir = Paths.get(s"$root/$t/f$i")
        Files.createDirectories(dir)
        toCopy.foreach { p =>
          val tgt = dir.resolve(p.getFileName)
          if (!Files.exists(tgt))
            Files.copy(p, tgt, StandardCopyOption.COPY_ATTRIBUTES)
        }
        Files.writeString(dir.resolve("_zstats"),
          s"#zstats-v2\nid\tlong\t0\t100\t${100L * i}\t${100L * i + 99}")
        dir.toString
      }
      // publish one manifest listing all n dirs (the post-ingest,
      // pre-compaction worst case)
      val manifest = Paths.get(s"$root/$t/_log/v1.manifest")
      Files.writeString(manifest, (d0 +: dirs).mkString("\n"))

      def timeMs(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      // probe keeps exactly 1 dir (mid-table point range)
      val (lo, hi) = (100L * (n / 2), 100L * (n / 2) + 50)
      def planWithRule(): Unit = {
        val df = snap.readLatest(t).filter(col("id") >= lo && col("id") < hi)
        df.queryExecution.optimizedPlan // force the optimizer (rule fires)
      }
      def planWithoutRule(): Unit =
        graft.plans.SnapshotSkippingRule.withoutRule(spark) {
          val df = snap.readLatest(t).filter(col("id") >= lo && col("id") < hi)
          df.queryExecution.optimizedPlan
        }
      def apiPruned(): Unit = {
        val pr = snap.readPruned(t, 1, "id", lo.toString, (hi - 1).toString)
        require(pr.dirsRead == 1 && pr.dirsTotal == n,
          s"expected 1/$n dirs, got ${pr.dirsRead}/${pr.dirsTotal}")
      }
      // 3 reps each, best-of (warm JVM after the first): planning is
      // driver-side CPU + metadata I/O, best is the steady state
      def best(f: () => Unit): Double = (1 to 3).map(_ => timeMs(f())).min
      val rule = best(planWithRule _)
      val base = best(planWithoutRule _)
      val api = best(apiPruned _)
      println(f"[plancost] dirs=$n%6d ruleplan=${rule}%9.1fms " +
        f"baseplan=${base}%9.1fms readPruned=${api}%9.1fms " +
        f"rule_per_dir=${(rule - base) / n * 1000}%7.1fus")
      snap.drop(t)
    }
    spark.stop()
  }
}
