package graft.tools

/** Dev-only: calibrate the memory-bandwidth canary (r17, VERDICT item 1)
  * standalone — the exact probe graft.Bench runs (Bench.bwCycle /
  * Bench.bwChase at the bench's 64M-slot / 16-thread / 2M-hop
  * geometry), sampled `rounds` times so the box's current
  * random-access-latency state reads directly against the
  * `canary.bw_sec` quiet expectation in bench-baselines.properties.
  * Pure JVM — no SparkSession, so it can run next to anything without
  * contending for more than memory bandwidth (which is the point).
  *
  *   sbt "Test/runMain graft.tools.ProfBw [rounds]"
  */
object ProfBw {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(5)
    val slots = 1 << 26
    val threads = 16
    val hops = 1 << 21
    val t0 = System.nanoTime()
    val cycle = graft.Bench.bwCycle(slots, 42L)
    println(f"cycle build: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      s"($slots slots, ${slots * 4 / (1 << 20)} MiB)")
    val sink = new java.util.concurrent.atomic.AtomicLong
    (1 to rounds).foreach { r =>
      val samples = (1 to 3).map { _ =>
        val s0 = System.nanoTime()
        val ts = (0 until threads).map { t =>
          val th = new Thread(() => sink.addAndGet(
            graft.Bench.bwChase(cycle, t * (slots / threads), hops)))
          th.setDaemon(true); th.start(); th
        }
        ts.foreach(_.join())
        (System.nanoTime() - s0) / 1e9
      }.sorted
      println(f"round $r: median ${samples(1)}%.3f s " +
        f"(min ${samples.head}%.3f, max ${samples.last}%.3f) — " +
        f"${hops.toDouble / samples(1) / 1e6}%.1f Mhops/s/thread")
    }
  }
}
