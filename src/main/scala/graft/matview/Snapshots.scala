package graft.matview

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned table format over plain parquet — the commit-log
  * pattern of the open log-structured table designs (Delta Lake's
  * `_delta_log`, Iceberg's snapshot manifests; public formats),
  * re-expressed sandbox-safe with no external format dependency.
  *
  * Invariants:
  *  - data directories are IMMUTABLE once written; a commit never touches
  *    an existing one,
  *  - each version's manifest is the ordered list of data directories
  *    visible at that version, written LAST and moved into place
  *    atomically — a reader either sees a complete version or the
  *    previous one, never a torn commit,
  *  - old manifests are never modified, so every past version stays
  *    readable (time travel) and a reader pinned to version N is
  *    isolated from all later commits (snapshot isolation).
  *
  * Commit kinds: an APPEND reuses every previous directory (manifest N =
  * manifest N-1 + one new dir — no rewrite of history, the property that
  * makes log-structured tables cheap at 100 TB: committing a shard is
  * O(shard), not O(table)); an OVERWRITE starts the list fresh (compaction
  * / delete / rewrite), while the superseded dirs remain on disk for
  * readers of older versions until a retention pass drops them.
  */
class Snapshots(spark: SparkSession, root: String) {

  private def tdir(t: String) = s"$root/$t"
  private def logDir(t: String) = Paths.get(tdir(t), "_log")
  private def manifest(t: String, v: Int): Path =
    logDir(t).resolve(s"v$v.manifest")

  /** Latest committed version, or -1 for an absent table. Only fully
    * committed manifests count — a crashed writer's data dir without its
    * manifest is invisible, which is the format's atomicity story. */
  def latest(t: String): Int = {
    val dir = logDir(t)
    if (!Files.isDirectory(dir)) -1
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
          n.stripPrefix("v").stripSuffix(".manifest").toInt }
        .foldLeft(-1)(math.max)
      finally s.close()
    }
  }

  private def readManifest(t: String, v: Int): Seq[String] = {
    require(Files.exists(manifest(t, v)), s"$t has no version $v")
    new String(Files.readAllBytes(manifest(t, v)), StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)
  }

  private def commit(t: String, df: DataFrame, append: Boolean): Int = {
    val v = latest(t) + 1
    val dataDir = s"${tdir(t)}/d$v"
    df.write.mode("overwrite").parquet(dataDir)
    val dirs =
      (if (append && v > 0) readManifest(t, v - 1) else Nil) :+ dataDir
    Files.createDirectories(logDir(t))
    val tmp = logDir(t).resolve(s"v$v.manifest.tmp")
    Files.write(tmp, dirs.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifest(t, v), StandardCopyOption.ATOMIC_MOVE)
    v
  }

  def commitAppend(t: String, df: DataFrame): Int =
    commit(t, df, append = true)

  def commitOverwrite(t: String, df: DataFrame): Int =
    commit(t, df, append = false)

  /** Read the table AS OF `version`: a union scan of exactly the data
    * directories that version's manifest lists. */
  def read(t: String, version: Int): DataFrame =
    spark.read.parquet(readManifest(t, version): _*)

  def readLatest(t: String): DataFrame = read(t, latest(t))

  /** Read AS OF `version` with the schema UNION of that version's data
    * directories (parquet mergeSchema): a column added by a later append
    * reads as NULL from shards that predate it, and a version pinned
    * before the addition never sees the column at all — schema evolution
    * without rewriting history, the same contract as the open
    * log-structured formats. Footer-merge cost is per-dir, so prefer
    * [[read]] where the schema is known to be uniform. */
  def readEvolved(t: String, version: Int): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(readManifest(t, version): _*)

  /** Read only what version `v` ADDED over version `v-1` (v = 0 reads the
    * first commit whole) — the incremental-consumption face of the log:
    * a downstream pipeline processes each append exactly once by manifest
    * diff, never re-scanning the table. Only meaningful while commits are
    * appends; an overwrite's delta is the overwrite itself (its manifest
    * shares no dirs with its parent), which is also the correct contract:
    * a rewrite invalidates incremental state. */
  def readDelta(t: String, v: Int): DataFrame = {
    val prev = if (v == 0) Set.empty[String]
               else readManifest(t, v - 1).toSet
    spark.read.parquet(readManifest(t, v).filterNot(prev): _*)
  }

  /** Retention pass (the VACUUM of the log-structured formats): keep
    * versions >= `retainFrom` readable, physically delete every data
    * directory referenced ONLY by older manifests, and drop those
    * manifests. Returns (dirsRemoved, dirsLive). The deletion set is
    * computed from manifests alone — never by listing ages or mtimes —
    * so a directory shared between a retained and an expired version
    * (the append-reuse case) is always kept; at 100 TB this is what
    * makes retention an O(|manifests|) metadata operation whose only
    * I/O is deleting genuinely dead files. */
  def vacuum(t: String, retainFrom: Int): (Int, Int) = {
    val last = latest(t)
    require(retainFrom >= 0 && retainFrom <= last,
      s"retainFrom $retainFrom outside committed range [0, $last]")
    val live = (retainFrom to last).flatMap(readManifest(t, _)).toSet
    val s = Files.list(Paths.get(tdir(t)))
    val dataDirs =
      try s.iterator().asScala.toList
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("d"))
      finally s.close()
    val dead = dataDirs.filterNot(p => live.contains(p.toString))
    dead.foreach { p =>
      val w = Files.walk(p)
      try w.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally w.close()
    }
    (0 until retainFrom).foreach(v => Files.deleteIfExists(manifest(t, v)))
    (dead.size, live.size)
  }

  /** Drop the table entirely (every version). Exists so re-runnable keys
    * can start from version 0; a production retention pass would instead
    * drop only directories unreferenced by retained manifests
    * ([[vacuum]]). */
  def drop(t: String): Unit = {
    val dir = Paths.get(tdir(t))
    if (Files.exists(dir)) {
      val s = Files.walk(dir)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally s.close()
    }
  }
}
