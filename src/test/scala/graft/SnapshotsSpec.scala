package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.matview.Snapshots

/** Contracts of the commit-log table format behind `table_time_travel`:
  * version visibility, snapshot isolation of pinned readers, append
  * reuse of immutable data dirs, and the manifest-lands-last atomicity
  * story. */
class SnapshotsSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  private val root = "/root/repo/target/scratch/test_snaps"

  test("append/overwrite commits version correctly and time travel holds") {
    val snap = new Snapshots(spark, root)
    val t = "spec_tbl"
    snap.drop(t)
    assert(snap.latest(t) == -1)

    val docs = Tables.load(spark, SF, "documents")
      .select(col("doc_id"), col("lang"))
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)

    assert(snap.commitAppend(t, a) == 0)
    val v0Count = snap.read(t, 0).count()
    assert(v0Count == a.count())

    assert(snap.commitAppend(t, b) == 1)
    assert(snap.read(t, 1).count() == docs.count())
    // the append reused v0's data dir: two dirs listed, d0 among them
    assert(snap.read(t, 1).inputFiles.exists(_.contains("/d0/")))

    // overwrite = delete-as-rewrite; old versions stay readable
    assert(snap.commitOverwrite(t, snap.read(t, 1)
      .filter(col("lang") === "en")) == 2)
    val v2 = snap.read(t, 2)
    assert(v2.count() == docs.filter(col("lang") === "en").count())
    assert(!v2.inputFiles.exists(f =>
      f.contains("/d0/") || f.contains("/d1/")))

    // snapshot isolation: the pinned v0 read still sees exactly the
    // first append, after two later commits
    assert(snap.read(t, 0).count() == v0Count)
    assert(snap.latest(t) == 2)
    snap.drop(t)
  }

  test("readDelta partitions the table exactly across append versions") {
    val snap = new Snapshots(spark, root)
    val t = "spec_cdc"
    snap.drop(t)
    val docs = Tables.load(spark, SF, "documents").select("doc_id")
    (0 to 2).foreach(m =>
      snap.commitAppend(t, docs.filter(col("doc_id") % 3 === m)))
    val deltas = (0 to 2).map(v => snap.readDelta(t, v))
    // each delta is exactly its commit's slice, and together they
    // partition the final table
    deltas.zipWithIndex.foreach { case (df, m) =>
      assert(df.count() == docs.filter(col("doc_id") % 3 === m).count())
    }
    assert(deltas.map(_.count()).sum == snap.readLatest(t).count())
    // a delta never re-reads an earlier commit's files
    assert(!snap.readDelta(t, 2).inputFiles.exists(f =>
      f.contains("/d0/") || f.contains("/d1/")))
    snap.drop(t)
  }

  test("schema evolution: new column reads NULL on old shards, absent on old versions") {
    val snap = new Snapshots(spark, root)
    val t = "spec_evo"
    snap.drop(t)
    val docs = Tables.load(spark, SF, "documents")
    snap.commitAppend(t, docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id")))
    snap.commitAppend(t, docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang")))
    // pre-evolution version: the column does not exist at all
    assert(!snap.readEvolved(t, 0).columns.contains("lang"))
    // post-evolution merged read: old shard surfaces NULL for it
    val v1 = snap.readEvolved(t, 1)
    assert(v1.columns.contains("lang"))
    assert(v1.filter(col("lang").isNull).count() ==
      docs.filter(col("doc_id") % 2 === 0).count())
    assert(v1.count() == docs.count())
    snap.drop(t)
  }

  test("a data dir without its manifest is invisible (atomicity)") {
    val snap = new Snapshots(spark, root)
    val t = "spec_torn"
    snap.drop(t)
    snap.commitAppend(t, Tables.load(spark, SF, "region"))
    // simulate a writer that crashed after the data write, before the
    // manifest move: the orphan dir must not change the visible table
    Files.createDirectories(Paths.get(s"$root/$t/d99"))
    assert(snap.latest(t) == 0)
    assert(snap.readLatest(t).count() ==
      Tables.load(spark, SF, "region").count())
    snap.drop(t)
  }

  test("vacuum: shared dirs survive, expired versions die, retained bytes intact") {
    val snap = new Snapshots(spark, root)
    val t = "spec_vacuum"
    snap.drop(t)
    val docs = Tables.load(spark, SF, "documents").select(col("doc_id"))
    snap.commitAppend(t, docs.filter(col("doc_id") % 3 === 0))
    snap.commitAppend(t, docs.filter(col("doc_id") % 3 === 1))
    snap.commitOverwrite(t, snap.read(t, 1).filter(col("doc_id") % 2 === 0))
    val before = snap.read(t, 2).collect().map(_.getLong(0)).sorted.toSeq
    // retain from v1: v1's manifest still references d0 (append reuse),
    // so NOTHING is deletable even though v0's manifest goes away
    val (r1, l1) = snap.vacuum(t, 1)
    assert(r1 == 0, s"shared data dir deleted by vacuum: removed $r1")
    assert(snap.read(t, 1).inputFiles.exists(_.contains("/d0/")))
    // retain only the overwrite: d0/d1 now dead, d2 live
    val (r2, l2) = snap.vacuum(t, 2)
    assert(r2 == 2 && l2 == 1, s"expected (2 dead, 1 live), got ($r2, $l2)")
    assert(snap.read(t, 2).collect().map(_.getLong(0)).sorted.toSeq == before)
    intercept[Exception] { snap.read(t, 0).count() }
    intercept[Exception] { snap.read(t, 1).count() }
  }
}
