package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.matview.Snapshots
import graft.plans.SnapshotSkippingRule

class SnapshotSkippingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val root = "target/scratch-test/skiprule"
  SnapshotSkippingRule.ensureInstalled(spark)

  private def dirsScanned(df: org.apache.spark.sql.DataFrame): Int =
    SnapshotSkippingRule.scanRootDirs(df)

  test("range filters prune non-intersecting shards at plan time, with " +
      "exact strict/non-strict boundary handling") {
    val snap = new Snapshots(spark, root)
    val t = "rule_range"
    snap.drop(t)
    // three disjoint id ranges: [0,100), [100,200), [200,300)
    (0 until 3).foreach { j =>
      snap.commitAppendStats(t,
        (j * 100L until (j + 1) * 100L).map(i => (i, i * 2)).toDF("id", "v"),
        Seq("id"))
    }
    val base = snap.readLatest(t)
    val mid = base.filter(col("id") >= 120 && col("id") <= 150)
    assert(dirsScanned(mid) == 1)
    assert(mid.count() == 31)
    // strict vs non-strict against shard 0's max (99): > prunes, >= keeps
    assert(dirsScanned(base.filter(col("id") > 99)) == 2)
    assert(dirsScanned(base.filter(col("id") >= 99)) == 3)
    assert(base.filter(col("id") > 99).count() == 200)
    assert(base.filter(col("id") >= 99).count() == 201)
    // a conjunct the rule doesn't recognize rides along unharmed
    val mixed = base.filter(col("id") >= 200 && col("v") % 4 === 0)
    assert(dirsScanned(mixed) == 1)
    assert(mixed.count() == 50)
    // an unsatisfiable range collapses the whole scan to LocalRelation
    val none = base.filter(col("id") > 5000)
    assert(dirsScanned(none) == 0)
    assert(none.count() == 0)
    assert(none.columns.toSeq == Seq("id", "v"))
  }

  test("equality probes consult the bloom sidecar where zone ranges " +
      "interleave, and legacy/no-stats scans are untouched") {
    val snap = new Snapshots(spark, root)
    val t = "rule_bloom"
    snap.drop(t)
    // interleaved ranges (even ids split by id % 3): zone cannot prune a
    // mid-range equality, the bloom keeps exactly one shard
    val ids = (0L until 600L by 2)
    (0 until 3).foreach { j =>
      snap.commitAppendStats(t,
        ids.filter(_ % 3 == j).map(i => (i, s"v$i")).toDF("id", "payload"),
        Seq("id"), bloomCols = Seq("id"))
    }
    val base = snap.readLatest(t)
    val hit = base.filter(col("id") === 152)
    assert(dirsScanned(hit) == 1)
    assert(hit.count() == 1)
    // absent mid-range value: every bloom rejects
    assert(dirsScanned(base.filter(col("id") === 151)) == 0)
    // filter on a column with no stats line never prunes
    assert(dirsScanned(base.filter(col("payload") === "v152")) == 3)
    // a mixed table keeps its stats-less commit conservatively
    val t2 = "rule_legacy"
    snap.drop(t2)
    snap.commitAppendStats(t2,
      (0L until 50L).map(i => (i, i)).toDF("id", "v"), Seq("id"))
    snap.commitAppend(t2, (100L until 150L).map(i => (i, i)).toDF("id", "v"))
    val far = snap.readLatest(t2).filter(col("id") >= 500)
    assert(dirsScanned(far) == 1) // shard 0 pruned, legacy shard kept
    assert(far.count() == 0)
    // an ordinary parquet scan (no sidecars anywhere) is not rewritten
    val plainDir = "target/scratch-test/skiprule_plain"
    (0L until 10L).toDF("x").write.mode("overwrite").parquet(plainDir)
    val plain = spark.read.parquet(plainDir).filter(col("x") > 100)
    assert(dirsScanned(plain) == 1)
    assert(plain.count() == 0)
  }

  test("IN lists prune as point disjunctions and string prefixes prune " +
      "as half-open ranges") {
    val snap = new Snapshots(spark, root)
    val t = "rule_in_prefix"
    snap.drop(t)
    // three shards of disjoint names: a*, b*, c*
    Seq("a", "b", "c").foreach { p =>
      snap.commitAppendStats(t,
        (0 until 50).map(i => (f"$p$i%03d", i.toLong)).toDF("name", "v"),
        Seq("name"), bloomCols = Seq("name"))
    }
    val base = snap.readLatest(t)
    // IN across two shards: exactly those two survive
    val in2 = base.filter(col("name").isin("a007", "c042"))
    assert(dirsScanned(in2) == 2)
    assert(in2.count() == 2)
    // IN of absent values: blooms reject everything
    assert(dirsScanned(base.filter(col("name").isin("a999", "b999"))) == 0)
    // prefix probe: LIKE 'b%' keeps only the b shard
    val pb = base.filter(col("name").startsWith("b"))
    assert(dirsScanned(pb) == 1)
    assert(pb.count() == 50)
    // boundary: LIKE 'a%' must keep the a shard even though its min is
    // exactly the prefix's lower bound neighborhood
    assert(dirsScanned(base.filter(col("name").startsWith("a"))) == 1)
    // a prefix above every shard prunes all
    assert(dirsScanned(base.filter(col("name").startsWith("zzz"))) == 0)
  }
}
