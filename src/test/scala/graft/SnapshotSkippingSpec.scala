package graft

import org.apache.spark.sql.functions.{col, lit}
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

  test("OR disjunctions prune per branch, and null-safe equality prunes " +
      "like = (or like IS NULL against a null literal)") {
    val snap = new Snapshots(spark, root)
    val t = "rule_or"
    snap.drop(t)
    (0 until 3).foreach { j =>
      snap.commitAppendStats(t,
        (j * 100L until (j + 1) * 100L).map(i => (i, i * 2)).toDF("id", "v"),
        Seq("id"))
    }
    val base = snap.readLatest(t)
    // anti-range: both outer shards survive, the middle one is pruned —
    // the shape a conjunct-only walk cannot prune at all
    val outer = base.filter(col("id") < 50L || col("id") > 250L)
    assert(dirsScanned(outer) == 2)
    assert(outer.count() == 50 + 49)
    // a disjunct the rule can't evaluate keeps everything (conservative)
    assert(dirsScanned(base.filter(
      col("id") < 50L || col("v") % 7 === 0)) == 3)
    // OR of two point probes: exactly the two containing shards
    val two = base.filter(col("id") === 10L || col("id") === 210L)
    assert(dirsScanned(two) == 2)
    assert(two.count() == 2)
    // nested: (in shard 0 AND even) OR (in shard 2) — shard 1 pruned
    assert(dirsScanned(base.filter(
      (col("id") < 50L && col("v") % 2 === 0) || col("id") >= 250L)) == 2)
    // null-safe equality prunes like = against a non-null literal
    val nse = base.filter(col("id") <=> 150L)
    assert(dirsScanned(nse) == 1)
    assert(nse.count() == 1)
    // ... and like IS NULL against a null literal: id is never null, so
    // every shard is provably unable to match (v2 null counts)
    assert(dirsScanned(base.filter(
      col("id") <=> lit(null.asInstanceOf[java.lang.Long]))) == 0)
  }

  test("decimal zone stats prune exactly — BigDecimal bounds, " +
      "scale-insensitive, no double rounding anywhere") {
    val snap = new Snapshots(spark, root)
    val t = "rule_decimal"
    snap.drop(t)
    def bd(s: String) = new java.math.BigDecimal(s)
    // three disjoint price bands, decimal(12,2)
    (0 until 3).foreach { j =>
      snap.commitAppendStats(t,
        (0 until 50).map(i => (j * 50L + i, bd(s"${j * 1000 + i}.25")))
          .toDF("id", "price")
          .select(col("id"), col("price").cast("decimal(12,2)").as("price")),
        Seq("price"))
    }
    val base = snap.readLatest(t)
    val mid = base.filter(col("price") >= lit(bd("1000.25")) &&
      col("price") <= lit(bd("1049.25")))
    assert(dirsScanned(mid) == 1)
    assert(mid.count() == 50)
    // boundary exactness against shard 0's max (49.25): > prunes, >= keeps
    assert(dirsScanned(base.filter(col("price") > lit(bd("49.25")))) == 2)
    assert(dirsScanned(base.filter(col("price") >= lit(bd("49.25")))) == 3)
    val eq = base.filter(col("price") === lit(bd("2000.25")))
    assert(dirsScanned(eq) == 1)
    assert(eq.count() == 1)
    // explicit API, and scale-insensitive probe strings (2000.2500)
    val pr = snap.readPruned(t, snap.latest(t), "price",
      "2000.2500", "2049.25")
    assert(pr.dirsRead == 1 && pr.dirsTotal == 3)
    assert(pr.df.count() == 50)
  }

  test("a != v prunes provably-constant shards (and all-null ones), " +
      "never range shards") {
    val snap = new Snapshots(spark, root)
    val t = "rule_neq"
    snap.drop(t)
    // shard 0: status constant "F"; shard 1: constant "O"; shard 2: mixed
    snap.commitAppendStats(t,
      (0 until 40).map(i => (i.toLong, "F")).toDF("id", "status"),
      Seq("status"))
    snap.commitAppendStats(t,
      (100 until 140).map(i => (i.toLong, "O")).toDF("id", "status"),
      Seq("status"))
    snap.commitAppendStats(t,
      (200 until 240).map(i =>
        (i.toLong, if (i % 2 == 0) "F" else "P")).toDF("id", "status"),
      Seq("status"))
    val base = snap.readLatest(t)
    val notF = base.filter(col("status") =!= "F")
    assert(dirsScanned(notF) == 2) // the all-"F" shard is pruned
    assert(notF.count() == 40 + 20)
    // a mixed shard whose span merely CONTAINS v is kept
    val notP = base.filter(col("status") =!= "P")
    assert(dirsScanned(notP) == 3)
    assert(notP.count() == 40 + 40 + 20)
    // != against a value no shard is constant-on keeps everything
    assert(dirsScanned(base.filter(col("status") =!= "Z")) == 3)
  }

  test("null counts prune IS NULL / IS NOT NULL, and an all-null shard " +
      "prunes every comparison conjunct") {
    val snap = new Snapshots(spark, root)
    val t = "rule_nulls"
    snap.drop(t)
    // shard 0: v never null; shard 1: v mixed; shard 2: v all-null
    snap.commitAppendStats(t,
      (0L until 50L).map(i => (i, Some(i))).toDF("id", "v"), Seq("id", "v"))
    snap.commitAppendStats(t,
      (100L until 150L).map(i =>
        (i, if (i % 2 == 0) Some(i) else None)).toDF("id", "v"),
      Seq("id", "v"))
    snap.commitAppendStats(t,
      (200L until 250L).map(i => (i, None: Option[Long])).toDF("id", "v"),
      Seq("id", "v"))
    val base = snap.readLatest(t)
    // IS NULL: the no-null shard is pruned
    val isNull = base.filter(col("v").isNull)
    assert(dirsScanned(isNull) == 2)
    assert(isNull.count() == 25 + 50)
    // IS NOT NULL: the all-null shard is pruned
    val notNull = base.filter(col("v").isNotNull)
    assert(dirsScanned(notNull) == 2)
    assert(notNull.count() == 50 + 25)
    // equality/range on v: the all-null shard can never satisfy them
    // (the optimizer's implicit IsNotNull prunes it too — both paths
    // must agree)
    val eq = base.filter(col("v") === 102L)
    assert(dirsScanned(eq) == 1)
    assert(eq.count() == 1)
    val rng = base.filter(col("v") >= 0L)
    assert(dirsScanned(rng) == 2)
    assert(rng.count() == 75)
  }

  test("string zone bounds compare in code-point (UTF-8 byte) order, " +
      "matching the writer's UTF8String min/max above the BMP") {
    val snap = new Snapshots(spark, root)
    val t = "rule_astral"
    snap.drop(t)
    val astral = new String(Character.toChars(0x10000)) // 𐀀
    snap.commitAppendStats(t,
      Seq(("�", 1L), (astral, 2L)).toDF("name", "v"), Seq("name"))
    val base = snap.readLatest(t)
    // UTF-16 code-unit order would read max = U+FFFD < U+10000's
    // surrogate start and wrongly prune both probes; code-point order
    // (the writer's) keeps the dir.
    val eq = base.filter(col("name") === "�")
    assert(dirsScanned(eq) == 1)
    assert(eq.count() == 1)
    val pre = base.filter(col("name").startsWith("�"))
    assert(dirsScanned(pre) == 1)
    assert(pre.count() == 1)
    // and the astral value itself stays probe-able
    assert(base.filter(col("name") === astral).count() == 1)
  }

  test("double zone stats normalize -0.0 to 0.0 on both sides and keep " +
      "NaN bounds conservative") {
    val snap = new Snapshots(spark, root)
    val t = "rule_negzero"
    snap.drop(t)
    snap.commitAppendStats(t,
      Seq((1L, 0.0d), (2L, 1.5d)).toDF("id", "v"),
      Seq("v"), bloomCols = Seq("v"))
    val base = snap.readLatest(t)
    // SQL equality treats -0.0 = 0.0: the probe must keep the dir
    // through BOTH the zone check and the bloom
    val negZero = base.filter(col("v") === -0.0d)
    assert(dirsScanned(negZero) == 1)
    assert(negZero.count() == 1)
    // and the stored bound never serializes as "-0.0"
    val z = Snapshots.dirStats(snap.versionDirs(t, snap.latest(t)).head)("v")
    assert(z.mn == "0.0" && !z.mn.startsWith("-"))
    // NaN sorts largest in Spark's ordering — for the stored max AND for
    // the comparison operator itself (SQL NaN > any value), so the kept
    // dir really does hold a matching row: bound and operator agree
    val t2 = "rule_nan"
    snap.drop(t2)
    snap.commitAppendStats(t2,
      Seq((1L, 1.0d), (2L, Double.NaN)).toDF("id", "v"), Seq("v"))
    val b2 = snap.readLatest(t2)
    assert(dirsScanned(b2.filter(col("v") > 5.0d)) == 1)
    assert(b2.filter(col("v") > 5.0d).count() == 1) // the NaN row itself
    assert(b2.filter(col("v") === 1.0d).count() == 1)
  }

  test("legacy v1 sidecars (bounds only, no counts) still prune ranges " +
      "but never IS [NOT] NULL") {
    val snap = new Snapshots(spark, root)
    val t = "rule_v1"
    snap.drop(t)
    snap.commitAppend(t,
      (0L until 50L).map(i => (i, Some(i))).toDF("id", "v"))
    // hand-write the pre-v2 sidecar format into the committed dir
    val dir = snap.versionDirs(t, snap.latest(t)).head
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_zstats"), "id\tlong\t0\t49")
    val z = Snapshots.dirStats(dir)("id")
    assert(z.nulls == -1L && z.rows == -1L && z.mn == "0" && z.mx == "49")
    val base = snap.readLatest(t)
    assert(dirsScanned(base.filter(col("id") > 100L)) == 0) // bounds prune
    assert(dirsScanned(base.filter(col("id").isNull)) == 1) // counts unknown
    assert(dirsScanned(base.filter(col("id").isNotNull)) == 1)
  }
}
