package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.matview.Merge

/** The shared MERGE primitive behind the batch upsert key and the
  * streaming MV sink: the two resolutions must agree where their
  * semantics coincide, and folding incremental upserts through `replace`
  * must reproduce a from-scratch recompute (the streaming-refresh
  * contract). */
class MergeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("replace resolution equals the full-outer source-wins form") {
    val target = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val source = Seq((2L, 200.0), (4L, 400.0)).toDF("k", "v")
    val viaReplace = Merge.replace(target, source, Seq("k"))
      .orderBy("k").collect().toSeq
    val viaOuter = Merge.outer(target, source, "k")(
      projection = Seq(
        coalesce(col("u.k"), col("t.k")).as("k"),
        coalesce(col("u.v"), col("t.v")).as("v")))
      .orderBy("k").collect().toSeq
    assert(viaReplace == viaOuter)
    assert(viaReplace.map(r => (r.getLong(0), r.getDouble(1))) ==
      Seq((1L, 10.0), (2L, 200.0), (3L, 30.0), (4L, 400.0)))
  }

  test("incremental replace-merge fold equals from-scratch recompute") {
    // the streaming-refresh contract in miniature: four event chunks,
    // each micro-batch upserts its touched groups' full new state
    val events = (0 until 200).map(i => (i % 7L, i.toLong, 1L))
    val chunks = events.grouped(50).toSeq
    var mv = spark.emptyDataset[(Long, Long)].toDF("g", "n")
    var seen = Seq.empty[(Long, Long, Long)]
    for (c <- chunks) {
      seen = seen ++ c
      val touched = c.map(_._1).distinct
      val upserts = seen.toDF("g", "id", "one")
        .filter(col("g").isin(touched: _*))
        .groupBy("g").agg(count(lit(1)).as("n"))
      mv = Merge.replace(mv, upserts, Seq("g"))
    }
    val full = seen.toDF("g", "id", "one")
      .groupBy("g").agg(count(lit(1)).as("n"))
    assert(mv.orderBy("g").collect().toSeq ==
      full.orderBy("g").collect().toSeq)
  }

  test("replace supersedes NULL-keyed group state (null-safe keys) " +
      "instead of accumulating duplicates") {
    // a NULL grouping key is ONE group in SQL aggregation; an update-mode
    // sink re-emitting its state must supersede the prior row — the
    // null-unsafe form appended a copy every batch
    val target = Seq((Some(1L), 10L), (None, 5L)).toDF("k", "n")
    val source = Seq((Some(1L), 11L), (None, 7L)).toDF("k", "n")
    val out = Merge.replace(target, source, Seq("k"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(1))).sortBy(_._1)
    assert(out.toSeq == Seq((-1L, 7L), (1L, 11L)))
  }

  test("duplicate source keys raise a cardinality violation in both " +
      "resolutions, never silent duplicates") {
    val target = Seq((1L, 10.0)).toDF("k", "v")
    val dupSource = Seq((1L, 100.0), (1L, 101.0)).toDF("k", "v")
    val eR = intercept[Exception] {
      Merge.replace(target, dupSource, Seq("k")).collect()
    }
    assert(eR.getMessage != null &&
      eR.getMessage.contains("MERGE cardinality violation") ||
      eR.getCause != null &&
        eR.getCause.getMessage.contains("MERGE cardinality violation"))
    val eO = intercept[Exception] {
      Merge.outer(target, dupSource, "k")(
        projection = Seq(coalesce(col("u.k"), col("t.k")).as("k"),
          coalesce(col("u.v"), col("t.v")).as("v"))).collect()
    }
    assert(eO.toString.contains("MERGE cardinality violation") ||
      String.valueOf(eO.getCause).contains("MERGE cardinality violation"))
  }

  test("outer guard fires ONLY on matched duplicates: unmatched duplicate " +
      "source keys both insert, NULL-keyed source rows never raise") {
    // ANSI MERGE (and the lakehouse implementations) only error when a
    // TARGET row is matched by >1 source rows; duplicate source keys that
    // match nothing legally both INSERT, and a NULL source key can never
    // match under the === join — the pre-fix guard raised on all three
    val target = Seq((1L, 10.0)).toDF("k", "v")
    val source = Seq((Some(7L), 70.0), (Some(7L), 71.0),
      (None, 1.0), (None, 2.0)).toDF("k", "v")
    val out = Merge.outer(target, source, "k")(
      projection = Seq(coalesce(col("u.k"), col("t.k")).as("k"),
        coalesce(col("u.v"), col("t.v")).as("v")))
      .collect()
    assert(out.length == 5) // kept target row + all four inserts
    assert(out.map(_.getDouble(1)).sorted.toSeq ==
      Seq(1.0, 2.0, 10.0, 70.0, 71.0))
  }

  test("outer's guard column is internal: u.* projections never carry it, " +
      "and a source already holding the name is refused loudly") {
    // pre-fix, __merge_src_n survived the guard filter into the projection
    // namespace, so the documented col("u.*") contract silently leaked an
    // internal column — and withColumn would have clobbered a real source
    // column of that name, corrupting the guard
    val target = Seq((1L, 10.0)).toDF("k", "v")
    val source = Seq((1L, 100.0), (4L, 400.0)).toDF("k", "v")
    val out = Merge.outer(target, source, "k")(
      projection = Seq(col("u.*")))
    assert(out.columns.toSeq == Seq("k", "v"))
    val poisoned = source.withColumn("__merge_src_n", lit(99L))
    val e = intercept[IllegalArgumentException] {
      Merge.outer(target, poisoned, "k")(projection = Seq(col("u.*")))
    }
    assert(e.getMessage.contains("__merge_src_n"))
  }

  test("outer resolution supports WHEN MATCHED THEN DELETE") {
    val target = Seq((1L, 5.0), (2L, 20.0)).toDF("k", "v")
    val source = Seq((1L, 1.0), (3L, 3.0)).toDF("k", "v")
    val out = Merge.outer(target, source, "k")(
      projection = Seq(
        coalesce(col("t.k"), col("u.k")).as("k"),
        (coalesce(col("t.v"), lit(0.0)) + coalesce(col("u.v"), lit(0.0)))
          .as("v")),
      deleteWhen = col("v") < 10.0)
      .orderBy("k").collect().toSeq
    // (1, 6.0) deleted by the predicate; (2, 20.0) kept; (3, 3.0) deleted
    assert(out.map(r => (r.getLong(0), r.getDouble(1))) == Seq((2L, 20.0)))
  }
}
