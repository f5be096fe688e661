package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spill-path correctness: at 100 TB every sort/aggregate/window spills;
  * locally the spill code paths are forced by dropping the in-memory
  * thresholds to a handful of rows and asserting results identical to the
  * default run. This pins that the engine's answers don't depend on
  * everything fitting in memory. */
class SpillSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("window operator spills: forced tiny buffer, identical result") {
    val expected = rows(queries.Relational.windowCumulative(spark, SF))
    withConfs(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "4",
      "spark.sql.windowExec.buffer.spill.threshold" -> "8") {
      val spilled = rows(queries.Relational.windowCumulative(spark, SF))
      assert(spilled == expected)
    }
  }

  test("object-hash aggregate falls back to sort-based: identical result") {
    // minhash's TypedImperativeAggregate runs through ObjectHashAggregate;
    // fallbackThreshold=2 forces the sort-based path after 2 groups
    val expected = rows(ext.Dedup.dedupMinhashLsh(spark, SF))
    withConfs(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "2") {
      val spilled = rows(ext.Dedup.dedupMinhashLsh(spark, SF))
      assert(spilled == expected)
    }
  }

  test("sort-merge join path (broadcast disabled): identical result") {
    val expected = rows(queries.Relational.joinNatural5Way(spark, SF))
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val smj = rows(queries.Relational.joinNatural5Way(spark, SF))
      assert(smj == expected)
    }
  }

  test("containment's fat-array aggregate under forced spill: identical result") {
    // the per-doc sorted shingle sets are the widest aggregation buffers
    // in the repo; force the ObjectAggregationIterator fallback and the
    // join out of broadcast so the inverted-index join sort-merges
    val expected = rows(ext.Dedup.dedupContainment(spark, SF))
    withConfs(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val spilled = rows(ext.Dedup.dedupContainment(spark, SF))
      assert(spilled == expected)
    }
  }
}
