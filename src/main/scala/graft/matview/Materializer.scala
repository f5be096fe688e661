package graft.matview

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}

/** Materialized-view lifecycle: persist a query result under a name, track
  * the dependency DAG, and tear down in dependents-first order — the
  * engine-side equivalent of the reference's CREATE/DROP MATERIALIZED VIEW
  * ... CASCADE chain of 15 MVs (assignment-5.sql:70–80, 17–27; SURVEY §7.8).
  *
  * Persistence is parquet at a scratch location (`saveAsTable` semantics
  * without requiring a warehouse-backed catalog): downstream reads plan a
  * plain FileSourceScan — the MV is *not* re-expanded, matching PG
  * (assignment-5.md:552). Refresh = recompute + overwrite. At scale the
  * same object works over any shared filesystem; writes are
  * mode("overwrite") so a refresh is atomic per directory.
  */
final class Materializer(spark: SparkSession, scratchDir: String) {

  /** name -> direct dependencies (upstream MV names). Insertion-ordered so
    * rebuilds replay in creation order. */
  private val deps = mutable.LinkedHashMap.empty[String, Seq[String]]

  private var rewrite: Option[MvRewrite] = None

  /** Turn on automatic MV substitution (SURVEY §4 stretch goal): queries on
    * this session that recompute a registered MV's exact relation are
    * rewritten to scan the persisted MV instead. */
  def enableAutoRewrite(): this.type = {
    rewrite = Some(MvRewrite.forSession(spark))
    this
  }

  private def path(name: String): String = s"$scratchDir/$name"

  /** CREATE MATERIALIZED VIEW name AS df (S5). Returns the persisted
    * relation (a fresh scan, not the in-memory plan). */
  def create(name: String, df: DataFrame, dependsOn: Seq[String] = Nil): DataFrame = {
    require(dependsOn.forall(deps.contains), s"unknown dependency in $dependsOn")
    df.write.mode("overwrite").parquet(path(name))
    deps(name) = dependsOn
    rewrite.foreach(_.register(name, df, () => table(name)))
    table(name)
  }

  // ---- incremental refresh ----------------------------------------------

  /** (keys, measures) of MVs created via [[createAggregated]]. */
  private val aggSpecs =
    mutable.Map.empty[String, (Seq[String], Seq[Materializer.Measure])]

  /** CREATE MATERIALIZED VIEW name AS base GROUP BY keys with declared
    * re-aggregable measures — the declaration is what makes
    * [[refreshIncremental]] possible (sum/count merge by re-summing,
    * min/max by re-min/maxing; the same algebra MvRewrite's containment
    * path exploits). */
  def createAggregated(name: String, base: DataFrame, keys: Seq[String],
      measures: Seq[Materializer.Measure]): DataFrame = {
    val aggCols = measures.map(m => m.initial.as(m.alias))
    aggSpecs(name) = (keys, measures)
    create(name, base.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*))
  }

  /** (dim, join columns) of MVs created via [[createJoinAggregated]]. */
  private val joinSpecs = mutable.Map.empty[String, (DataFrame, Seq[String])]

  /** CREATE MATERIALIZED VIEW name AS fact JOIN dim GROUP BY keys — the
    * join-aggregate MV shape (star-schema rollups). The dim relation and
    * join columns are remembered so [[refreshJoinDelta]] can maintain the
    * MV from a FACT delta alone: delta ⋈ dim is |delta| rows joined
    * against a dimension, never a fact re-scan. Requires the dim static
    * between refreshes (the star-schema contract; a changed dim needs a
    * full refresh). */
  def createJoinAggregated(name: String, fact: DataFrame, dim: DataFrame,
      on: Seq[String], keys: Seq[String],
      measures: Seq[Materializer.Measure]): DataFrame = {
    joinSpecs(name) = (dim, on)
    createAggregated(name, fact.join(dim, on), keys, measures)
  }

  /** REFRESH from a fact-only delta: join the delta against the remembered
    * dimension, then merge like [[refreshIncremental]]. */
  def refreshJoinDelta(name: String, deltaFact: DataFrame): DataFrame = {
    require(joinSpecs.contains(name),
      s"$name was not created via createJoinAggregated")
    val (dim, on) = joinSpecs(name)
    refreshIncremental(name, deltaFact.join(dim, on))
  }

  /** REFRESH ... WITH DELTA: aggregate only the delta rows, merge into the
    * stored groups by the measures' merge functions, atomically swap the
    * storage. At 100 TB this touches |delta groups| + |stored MV| rows —
    * never the full base fact. Merged measures are cast back to the stored
    * column types (a re-summed decimal widens; the merged total provably
    * fits the stored type). */
  def refreshIncremental(name: String, deltaBase: DataFrame): DataFrame = {
    require(aggSpecs.contains(name), s"$name was not created via createAggregated")
    // the stored relation is about to diverge from the defining plan the
    // rewrite registry holds (storage will cover base+delta while the
    // registered plan describes base only) — deregister, or a later query
    // matching the stale defining plan would be rewritten to merged data
    rewrite.foreach(_.deregister(name))
    val (keys, measures) = aggSpecs(name)
    val stored = table(name)
    val storedTypes = stored.schema.fields.map(f => f.name -> f.dataType).toMap
    val aggCols = measures.map(m => m.initial.as(m.alias))
    val delta = deltaBase.groupBy(keys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val mergeCols = measures.map(m =>
      m.merge(col(m.alias)).cast(storedTypes(m.alias)).as(m.alias))
    val merged = stored.unionByName(delta)
      .groupBy(keys.map(col): _*).agg(mergeCols.head, mergeCols.tail: _*)
    // the merged plan READS the current storage — stage to a tmp dir, then
    // swap old-aside-first: a crash can orphan a directory but never lose
    // the MV (old data survives until the stage has fully moved in)
    val tmp = java.nio.file.Paths.get(path(name) + "__stage")
    val old = java.nio.file.Paths.get(path(name) + "__old")
    val p = java.nio.file.Paths.get(path(name))
    Materializer.deleteRecursively(old) // leftovers from a prior crash
    try {
      merged.write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.move(p, old)
      java.nio.file.Files.move(tmp, p)
      Materializer.deleteRecursively(old)
    } finally Materializer.deleteRecursively(tmp)
    table(name)
  }

  /** (Re-)assert `name`'s defining query for auto-rewrite against its
    * CURRENT storage. PostgreSQL's model: an MV's defining query never
    * changes — REFRESH only brings storage up to date with it. Our
    * incremental refresh path deregisters the MV mid-flight (storage
    * diverges from the registered plan while the merge is staged, see
    * [[refreshIncremental]]); once the refresh has landed, the caller —
    * who knows what base window the MV now covers — re-asserts the full
    * defining query here, and the rewriter resumes answering matching
    * subtrees from the refreshed storage. The assertion is checked by the
    * correctness gate, not trusted: the MV keys' oracles recompute the
    * defining query from base tables, so a redefine that misdescribes
    * storage hash-fails. */
  def redefine(name: String, defining: DataFrame): Unit = {
    require(deps.contains(name), s"no such materialized view: $name")
    rewrite.foreach(_.register(name, defining, () => table(name)))
  }

  /** Drop every rewrite-registry entry this materializer created — scopes
    * MV substitution to the query that registered the MVs, so a rewrite-
    * enabled query can't silently re-plan later unrelated queries in the
    * same session. */
  def deregisterAll(): Unit =
    rewrite.foreach(r => deps.keys.foreach(r.deregister))

  /** Bucketed materialization into the session catalog: co-locates future
    * joins/aggregations on the bucket columns — two tables bucketed the same
    * way join with NO exchange (pinned by BucketedJoinSpec). This is the
    * 100 TB answer to repeated fact-fact joins: pay the shuffle once at
    * write time, never again at read time.
    */
  def createBucketed(
      name: String, df: DataFrame,
      bucketCols: Seq[String], numBuckets: Int): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path(name))
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(name)
    deps(name) = Nil
    spark.table(name)
  }

  /** Read a materialized view back (plans a parquet scan; bucketed MVs go
    * through the catalog so bucketing metadata survives). */
  def table(name: String): DataFrame = {
    require(deps.contains(name), s"no such materialized view: $name")
    if (spark.catalog.tableExists(name)) spark.table(name)
    else spark.read.parquet(path(name))
  }

  def exists(name: String): Boolean = deps.contains(name)

  private def dependentsOf(name: String): Seq[String] =
    deps.collect { case (n, ds) if ds.contains(name) => n }.toSeq

  /** DROP ... CASCADE (S3): removes `name` and everything downstream,
    * dependents first; returns the drop order. Deterministic: DFS over the
    * insertion-ordered registry. */
  def dropCascade(name: String): Seq[String] = {
    require(deps.contains(name), s"no such materialized view: $name")
    val order = mutable.LinkedHashSet.empty[String]
    def visit(n: String): Unit = {
      dependentsOf(n).foreach(visit)
      order += n
    }
    visit(name)
    order.foreach { n =>
      deps.remove(n)
      rewrite.foreach(_.deregister(n))
      if (spark.catalog.tableExists(n)) spark.sql(s"DROP TABLE IF EXISTS $n")
      // best-effort storage cleanup; the registry is the source of truth
      val p = java.nio.file.Paths.get(path(n))
      Materializer.deleteRecursively(p)
    }
    order.toSeq
  }
}

object Materializer {
  private[matview] def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
    }

  /** Scratch root: inside the repo's target dir (gitignored, writable). */
  def defaultScratch: String =
    sys.props.getOrElse("graft.scratch", "/root/repo/target/scratch")

  def apply(spark: SparkSession): Materializer =
    new Materializer(spark, defaultScratch)

  /** A re-aggregable measure: how to compute it over base rows and how to
    * merge two already-aggregated partials (the standard distributive-
    * aggregate algebra; averages are stored as sum+count pairs). */
  final case class Measure(
      alias: String, initial: Column, merge: Column => Column)

  object Measure {
    def sumOf(c: Column, alias: String): Measure =
      Measure(alias, sum(c), m => sum(m))
    def countAll(alias: String): Measure =
      Measure(alias, count(lit(1)), m => sum(m))
    def minOf(c: Column, alias: String): Measure =
      Measure(alias, min(c), m => min(m))
    def maxOf(c: Column, alias: String): Measure =
      Measure(alias, max(c), m => max(m))
  }
}
