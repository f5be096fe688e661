package graft.plans

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileStatusCache, HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types._

import graft.matview.Snapshots

/** Optimizer-integrated data skipping for [[graft.matview.Snapshots]]
  * scans — the rule form of `readPruned`/`readPrunedEq`: a user writes a
  * plain `.filter(...)` over `snap.readLatest(t)` and the optimizer drops
  * every data directory whose `_zstats` zone bounds or `_zbloom` filter
  * prove the predicate unsatisfiable there. This is where the open table
  * formats do the same work (Delta's OptimizeMetadataOnly/file-stats
  * pruning, Iceberg's manifest evaluators run at scan planning): data
  * skipping belongs in the PLANNER, not in a special read API the caller
  * must remember to use.
  *
  * Matched shape: `Filter(cond, LogicalRelation(HadoopFsRelation))` where
  * every root path of the relation's file index is a directory carrying a
  * `_zstats` sidecar — exactly the dirs the Snapshots commit path writes;
  * any other parquet scan is left untouched. The filter itself always
  * stays in place (row-level filtering still runs); only the scanned
  * directory list shrinks, so a pruning bug can lose rows but never
  * corrupt surviving ones — and the conjunct semantics make pruning
  * sound: a dir is dropped only when SOME conjunct is provably false on
  * every row of it.
  *
  * Predicates consulted (attribute op literal, either orientation):
  * equality and null-safe equality (zone point check + bloom membership
  * when a `_zbloom` entry exists), the four range comparisons with
  * strict/non-strict handled exactly (`a > lo` prunes a dir whose
  * max == lo; `a >= lo` keeps it), IN lists, LIKE-prefix, IS [NOT] NULL
  * against the v2 null counts — composed through arbitrary AND/OR
  * structure (a dir may satisfy Or(l, r) iff it may satisfy either
  * branch, so `ts < lo OR ts > hi` prunes the middle shards). Literals
  * normalize to the sidecar's comparison family the same way the writer
  * did — catalyst already stores timestamps as micros and dates as
  * epoch days, so the normalization is the identity on the internal
  * value. Unrecognized nodes (incl. NOT — negation under ternary NULL
  * semantics), wrong-family literals, and columns without a stats line
  * simply don't prune. When every dir is pruned the whole Filter
  * collapses to an empty [[LocalRelation]].
  *
  * The rewrite is a fixed point: the pruned relation's dirs all survive
  * their own re-check, so re-firing leaves the plan unchanged. Planning
  * cost is O(|dirs|) sidecar reads per optimize — the commit-log scaling
  * story (at 100 TB, |dirs| = |commits|, not |files|).
  */
case class SnapshotSkippingRule(spark: SparkSession) extends Rule[LogicalPlan]
  with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, lr: LogicalRelation)
        if lr.relation.isInstanceOf[HadoopFsRelation] =>
      val fsRel = lr.relation.asInstanceOf[HadoopFsRelation]
      val roots = fsRel.location.rootPaths
      val dirs = roots.map(localDir)
      // a snapshot scan iff every root is local and at least one carries
      // a stats sidecar; anything else (ordinary parquet tables) is left
      // untouched at the cost of one exists() per root per optimize.
      // Stats-less dirs inside a snapshot scan (legacy commits) are kept
      // conservatively by the per-dir check itself.
      if (dirs.contains(null) || !dirs.exists(d =>
          java.nio.file.Files.exists(
            java.nio.file.Paths.get(d, Snapshots.statsFile)))) f
      else {
        val preds = splitConjunctivePredicates(cond)
        val kept = roots.zip(dirs).collect {
          case (p, d) if dirMayMatch(d, preds) => p
        }
        if (kept.size == roots.size) f
        else if (kept.isEmpty) LocalRelation(f.output)
        else {
          val pruned = new InMemoryFileIndex(spark, kept, fsRel.options,
            Some(fsRel.dataSchema), FileStatusCache.getOrCreate(spark))
          Filter(cond, lr.copy(relation =
            fsRel.copy(location = pruned)(spark)))
        }
      }
  }

  /** Local-filesystem view of a root path, or null when the scheme says
    * it is not local (then the rule stands down — this sandbox engine's
    * sidecar reader is java.nio; a cluster deployment would read the
    * sidecars through the Hadoop FS API instead). */
  private def localDir(p: Path): String = {
    val uri = p.toUri
    if (uri.getScheme == null || uri.getScheme == "file") uri.getPath
    else null
  }

  // Deliberately NO cross-query cache of the sidecar reads: production
  // dirs are immutable, but this engine's re-runnable fixture keys drop
  // and recreate tables at the SAME paths with different data — a
  // path-keyed memo would serve stale bounds and prune wrongly, the one
  // failure mode data skipping must never have. The cost is O(|dirs|)
  // driver-side ~KB reads per optimize (the lazy vals below bound it to
  // one read per dir per rule firing); a deployment with genuinely
  // immutable storage would key a memo on a content fingerprint.
  private def dirMayMatch(dir: String, preds: Seq[Expression]): Boolean = {
    lazy val stats = Snapshots.dirStats(dir)
    lazy val blooms = Snapshots.dirBlooms(dir)
    def mayMatch(e: Expression): Boolean = e match {
      // boolean structure (the Delta/Iceberg evaluators walk the same
      // tree): a dir may satisfy a conjunction only if it may satisfy
      // every branch, a disjunction if it may satisfy ANY branch — so
      // `ts < lo OR ts > hi` prunes the middle shards, which the
      // conjunct-only walk left unpruned (Or fell to the default-true
      // arm). Not is deliberately unsupported (negation under ternary
      // NULL semantics inverts may-match unsoundly): default-true.
      case And(l, r) => mayMatch(l) && mayMatch(r)
      case Or(l, r) => mayMatch(l) || mayMatch(r)
      case EqualTo(a: AttributeReference, l: Literal) => eqOk(a, l, stats, blooms)
      case EqualTo(l: Literal, a: AttributeReference) => eqOk(a, l, stats, blooms)
      // null-safe equality: against a non-null literal it matches the
      // same rows as `=`; against NULL it IS the IsNull probe
      case EqualNullSafe(a: AttributeReference, l: Literal) =>
        if (l.value == null) stats.get(a.name).forall(z => !z.noNulls)
        else eqOk(a, l, stats, blooms)
      case EqualNullSafe(l: Literal, a: AttributeReference) =>
        if (l.value == null) stats.get(a.name).forall(z => !z.noNulls)
        else eqOk(a, l, stats, blooms)
      // a != v (the one sound NOT case, point stats only): no row can
      // satisfy it when every value in the dir IS v (min = max = v) or
      // when every row is null — the constant-shard layouts (enum dirs,
      // value-partitioned appends) hit this on every exclusion probe.
      // NULL rows never satisfy != either, so null counts don't matter.
      case Not(EqualTo(a: AttributeReference, l: Literal)) => neqOk(a, l, stats)
      case Not(EqualTo(l: Literal, a: AttributeReference)) => neqOk(a, l, stats)
      case GreaterThan(a: AttributeReference, l: Literal) => rangeOk(a, l, stats, lower = true, strict = true)
      case LessThan(l: Literal, a: AttributeReference) => rangeOk(a, l, stats, lower = true, strict = true)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => rangeOk(a, l, stats, lower = true, strict = false)
      case LessThanOrEqual(l: Literal, a: AttributeReference) => rangeOk(a, l, stats, lower = true, strict = false)
      case LessThan(a: AttributeReference, l: Literal) => rangeOk(a, l, stats, lower = false, strict = true)
      case GreaterThan(l: Literal, a: AttributeReference) => rangeOk(a, l, stats, lower = false, strict = true)
      case LessThanOrEqual(a: AttributeReference, l: Literal) => rangeOk(a, l, stats, lower = false, strict = false)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => rangeOk(a, l, stats, lower = false, strict = false)
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        // an IN list is a disjunction of points: the dir survives if ANY
        // value might be present
        vs.exists(v => eqOk(a, v.asInstanceOf[Literal], stats, blooms))
      case StartsWith(a: AttributeReference, l: Literal) =>
        prefixOk(a, l, stats)
      // null-count pruning (Delta/Iceberg both record null counts for
      // exactly this): a dir with zero nulls can't serve IS NULL, a dir
      // whose every row is null can't serve IS NOT NULL. Legacy v1
      // sidecars carry no counts (-1) and never prune here. IsNotNull
      // fires constantly — the optimizer adds it beside every
      // comparison conjunct — so all-null dirs prune even for plans
      // whose comparison literal the rule can't normalize.
      case IsNull(a: AttributeReference) =>
        stats.get(a.name).forall(z => !z.noNulls)
      case IsNotNull(a: AttributeReference) =>
        stats.get(a.name).forall(z => !z.allRowsNull)
      case _ => true // unrecognized node: cannot prune on it
    }
    preds.forall(mayMatch)
  }

  /** `a LIKE 'p%'` ⟺ p <= a < p⁺ in UTF-8 BYTE order — the order the
    * writer's UTF8String min/max were computed in (code-unit arithmetic
    * on the Java string disagrees above the BMP: U+FFFD sorts after a
    * surrogate pair in code units but before it in code points). p⁺ is
    * p's bytes with trailing 0xFF dropped and the last survivor
    * incremented; an all-0xFF prefix has no finite upper bound (lower
    * check only). */
  private def prefixOk(a: AttributeReference, l: Literal,
      stats: Map[String, Snapshots.ZStat]): Boolean =
    normLit(l) match {
      case Some(("string", p)) if p.nonEmpty => stats.get(a.name) match {
        case Some(z) if z.fam == "string" =>
          if (z.allNull) false // LIKE over NULL is never true
          else {
            // both bound checks go through UTF8String's unsigned byte
            // compare — the SAME ordering Snapshots.cmp uses for the
            // string family (one implementation, not two to keep agreed)
            val lowerOk = Snapshots.cmp("string", z.mx, p) >= 0
            val upperOk = prefixUpper(
              p.getBytes(java.nio.charset.StandardCharsets.UTF_8)) match {
              case None => true
              case Some(up) =>
                org.apache.spark.unsafe.types.UTF8String.fromString(z.mn)
                  .compareTo(org.apache.spark.unsafe.types.UTF8String
                    .fromBytes(up)) < 0
            }
            lowerOk && upperOk
          }
        case _ => true
      }
      case _ => true
    }

  /** Smallest byte string greater than every string with prefix `p`:
    * drop trailing 0xFF bytes, increment the last survivor; None when
    * p is all 0xFF (no finite upper bound exists). */
  private def prefixUpper(p: Array[Byte]): Option[Array[Byte]] = {
    var i = p.length - 1
    while (i >= 0 && p(i) == 0xff.toByte) i -= 1
    if (i < 0) None
    else {
      val up = java.util.Arrays.copyOf(p, i + 1)
      up(i) = (up(i) + 1).toByte
      Some(up)
    }
  }

  /** Literal -> (comparison family, normalized string), mirroring the
    * writer's `statsFamily`: catalyst internal values are already micros
    * (timestamp), epoch days (date), and primitives, so normalization is
    * value.toString in the right family. None (no pruning) for null
    * literals and unsupported types — including TIMESTAMP_NTZ, which the
    * writer rejects (its micros are zone-free while a TIMESTAMP cast
    * shifts through the session zone; comparing the two is unsound
    * off-UTC). */
  private def normLit(l: Literal): Option[(String, String)] =
    if (l.value == null) None
    else l.dataType match {
      case ByteType | ShortType | IntegerType | LongType |
           TimestampType | DateType =>
        Some(("long", l.value.toString))
      // -0.0 normalizes to 0.0, matching the writer's normalized bounds
      // (SQL equality treats the zeros equal; Double.compare does not)
      case FloatType =>
        Some(("double", Snapshots.normZero(
          l.value.asInstanceOf[Float].toDouble).toString))
      case DoubleType => Some(("double", Snapshots.normZero(
        l.value.asInstanceOf[Double]).toString))
      case StringType => Some(("string", l.value.toString))
      // exact plain form, re-parsed by BigDecimal on the compare side —
      // the literal reaches here uncast only when Spark's decimal
      // promotion left the attribute bare (same-or-wider column type),
      // which is exactly when the comparison is in decimal semantics
      case _: DecimalType => Some(("decimal",
        l.value.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal.toPlainString))
      case _ => None
    }

  private def eqOk(a: AttributeReference, l: Literal,
      stats: Map[String, Snapshots.ZStat],
      blooms: Map[String, (String, Array[Byte])]): Boolean =
    stats.get(a.name).exists(_.allNull) match {
      // all-null dir: `a = v` is never true whatever the literal's family
      case true => false
      case false => normLit(l) match {
        case Some((fam, v)) =>
          val zoneOk = stats.get(a.name) match {
            case Some(z) if z.fam == fam =>
              Snapshots.cmp(fam, z.mx, v) >= 0 &&
                Snapshots.cmp(fam, z.mn, v) <= 0
            case _ => true
          }
          zoneOk && (blooms.get(a.name) match {
            case Some((bf, bits)) if bf == fam =>
              Snapshots.bloomMightContain(bits,
                Snapshots.bloomBaseHash(fam, v))
            case _ => true
          })
        case None => true
      }
    }

  /** `a != v` survives unless the dir is provably CONSTANT v
    * (min = max = v, same family) or all-null; Spark's NaN = NaN
    * semantics make the NaN-constant dir prune correctly too. */
  private def neqOk(a: AttributeReference, l: Literal,
      stats: Map[String, Snapshots.ZStat]): Boolean =
    stats.get(a.name) match {
      case Some(z) if z.allNull => false
      case Some(z) => normLit(l) match {
        case Some((fam, v)) if z.fam == fam =>
          !(Snapshots.cmp(fam, z.mn, v) == 0 &&
            Snapshots.cmp(fam, z.mx, v) == 0)
        case _ => true
      }
      case None => true
    }

  /** `lower = true` means the conjunct lower-bounds the attribute
    * (`a > v` / `a >= v`): the dir survives iff its max clears the
    * bound. Symmetrically for upper bounds against the min. */
  private def rangeOk(a: AttributeReference, l: Literal,
      stats: Map[String, Snapshots.ZStat],
      lower: Boolean, strict: Boolean): Boolean =
    // all-null dir: a range comparison is never true whatever the family
    if (stats.get(a.name).exists(_.allNull)) false
    else normLit(l) match {
      case Some((fam, v)) => stats.get(a.name) match {
        case Some(z) if z.fam == fam =>
          val c = if (lower) Snapshots.cmp(fam, z.mx, v)
                  else -Snapshots.cmp(fam, z.mn, v)
          if (strict) c > 0 else c >= 0
        case _ => true
      }
      case None => true
    }
}

object SnapshotSkippingRule {

  /** Idempotent per-session install (the [[RangeJoinRule.ensureInstalled]]
    * pattern): `spark.experimental.extraOptimizations`, no session
    * rebuild. */
  def ensureInstalled(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[SnapshotSkippingRule])) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SnapshotSkippingRule(spark)
    }
  }

  /** Run `f` with the rule temporarily REMOVED from the session — for
    * computing a genuinely unpruned reference even when a prior run (or
    * GraftExtensions) already installed the rule. `f` must materialize
    * eagerly (collect/write) inside the scope; a lazy DataFrame returned
    * out of it re-plans under the restored rule. */
  def withoutRule[A](spark: SparkSession)(f: => A): A = synchronized {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_.isInstanceOf[SnapshotSkippingRule])
    try f finally spark.experimental.extraOptimizations = prev
  }

  /** Planning fact for the keys/specs: how many root directories the
    * dataframe's OPTIMIZED plan actually scans (sum over its file-based
    * relations; an all-pruned plan has none). */
  def scanRootDirs(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        lr.relation.asInstanceOf[HadoopFsRelation].location.rootPaths.size
    }.sum
}
