package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** SURVEY §2.2–2.6 operator inventory re-expressed over the driver's
  * TPC-H-ish testdata. One entry per SURVEY key; each has a DuckDB oracle in
  * [[oracles]] producing identical column names and values.
  *
  * Reference provenance (see /root/reference):
  *   - projection/filter/expr keys: assignment-5.sql:71–75, 191–197, 495,
  *     262, 75/110/216, 271–283, 57–59, 55/466–468
  *   - join keys: assignment-5.sql:76/111 (5-way natural), 197–198 (fact⋈dim),
  *     233–235 (IN-subquery semi), 259–263 (scalar theta), 465–469 (derived dim)
  *   - agg keys: assignment-5.sql:70–78 (3-key sum), 128–139/165–175
  *     (avg-of-avg vs weighted), 149–159 (two-level), 191–200 (FD group-by)
  *   - window keys: assignment-5.sql:520–526, 585–588, 597–614, 549–557
  *   - sort/limit keys: assignment-5.sql:200/347 (top-K), 234 (LIMIT 1 subquery)
  *
  * Scale notes (100 TB): every query below is a declarative plan — filters and
  * projections push to the parquet scan, dimension sides are `broadcast()`
  * (region/nation/customer are dimension-sized at any SF), fact-fact joins
  * shuffle on their join key only, and aggregations get map-side partial
  * aggregation from Catalyst automatically. Aggregates over money columns run
  * in `DecimalType` (exact, order-independent — safe under any partitioning).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  private def money(c: Column): Column = c.cast(DecimalType(12, 2))
  /** (1 - discount) / (1 + tax) as an exact small decimal so products stay
    * well inside the 38-digit cap in both engines. */
  private def oneMinus(c: Column): Column = (lit(1) - c).cast(DecimalType(4, 2))
  private def onePlus(c: Column): Column = (lit(1) + c).cast(DecimalType(4, 2))

  // --------------------------------------------------------------------
  // P — projection / filter / scalar expressions
  // --------------------------------------------------------------------

  /** P1: pure projection + aliasing (assignment-5.sql:71–75). */
  def projectRename(s: SparkSession, d: String): DataFrame =
    load(s, d, "customer")
      .select(
        col("c_custkey").as("id"),
        col("c_name").as("name"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal").as("balance"))
      .orderBy("id")

  /** P2: conjunctive filter with IN-list + range — pushed to the parquet scan
    * (reference plan: assignment-5.md:1163–1164). */
  def filterConjunct(s: SparkSession, d: String): DataFrame =
    load(s, d, "lineitem")
      .filter(
        col("l_returnflag").isin("A", "R") &&
        col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") <  lit("1997-01-01").cast(TimestampType))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  /** P3+J5: theta filter against a 1-row aggregate relation
    * (assignment-5.sql:262). Broadcast nested-loop of a single row — the
    * only sane plan at any scale. */
  def filterTheta(s: SparkSession, d: String): DataFrame = {
    val o = load(s, d, "orders")
    val avgRow = o.agg((sum(money(col("o_totalprice"))).cast(DoubleType) /
      count(lit(1))).as("avg_price"))
    o.join(broadcast(avgRow))
      .filter(col("o_totalprice") > col("avg_price"))
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** P4: row-level arithmetic (quantity*price analog, assignment-5.sql:75). */
  def exprArith(s: SparkSession, d: String): DataFrame =
    load(s, d, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (money(col("l_extendedprice")) * oneMinus(col("l_discount")) *
          onePlus(col("l_tax"))).cast(DoubleType).as("charge"))
      .orderBy("l_orderkey", "l_linenumber")

  /** P5: explicit casts (::NUMERIC analog, assignment-5.sql:75,260). */
  def exprCast(s: SparkSession, d: String): DataFrame =
    load(s, d, "part")
      .select(
        col("p_partkey"),
        col("p_retailprice").cast(DecimalType(12, 2)).cast(StringType).as("price_str"),
        col("p_size").cast(LongType).as("size_l"),
        floor(col("p_retailprice")).cast(IntegerType).as("price_int"))
      .orderBy("p_partkey")

  /** P6: searched CASE banding (assignment-5.sql:271–283). */
  def exprCase(s: SparkSession, d: String): DataFrame =
    load(s, d, "customer")
      .select(
        col("c_custkey"),
        when(col("c_acctbal") >= 7500, "platinum")
          .when(col("c_acctbal") >= 5000, "gold")
          .when(col("c_acctbal") >= 2500, "silver")
          .otherwise("bronze").as("tier"))
      .orderBy("c_custkey")

  /** P7: date part extraction + English day/month names
    * (to_char(d,'Day'/'Month') analog, assignment-5.sql:57–59). */
  def fnDate(s: SparkSession, d: String): DataFrame =
    load(s, d, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        date_format(col("o_orderdate"), "MMMM").as("month_name"),
        date_format(col("o_orderdate"), "EEEE").as("day_name"))
      .orderBy("o_orderkey")

  /** PG bpchar fidelity: `to_char(d,'Month')` blank-pads to 9 chars (the
    * longest English month), and char(n) comparisons are byte-exact — so
    * the reference's `Month IN ('April','May')` trap
    * (assignment-5.sql:495) matches nothing except 9-char names. This key
    * executes the padded semantics end-to-end: the padded name, the
    * PG-faithful IN outcome (only 'September' survives the padded
    * compare), and the trimmed compare a porting user needs instead —
    * retiring SURVEY §7.1's documented divergence as a tested behavior. */
  def fnCharPadding(s: SparkSession, d: String): DataFrame =
    load(s, d, "orders")
      .select(rpad(date_format(col("o_orderdate"), "MMMM"), 9, " ")
        .as("month_padded"))
      .groupBy("month_padded")
      .agg(count(lit(1)).as("n_orders"))
      .withColumn("padded_in_list",
        col("month_padded").isin("April", "May", "September"))
      .withColumn("trimmed_in_list",
        rtrim(col("month_padded")).isin("April", "May", "September"))
      .orderBy("month_padded")

  /** P8: DISTINCT row dedup (assignment-5.sql:55, 466–468). */
  def distinctRows(s: SparkSession, d: String): DataFrame =
    load(s, d, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"))
      .distinct()
      .orderBy("c_nationkey", "c_mktsegment")

  // --------------------------------------------------------------------
  // J — joins
  // --------------------------------------------------------------------

  /** J1: 5-way equi-join lineitem⋈orders⋈customer⋈nation⋈region
    * (the fact-build join, assignment-5.sql:76). nation/region broadcast;
    * lineitem⋈orders shuffles once on orderkey; customer broadcasts at test
    * SF and shuffles cleanly at 100 TB (AQE decides). */
  def joinNatural5Way(s: SparkSession, d: String): DataFrame = {
    val li = load(s, d, "lineitem")
    val o  = load(s, d, "orders")
    val c  = load(s, d, "customer")
    val n  = load(s, d, "nation")
    val r  = load(s, d, "region")
    // Partial aggregation below the join: lineitem collapses to one exact
    // decimal (revenue, line-count) pair per orderkey BEFORE the fact-fact
    // join, so the join and everything downstream move |orders| rows, not
    // |lineitem| — and the aggregate's hash partitioning on l_orderkey is
    // exactly the join's, so the agg side joins with no extra exchange.
    // Decimal partials re-sum exactly (order-independent), so the result
    // is bit-identical to aggregating after the join.
    // The per-order partial runs in LONG ten-thousandth-dollar units:
    // cents(price) x (100 - cents(discount)) is the same rational value as
    // decimal(12,2) x decimal(4,2), but the sum buffer stays a compact
    // long (the decimal buffer exceeds precision 18 and falls back to
    // BigDecimal — measurably 36% slower, Prof5Way). Overflow safety is
    // STRUCTURAL, not SF-dependent: an order has at most 7 lines, so the
    // per-order sum is bounded by 7 x 10^9 at any corpus size. The
    // unbounded downstream sum converts to decimal first — exactness is
    // preserved end to end.
    val liAgg = li.groupBy(col("l_orderkey"))
      .agg(
        sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev_e4"),
        count(lit(1)).as("nl"))
      .withColumn("rev_dec", col("rev_e4").cast(DecimalType(18, 0)) *
        lit(new java.math.BigDecimal("0.0001")))
      .drop("rev_e4")
    // SHUFFLE_HASH on the fact-fact join: Catalyst's static estimate
    // broadcasts the two-column orders projection up to ~sf1 (a 1.5M-row
    // single-threaded driver build — measured 25% slower than shuffling
    // it, Prof5Sf1), and a fact broadcast is the wrong shape at any real
    // scale regardless. The hint pins the scale plan: liAgg is already
    // hash-partitioned on the join key, so only orders moves, with no
    // sort on either side. Orderkeys are near-unique — no skew risk.
    liAgg.join(o.hint("SHUFFLE_HASH"), col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(col("rev_dec")).cast(DoubleType).as("revenue"),
        sum(col("nl")).as("n_lines"))
      .orderBy("r_name", "n_name")
  }

  /** The 5-way join against orderkey-BUCKETED fact tables — the layout a
    * 100 TB deployment chooses at ingest so its heaviest join never
    * shuffles. lineitem and orders are bucketed+sorted on the join key
    * (one-time write, amortized over every downstream query); the
    * per-order partial aggregation then needs no exchange (bucketing IS
    * its partitioning) and the fact-fact join is a merge join of
    * co-located buckets. Measured (ProfBucket5, 10x corpus): 6.1s
    * parquet -> 1.1s bucketed, bit-identical, fact-side exchanges 2 -> 0;
    * the flag column pins the no-shuffle property (only the final
    * aggregate and sort may exchange). */
  def joinNatural5WayBucketed(s: SparkSession, d: String): DataFrame = {
    val m = graft.matview.Materializer(s)
    m.createBucketed("bkt5_lineitem",
      load(s, d, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount"),
      Seq("l_orderkey"), 8)
    m.createBucketed("bkt5_orders",
      load(s, d, "orders").select("o_orderkey", "o_custkey"),
      Seq("o_orderkey"), 8)
    val li = s.table("bkt5_lineitem")
    val o = s.table("bkt5_orders")
    val liAgg = li.groupBy(col("l_orderkey"))
      .agg(
        sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev_e4"),
        count(lit(1)).as("nl"))
      .withColumn("rev_dec", col("rev_e4").cast(DecimalType(18, 0)) *
        lit(new java.math.BigDecimal("0.0001")))
      .drop("rev_e4")
    val joined = liAgg.hint("MERGE")
      .join(o.hint("MERGE"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(load(s, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(load(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(load(s, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(col("rev_dec")).cast(DoubleType).as("revenue"),
        sum(col("nl")).as("n_lines"))
    val shuffles = joined.queryExecution.executedPlan.toString
      .linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning"))
    joined
      .withColumn("fact_join_no_shuffle", lit(shuffles <= 1))
      .orderBy("r_name", "n_name")
  }

  /** J2: fact ⋈ broadcast dimension (assignment-5.sql:197–198). */
  def joinFactDim(s: SparkSession, d: String): DataFrame =
    load(s, d, "orders")
      .join(broadcast(load(s, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        exactSum(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment")

  /** J3: join on a date/time column against a derived time dimension
    * (cust_order⋈time on orderdate, assignment-5.sql:76). */
  def joinOnDate(s: SparkSession, d: String): DataFrame = {
    val o = load(s, d, "orders")
    val timeDim = o.select(col("o_orderdate").as("dt")).distinct()
      .withColumn("yr", year(col("dt")))
    o.join(timeDim, col("o_orderdate") === col("dt"))
      .groupBy("yr")
      .agg(count(lit(1)).as("n_orders"), exactSum(col("o_totalprice")).as("revenue"))
      .orderBy("yr")
  }

  /** J4+O3: semi-join against a LIMIT-1 subquery — the single best buyer's
    * orders (assignment-5.sql:233–235). Deterministic via (spend DESC, key)
    * tie-break; the reference relied on stored sort order (SURVEY §7.6). */
  def joinSemiInSubquery(s: SparkSession, d: String): DataFrame = {
    val o = load(s, d, "orders")
    val best = o.groupBy("o_custkey")
      .agg(exactSum(col("o_totalprice")).as("spend"))
      .orderBy(col("spend").desc, col("o_custkey"))
      .limit(1)
      .select("o_custkey")
    o.join(broadcast(best), Seq("o_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** J5: cross join against 1-row aggregates + theta filter
    * (assignment-5.sql:259–263; NATURAL JOIN with no common columns
    * degrades to a cross join — made explicit here, SURVEY §7.7). */
  def joinThetaScalar(s: SparkSession, d: String): DataFrame = {
    val per = load(s, d, "orders").groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"))
    val avgN = per.agg((sum(col("n_orders")).cast(DoubleType) /
      count(lit(1))).as("avg_orders"))
    per.crossJoin(broadcast(avgN))
      .filter(col("n_orders") > col("avg_orders"))
      .select("o_custkey", "n_orders")
      .orderBy("o_custkey")
  }

  /** J6: join against an inline derived dimension (SELECT DISTINCT …)
    * (assignment-5.sql:465–469). */
  def joinDerivedDim(s: SparkSession, d: String): DataFrame = {
    val dim = load(s, d, "nation")
      .select("n_nationkey", "n_regionkey").distinct()
    load(s, d, "customer")
      .join(broadcast(dim), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_customers"), exactSum(col("c_acctbal")).as("balance"))
      .orderBy("n_regionkey")
  }

  /** Extension: left outer join (absent from the reference, SURVEY §2.3
    * note — engine-complete surface). Customers with their 1995 order count
    * (0 where none). */
  def joinLeftOuter(s: SparkSession, d: String): DataFrame = {
    val o95 = load(s, d, "orders")
      .filter(year(col("o_orderdate")) === 1995)
    load(s, d, "customer")
      .join(o95, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")
  }

  /** Extension: anti join — customers with no 1995 orders. */
  def joinAnti(s: SparkSession, d: String): DataFrame = {
    val o95 = load(s, d, "orders").filter(year(col("o_orderdate")) === 1995)
    load(s, d, "customer")
      .join(o95, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // --------------------------------------------------------------------
  // A — aggregations
  // --------------------------------------------------------------------

  /** A1: multi-key sum aggregation — the TPC-H Q1 shape (fact build,
    * assignment-5.sql:71–78). Exact and order-independent under any
    * partitioning.
    *
    * Lane-split fixed point: every money sum is decomposed into two
    * 22-bit long "lanes" (`v & (2^22-1)` and `v >>> 22`), summed as
    * plain longs — all whole-stage-codegen adds, long aggregation
    * buffers — and recombined into an exact decimal ONCE per group
    * (`hi * 2^22 + lo`, then an exact decimal division by the fixed-point
    * unit). This replaces the per-row BigDecimal work of a decimal sum
    * (precision 28 buffers don't fit Spark's compact long decimals) with
    * per-GROUP decimal work. Exactness bound: lane values < 2^22, so a
    * lane sum overflows long only past 2^41 rows per group (~sf400k —
    * comfortably beyond the 100 TB design point; the charge product
    * e6 value < 2^38 keeps the hi lane < 2^16). Measured (ProfQ1):
    * 1.52s → 0.72s at sf0.1, 11.1s → 3.2s at the 10x corpus,
    * bit-identical results both SFs. */
  def aggSumGroup3(s: SparkSession, d: String): DataFrame = {
    val e2 = (c: Column) => round(c * 100).cast("long")
    val MASK = (1L << 22) - 1
    def lanes(v: Column, name: String): Seq[Column] = Seq(
      sum(v.bitwiseAND(MASK)).as(s"${name}_lo"),
      sum(shiftrightunsigned(v, 22)).as(s"${name}_hi"))
    def recombine(name: String, unit: Int): Column =
      ((col(s"${name}_hi").cast(DecimalType(24, 0)) * lit(1L << 22) +
        col(s"${name}_lo")) / lit(unit)).cast(DoubleType)
    val base = e2(col("l_extendedprice"))
    val disc = base * (lit(100L) - e2(col("l_discount")))
    val charge = disc * (lit(100L) + e2(col("l_tax")))
    load(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-02").cast(TimestampType))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(e2(col("l_quantity"))).as("qty_e2"),
        (lanes(base, "base") ++ lanes(disc, "disc") ++
          lanes(charge, "charge") :+ count(lit(1)).as("count_order")): _*)
      .select(
        col("l_returnflag"), col("l_linestatus"),
        (col("qty_e2").cast(DecimalType(24, 0)) / lit(100))
          .cast(DoubleType).as("sum_qty"),
        recombine("base", 100).as("sum_base_price"),
        recombine("disc", 10000).as("sum_disc_price"),
        recombine("charge", 1000000).as("sum_charge"),
        ((col("qty_e2").cast(DecimalType(24, 0)) / lit(100))
          .cast(DoubleType) / col("count_order")).as("avg_qty"),
        (recombine("base", 100) / col("count_order")).as("avg_price"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A2: count(*) global + per group (assignment-5.sql:64,83,114). */
  def aggCountStar(s: SparkSession, d: String): DataFrame =
    load(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy("o_orderstatus")

  /** A3: avg, global and grouped (assignment-5.sql:131–139). */
  def aggAvg(s: SparkSession, d: String): DataFrame =
    load(s, d, "customer")
      .groupBy("c_mktsegment")
      .agg(exactAvg(col("c_acctbal")).as("avg_balance"), count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  /** A4: single-key sum (spending per customer, assignment-5.sql:196–199). */
  def aggSumGroup1(s: SparkSession, d: String): DataFrame =
    load(s, d, "orders")
      .groupBy("o_custkey")
      .agg(exactSum(col("o_totalprice")).as("spend"))
      .orderBy("o_custkey")

  /** A5: avg-of-avg (the reference's deliberately-wrong method) next to the
    * correct weighted recombination (assignment-5.sql:128–139 vs 165–175;
    * golden proof assignment-5.md:160–187). Per-group avgs are rounded to 6
    * decimals and re-summed in decimal so the outer aggregate stays exact. */
  def aggAvgOfAvg(s: SparkSession, d: String): DataFrame = {
    val per = load(s, d, "orders").groupBy("o_custkey")
      .agg(sum(money(col("o_totalprice"))).as("spend_dec"), count(lit(1)).as("n"))
    per.agg(
      (sum(round(col("spend_dec").cast(DoubleType) / col("n"), 6)
        .cast(DecimalType(18, 6))).cast(DoubleType) / count(lit(1)))
        .as("avg_of_avg"),
      (sum(col("spend_dec")).cast(DoubleType) / sum(col("n"))).as("weighted_avg"))
  }

  /** A6: two-level aggregation — partial to (customer, day), then a global
    * avg over the partials (assignment-5.sql:149–159). The inner sums stay
    * decimal so the outer aggregate is exact. */
  def aggTwoLevel(s: SparkSession, d: String): DataFrame = {
    val perDay = load(s, d, "orders")
      .groupBy("o_custkey", "o_orderdate")
      .agg(sum(money(col("o_totalprice"))).as("day_spend"))
    perDay.agg(
      (sum(col("day_spend")).cast(DoubleType) / count(lit(1))).as("avg_day_spend"),
      count(lit(1)).as("n_customer_days"))
  }

  /** A7: functional-dependency GROUP BY — PG groups by the PK alone while
    * projecting dependent columns (assignment-5.sql:191–200); Spark needs
    * them aggregated: min() is the deterministic stand-in (SURVEY §7.4). */
  def aggGroupFd(s: SparkSession, d: String): DataFrame =
    load(s, d, "orders")
      .join(broadcast(load(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey")
      .agg(
        min(col("c_name")).as("c_name"),
        count(lit(1)).as("n_orders"),
        exactSum(col("o_totalprice")).as("spend"))
      .orderBy("c_custkey")

  /** Extension: count(DISTINCT) — absent from the reference (SURVEY §2.4
    * note), required surface for an engine. */
  def aggCountDistinct(s: SparkSession, d: String): DataFrame =
    load(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")

  /** Extension: ROLLUP grouping sets (the write-up names roll-up as the OLAP
    * concept, assignment-5.md:278–283, but implements plain GROUP BY).
    * NULL group markers are coalesced to 'ALL' for a stable cross-engine
    * representation. */
  def aggRollup(s: SparkSession, d: String): DataFrame =
    load(s, d, "customer")
      .join(broadcast(load(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(load(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), exactSum(col("c_acctbal")).as("balance"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"), col("balance"))
      .orderBy("region", "nation")

  // --------------------------------------------------------------------
  // W — window functions
  // --------------------------------------------------------------------

  /** W1: unordered partition total on every row (assignment-5.sql:520). */
  def windowSumPartition(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey")
    load(s, d, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        sum(money(col("l_extendedprice"))).over(w).cast(DoubleType).as("order_total"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** W2: two different windows in one projection (assignment-5.sql:520–526,
    * the named-WINDOW form). Avg over a window = exact decimal window sum
    * cast to double, divided by the window count. */
  def windowAvgPartition(s: SparkSession, d: String): DataFrame = {
    val byCust = Window.partitionBy("o_custkey")
    val byYear = Window.partitionBy(year(col("o_orderdate")))
    load(s, d, "orders")
      .select(
        col("o_orderkey"),
        (sum(money(col("o_totalprice"))).over(byCust).cast(DoubleType) /
          count(lit(1)).over(byCust)).as("cust_avg"),
        (sum(money(col("o_totalprice"))).over(byYear).cast(DoubleType) /
          count(lit(1)).over(byYear)).as("year_avg"))
      .orderBy("o_orderkey")
  }

  /** W3: cumulative sum — PG's default frame with ORDER BY is
    * RANGE UNBOUNDED PRECEDING..CURRENT ROW, which is also Spark's default
    * (assignment-5.sql:585–588; SURVEY §2.5 W3). Ties on the order key are
    * peers and share the running value in both engines. */
  def windowCumulative(s: SparkSession, d: String): DataFrame = {
    // Long-cents running sum: the per-day aggregate and the window both
    // sum e2 fixed point in a codegen long buffer (the decimal sum's
    // precision-22 buffer is BigDecimal per row), recombined to exact
    // decimal/double once per OUTPUT row. Unlike a groupBy, the running
    // sum's magnitude is bounded by ONE customer's lifetime spend —
    // overflow needs a single customer past 9.2e16 dollars, not a big
    // corpus — so the long lane is scale-safe here without splitting.
    // Bit-identical to the decimal form (ProfWin, both SFs); ~18% at the
    // 10x corpus — the window is sort-bound, so the win is real but
    // modest.
    val perDay = load(s, d, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("day_e2"))
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    perDay
      .select(
        col("o_custkey"), col("o_orderdate"),
        (col("day_e2").cast(DecimalType(24, 0)) / lit(100))
          .cast(DoubleType).as("day_spend"),
        (sum(col("day_e2")).over(w).cast(DecimalType(24, 0)) / lit(100))
          .cast(DoubleType).as("running_spend"))
      .orderBy("o_custkey", "o_orderdate")
  }

  /** W4: two stacked windows with an intermediate DISTINCT
    * (assignment-5.sql:597–614). Inner window totals per (year, month);
    * dedup; outer cumulative over months within year. */
  def windowStacked(s: SparkSession, d: String): DataFrame = {
    val o = load(s, d, "orders")
      .select(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        money(col("o_totalprice")).as("price_dec"))
    val inner = Window.partitionBy("yr", "mo")
    val outer = Window.partitionBy("yr").orderBy("mo")
    o.select(col("yr"), col("mo"), sum(col("price_dec")).over(inner).as("month_total"))
      .distinct()
      .select(
        col("yr"), col("mo"),
        col("month_total").cast(DoubleType).as("month_total"),
        sum(col("month_total")).over(outer).cast(DoubleType).as("running_total"))
      .orderBy("yr", "mo")
  }

  /** W5: window over a pre-aggregated materialized result
    * (assignment-5.sql:549–557): per-customer-year revenue with the
    * year-wide average alongside. */
  def windowAvgOverMv(s: SparkSession, d: String): DataFrame = {
    val mv = load(s, d, "orders")
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .agg(sum(money(col("o_totalprice"))).as("spend_dec"))
    val w = Window.partitionBy("yr")
    mv.select(
        col("o_custkey"), col("yr"),
        col("spend_dec").cast(DoubleType).as("spend"),
        (sum(col("spend_dec")).over(w).cast(DoubleType) /
          count(lit(1)).over(w)).as("year_avg"))
      .orderBy("yr", "o_custkey")
  }

  /** Extension: ranking windows (the TimeId build uses row_number;
    * rank/dense_rank complete the surface). Deterministic tie-break on the
    * key column. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    load(s, d, "customer")
      .select(
        col("c_nationkey"), col("c_custkey"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"))
      .filter(col("rn") <= 3)
      .orderBy("c_nationkey", "rn")
  }

  /** Extension: lead/lag — days since a customer's previous order. */
  def windowLeadLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    load(s, d, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .as("days_since_prev"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // --------------------------------------------------------------------
  // O — sort / limit / top-K / set ops
  // --------------------------------------------------------------------

  /** O1: multi-column sort (assignment-5.sql:61,78,343). */
  def orderByMulti(s: SparkSession, d: String): DataFrame =
    load(s, d, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy(col("s_nationkey").asc, col("s_acctbal").desc, col("s_suppkey").asc)

  /** O2: ORDER BY … LIMIT K — plans as TakeOrderedAndProject, the exact
    * analog of PG's top-N heapsort (assignment-5.md:486). Exact decimal
    * spend makes the ordering deterministic; c_custkey breaks ties. */
  def topkOrderLimit(s: SparkSession, d: String): DataFrame =
    load(s, d, "orders")
      .groupBy("o_custkey")
      .agg(exactSum(col("o_totalprice")).as("spend"))
      .orderBy(col("spend").desc, col("o_custkey").asc)
      .limit(10)

  /** O3: LIMIT 1 subquery — the nation with the most customers
    * (assignment-5.sql:234; determinism via tie-break, SURVEY §7.6). */
  def limitSubquery(s: SparkSession, d: String): DataFrame =
    load(s, d, "customer")
      .join(broadcast(load(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_customers").desc, col("n_name"))
      .limit(1)

  /** Extension: set operations (absent from the reference, SURVEY §2.6) —
    * customers active in 1995 vs 1996. */
  private def custkeysOfYear(s: SparkSession, d: String, yr: Int): DataFrame =
    load(s, d, "orders")
      .filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey")).distinct()

  def setopUnion(s: SparkSession, d: String): DataFrame =
    custkeysOfYear(s, d, 1995).union(custkeysOfYear(s, d, 1996))
      .distinct().orderBy("o_custkey")

  def setopIntersect(s: SparkSession, d: String): DataFrame =
    custkeysOfYear(s, d, 1995).intersect(custkeysOfYear(s, d, 1996))
      .orderBy("o_custkey")

  def setopExcept(s: SparkSession, d: String): DataFrame =
    custkeysOfYear(s, d, 1995).except(custkeysOfYear(s, d, 1996))
      .orderBy("o_custkey")

  /** Bag-semantics set ops: multiplicities preserved (INTERSECT ALL /
    * EXCEPT ALL), the variants the DISTINCT forms silently lose. Inputs
    * keep one row per ORDER (not per key), so multiplicities are real;
    * grouped to (key, multiplicity) for deterministic output. */
  private def orderRowsOfYear(s: SparkSession, d: String, yr: Int): DataFrame =
    load(s, d, "orders")
      .filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey"))

  def setopIntersectAll(s: SparkSession, d: String): DataFrame =
    orderRowsOfYear(s, d, 1995).intersectAll(orderRowsOfYear(s, d, 1996))
      .groupBy("o_custkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy("o_custkey")

  def setopExceptAll(s: SparkSession, d: String): DataFrame =
    orderRowsOfYear(s, d, 1995).exceptAll(orderRowsOfYear(s, d, 1996))
      .groupBy("o_custkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy("o_custkey")

  /** Extension: FULL OUTER fact-fact join — per-customer order counts in
    * 1995 vs 1996 with customers active in only one year surviving from
    * either side. Unmatched-side counts coalesce to 0 and a status column
    * proves which side matched (null-flag semantics without emitting
    * nulls). One hash shuffle per side on the join key; at 100 TB this is
    * the standard sort-merge full-outer shape. */
  def joinFullOuter(s: SparkSession, d: String): DataFrame = {
    def counts(yr: Int) = load(s, d, "orders")
      .filter(year(col("o_orderdate")) === yr)
      .groupBy(col("o_custkey").as(s"ck$yr"))
      .agg(count(lit(1)).as(s"n_$yr"))
    counts(1995).join(counts(1996),
        col("ck1995") === col("ck1996"), "full_outer")
      .select(
        coalesce(col("ck1995"), col("ck1996")).as("o_custkey"),
        coalesce(col("n_1995"), lit(0L)).as("n_1995"),
        coalesce(col("n_1996"), lit(0L)).as("n_1996"),
        when(col("ck1995").isNull, "only_1996")
          .when(col("ck1996").isNull, "only_1995")
          .otherwise("both").as("presence"))
      .orderBy("o_custkey")
  }

  /** Bag UNION ALL: multiplicities add across the two inputs (the variant
    * [[setopUnion]]'s DISTINCT silently collapses); grouped to (key,
    * multiplicity) for deterministic output. */
  def setopUnionAll(s: SparkSession, d: String): DataFrame =
    orderRowsOfYear(s, d, 1995).union(orderRowsOfYear(s, d, 1996))
      .groupBy("o_custkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy("o_custkey")

  /** Extension: relative-rank windows (percent_rank / cume_dist) — account
    * balance standing within each nation. The ORDER BY includes the unique
    * key, so ranks are tie-free and the rational rank fractions divide to
    * identical doubles in both engines. */
  def windowPercentRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    load(s, d, "customer")
      .select(
        col("c_nationkey"), col("c_custkey"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("c_nationkey", "c_custkey")
  }

  /** Extension: per-aggregate FILTER clauses — one scan producing
    * differently-filtered aggregates side by side (the idiom that replaces
    * N self-joins in report queries). Spark expresses FILTER as
    * conditional aggregation; both forms map-side-combine in one pass. */
  def aggFiltered(s: SparkSession, d: String): DataFrame =
    load(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        count(when(col("o_totalprice") > 200000, lit(1))).as("n_big"),
        sum(when(year(col("o_orderdate")) === 1995,
          dec(col("o_totalprice")))).cast(DoubleType).as("rev_1995"))
      .orderBy("o_orderpriority")

  /** Skew-salted join through the gate: the key-selective salted inner
    * join ([[graft.operators.SaltedJoin]], auto-tuned replication) must
    * produce results identical to the plain join — proven against a
    * plain-SQL oracle. lineitem⋈orders on orderkey with a grouped
    * rollup; salting is a physical remedy, invisible in the values. */
  def joinSalted(s: SparkSession, d: String): DataFrame = {
    val li = load(s, d, "lineitem")
      .select(col("l_orderkey"), dec(col("l_extendedprice")).as("p"))
    val o = load(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    graft.operators.SaltedJoin
      .saltedInner(li, o, "l_orderkey", "o_orderkey", 0)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), sum(col("p")).cast(DoubleType).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Ordered string aggregation (LISTAGG/string_agg): the classic report
    * column — deterministic because the ORDER BY is part of the
    * aggregate. */
  def aggStringAgg(s: SparkSession, d: String): DataFrame =
    load(s, d, "nation")
      .select(col("n_regionkey"), col("n_name"))
      .groupBy("n_regionkey")
      .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
        .as("nations"),
        count(lit(1)).as("n"))
      .orderBy("n_regionkey")

  // --------------------------------------------------------------------
  // Registry
  // --------------------------------------------------------------------

  val entries: Map[String, Q] = Map(
    "project_rename"        -> (projectRename _),
    "filter_conjunct"       -> (filterConjunct _),
    "filter_theta"          -> (filterTheta _),
    "expr_arith"            -> (exprArith _),
    "expr_cast"             -> (exprCast _),
    "expr_case"             -> (exprCase _),
    "fn_date"               -> (fnDate _),
    "fn_char_padding"       -> (fnCharPadding _),
    "distinct_rows"         -> (distinctRows _),
    "join_natural_5way"     -> (joinNatural5Way _),
    "join_natural_5way_bucketed" -> (joinNatural5WayBucketed _),
    "join_fact_dim"         -> (joinFactDim _),
    "join_on_date"          -> (joinOnDate _),
    "join_semi_in_subquery" -> (joinSemiInSubquery _),
    "join_theta_scalar"     -> (joinThetaScalar _),
    "join_derived_dim"      -> (joinDerivedDim _),
    "join_left_outer"       -> (joinLeftOuter _),
    "join_anti"             -> (joinAnti _),
    "agg_sum_group3"        -> (aggSumGroup3 _),
    "agg_count_star"        -> (aggCountStar _),
    "agg_avg"               -> (aggAvg _),
    "agg_sum_group1"        -> (aggSumGroup1 _),
    "agg_avg_of_avg"        -> (aggAvgOfAvg _),
    "agg_two_level"         -> (aggTwoLevel _),
    "agg_group_fd"          -> (aggGroupFd _),
    "agg_count_distinct"    -> (aggCountDistinct _),
    "agg_rollup"            -> (aggRollup _),
    "window_sum_partition"  -> (windowSumPartition _),
    "window_avg_partition"  -> (windowAvgPartition _),
    "window_cumulative"     -> (windowCumulative _),
    "window_stacked"        -> (windowStacked _),
    "window_avg_over_mv"    -> (windowAvgOverMv _),
    "window_rank"           -> (windowRank _),
    "window_lead_lag"       -> (windowLeadLag _),
    "orderby_multi"         -> (orderByMulti _),
    "topk_order_limit"      -> (topkOrderLimit _),
    "limit_subquery"        -> (limitSubquery _),
    "setop_union"           -> (setopUnion _),
    "setop_intersect"       -> (setopIntersect _),
    "setop_except"          -> (setopExcept _),
    "setop_intersect_all"   -> (setopIntersectAll _),
    "setop_except_all"      -> (setopExceptAll _),
    "setop_union_all"       -> (setopUnionAll _),
    "agg_string_agg"        -> (aggStringAgg _),
    "join_full_outer"       -> (joinFullOuter _),
    "window_percent_rank"   -> (windowPercentRank _),
    "agg_filtered"          -> (aggFiltered _),
    "join_salted"           -> (joinSalted _),
  )

  // Shared SQL fragments for the oracles.
  private val MONEY = "CAST(%s AS DECIMAL(12,2))"
  private def m(c: String) = MONEY.format(c)
  private def esum(c: String) = s"CAST(SUM(${m(c)}) AS DOUBLE)"
  private def eavg(c: String) = s"CAST(SUM(${m(c)}) AS DOUBLE) / COUNT(*)"

  val oracles: Map[String, String] = Map(
    "project_rename" ->
      """SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment,
        |c_acctbal AS balance FROM customer ORDER BY id""".stripMargin,
    "filter_conjunct" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate FROM lineitem
        |WHERE l_returnflag IN ('A','R')
        |AND l_shipdate >= TIMESTAMP '1996-01-01'
        |AND l_shipdate < TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_theta" ->
      s"""WITH g AS (SELECT ${eavg("o_totalprice")} AS avg_price FROM orders)
         |SELECT o_orderkey, o_totalprice FROM orders, g
         |WHERE o_totalprice > avg_price ORDER BY o_orderkey""".stripMargin,
    "expr_arith" ->
      s"""SELECT l_orderkey, l_linenumber,
         |CAST(${m("l_extendedprice")} * CAST(1 - l_discount AS DECIMAL(4,2))
         |  * CAST(1 + l_tax AS DECIMAL(4,2)) AS DOUBLE) AS charge
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "expr_cast" ->
      """SELECT p_partkey,
        |CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
        |CAST(p_size AS BIGINT) AS size_l,
        |CAST(FLOOR(p_retailprice) AS INTEGER) AS price_int
        |FROM part ORDER BY p_partkey""".stripMargin,
    "expr_case" ->
      """SELECT c_custkey,
        |CASE WHEN c_acctbal >= 7500 THEN 'platinum'
        |     WHEN c_acctbal >= 5000 THEN 'gold'
        |     WHEN c_acctbal >= 2500 THEN 'silver'
        |     ELSE 'bronze' END AS tier
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        |CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |monthname(o_orderdate) AS month_name,
        |dayname(o_orderdate) AS day_name
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_char_padding" ->
      """SELECT month_padded, COUNT(*) AS n_orders,
        |month_padded IN ('April','May','September') AS padded_in_list,
        |rtrim(month_padded) IN ('April','May','September') AS trimmed_in_list
        |FROM (SELECT rpad(monthname(o_orderdate), 9, ' ') AS month_padded
        |      FROM orders)
        |GROUP BY month_padded ORDER BY month_padded""".stripMargin,
    "distinct_rows" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "join_natural_5way" ->
      s"""SELECT r_name, n_name,
         |CAST(SUM(${m("l_extendedprice")} * CAST(1 - l_discount AS DECIMAL(4,2)))
         |  AS DOUBLE) AS revenue,
         |COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "join_natural_5way_bucketed" ->
      s"""SELECT r_name, n_name,
         |CAST(SUM(${m("l_extendedprice")} * CAST(1 - l_discount AS DECIMAL(4,2)))
         |  AS DOUBLE) AS revenue,
         |COUNT(*) AS n_lines,
         |true AS fact_join_no_shuffle
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "join_fact_dim" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders, ${esum("o_totalprice")} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_on_date" ->
      s"""WITH timedim AS (
         |  SELECT DISTINCT o_orderdate AS dt, CAST(year(o_orderdate) AS INTEGER) AS yr
         |  FROM orders)
         |SELECT yr, COUNT(*) AS n_orders, ${esum("o_totalprice")} AS revenue
         |FROM orders JOIN timedim ON o_orderdate = dt
         |GROUP BY yr ORDER BY yr""".stripMargin,
    "join_semi_in_subquery" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         |WHERE o_custkey IN (
         |  SELECT o_custkey FROM orders GROUP BY o_custkey
         |  ORDER BY ${esum("o_totalprice")} DESC, o_custkey LIMIT 1)
         |ORDER BY o_orderkey""".stripMargin,
    "join_theta_scalar" ->
      """WITH per AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey),
        |g AS (SELECT CAST(SUM(n_orders) AS DOUBLE)/COUNT(*) AS avg_orders FROM per)
        |SELECT o_custkey, n_orders FROM per, g
        |WHERE n_orders > avg_orders ORDER BY o_custkey""".stripMargin,
    "join_derived_dim" ->
      s"""WITH dim AS (SELECT DISTINCT n_nationkey, n_regionkey FROM nation)
         |SELECT n_regionkey, COUNT(*) AS n_customers, ${esum("c_acctbal")} AS balance
         |FROM customer JOIN dim ON c_nationkey = n_nationkey
         |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN (
        |  SELECT * FROM orders WHERE year(o_orderdate) = 1995) o
        |ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND year(o_orderdate) = 1995)
        |ORDER BY c_custkey""".stripMargin,
    "agg_sum_group3" ->
      s"""SELECT l_returnflag, l_linestatus,
         |CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
         |${esum("l_extendedprice")} AS sum_base_price,
         |CAST(SUM(${m("l_extendedprice")} * CAST(1 - l_discount AS DECIMAL(4,2)))
         |  AS DOUBLE) AS sum_disc_price,
         |CAST(SUM(${m("l_extendedprice")} * CAST(1 - l_discount AS DECIMAL(4,2))
         |  * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
         |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
         |${eavg("l_extendedprice")} AS avg_price,
         |COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_count_star" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |COUNT(DISTINCT o_custkey) AS n_customers
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "agg_avg" ->
      s"""SELECT c_mktsegment, ${eavg("c_acctbal")} AS avg_balance, COUNT(*) AS n
         |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "agg_sum_group1" ->
      s"""SELECT o_custkey, ${esum("o_totalprice")} AS spend
         |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "agg_avg_of_avg" ->
      s"""WITH per AS (
         |  SELECT o_custkey, SUM(${m("o_totalprice")}) AS spend_dec, COUNT(*) AS n
         |  FROM orders GROUP BY o_custkey)
         |SELECT
         |CAST(SUM(CAST(ROUND(CAST(spend_dec AS DOUBLE)/n, 6) AS DECIMAL(18,6)))
         |  AS DOUBLE)/COUNT(*) AS avg_of_avg,
         |CAST(SUM(spend_dec) AS DOUBLE)/SUM(n) AS weighted_avg
         |FROM per""".stripMargin,
    "agg_two_level" ->
      s"""WITH per AS (
         |  SELECT o_custkey, o_orderdate, SUM(${m("o_totalprice")}) AS day_spend
         |  FROM orders GROUP BY o_custkey, o_orderdate)
         |SELECT CAST(SUM(day_spend) AS DOUBLE)/COUNT(*) AS avg_day_spend,
         |COUNT(*) AS n_customer_days FROM per""".stripMargin,
    "agg_group_fd" ->
      s"""SELECT c_custkey, MIN(c_name) AS c_name, COUNT(*) AS n_orders,
         |${esum("o_totalprice")} AS spend
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "agg_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_rollup" ->
      s"""SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
         |COUNT(*) AS n_customers, ${esum("c_acctbal")} AS balance
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name) ORDER BY region, nation""".stripMargin,
    "window_sum_partition" ->
      s"""SELECT l_orderkey, l_linenumber,
         |CAST(SUM(${m("l_extendedprice")}) OVER (PARTITION BY l_orderkey) AS DOUBLE)
         |  AS order_total
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "window_avg_partition" ->
      s"""SELECT o_orderkey,
         |CAST(SUM(${m("o_totalprice")}) OVER (PARTITION BY o_custkey) AS DOUBLE) /
         |  COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg,
         |CAST(SUM(${m("o_totalprice")}) OVER (PARTITION BY year(o_orderdate)) AS DOUBLE) /
         |  COUNT(*) OVER (PARTITION BY year(o_orderdate)) AS year_avg
         |FROM orders ORDER BY o_orderkey""".stripMargin,
    "window_cumulative" ->
      s"""WITH per AS (
         |  SELECT o_custkey, o_orderdate, SUM(${m("o_totalprice")}) AS day_spend
         |  FROM orders GROUP BY o_custkey, o_orderdate)
         |SELECT o_custkey, o_orderdate,
         |CAST(day_spend AS DOUBLE) AS day_spend,
         |CAST(SUM(day_spend) OVER (PARTITION BY o_custkey ORDER BY o_orderdate)
         |  AS DOUBLE) AS running_spend
         |FROM per ORDER BY o_custkey, o_orderdate""".stripMargin,
    "window_stacked" ->
      s"""WITH base AS (
         |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         |         CAST(month(o_orderdate) AS INTEGER) AS mo,
         |         ${m("o_totalprice")} AS price_dec
         |  FROM orders),
         |inner_w AS (
         |  SELECT DISTINCT yr, mo,
         |         SUM(price_dec) OVER (PARTITION BY yr, mo) AS month_total
         |  FROM base)
         |SELECT yr, mo, CAST(month_total AS DOUBLE) AS month_total,
         |CAST(SUM(month_total) OVER (PARTITION BY yr ORDER BY mo) AS DOUBLE)
         |  AS running_total
         |FROM inner_w ORDER BY yr, mo""".stripMargin,
    "window_avg_over_mv" ->
      s"""WITH mv AS (
         |  SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
         |         SUM(${m("o_totalprice")}) AS spend_dec
         |  FROM orders GROUP BY o_custkey, year(o_orderdate))
         |SELECT o_custkey, yr, CAST(spend_dec AS DOUBLE) AS spend,
         |CAST(SUM(spend_dec) OVER (PARTITION BY yr) AS DOUBLE) /
         |  COUNT(*) OVER (PARTITION BY yr) AS year_avg
         |FROM mv ORDER BY yr, o_custkey""".stripMargin,
    "window_rank" ->
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey,
        |  ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal DESC, c_custkey) AS rn,
        |  RANK() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer) t
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin,
    "window_lead_lag" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(date_diff('day',
        |  LAG(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey),
        |  o_orderdate) AS INTEGER) AS days_since_prev
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "orderby_multi" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC""".stripMargin,
    "topk_order_limit" ->
      s"""SELECT o_custkey, ${esum("o_totalprice")} AS spend
         |FROM orders GROUP BY o_custkey
         |ORDER BY spend DESC, o_custkey ASC LIMIT 10""".stripMargin,
    "limit_subquery" ->
      """SELECT n_name, COUNT(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_customers DESC, n_name LIMIT 1""".stripMargin,
    "setop_union" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |UNION
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "setop_intersect" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "setop_except" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "setop_intersect_all" ->
      """SELECT o_custkey, COUNT(*) AS multiplicity FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "setop_except_all" ->
      """SELECT o_custkey, COUNT(*) AS multiplicity FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_string_agg" ->
      """SELECT n_regionkey,
        |string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |COUNT(*) AS n
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin,
    "setop_union_all" ->
      """SELECT o_custkey, COUNT(*) AS multiplicity FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_full_outer" ->
      """WITH a AS (SELECT o_custkey AS ck95, COUNT(*) AS n_1995 FROM orders
        |           WHERE year(o_orderdate) = 1995 GROUP BY 1),
        |b AS (SELECT o_custkey AS ck96, COUNT(*) AS n_1996 FROM orders
        |      WHERE year(o_orderdate) = 1996 GROUP BY 1)
        |SELECT COALESCE(ck95, ck96) AS o_custkey,
        |COALESCE(n_1995, 0)::BIGINT AS n_1995,
        |COALESCE(n_1996, 0)::BIGINT AS n_1996,
        |CASE WHEN ck95 IS NULL THEN 'only_1996'
        |     WHEN ck96 IS NULL THEN 'only_1995'
        |     ELSE 'both' END AS presence
        |FROM a FULL OUTER JOIN b ON ck95 = ck96
        |ORDER BY o_custkey""".stripMargin,
    "window_percent_rank" ->
      """SELECT c_nationkey, c_custkey,
        |percent_rank() OVER w AS pct_rank,
        |cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "join_salted" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |  AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_filtered" ->
      """SELECT o_orderpriority,
        |COUNT(*) AS n_orders,
        |COUNT(*) FILTER (WHERE o_totalprice > 200000)::BIGINT AS n_big,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |  FILTER (WHERE year(o_orderdate) = 1995) AS DOUBLE) AS rev_1995
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
