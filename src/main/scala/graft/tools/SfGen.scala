package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native distributed data generator — the bench's true-sf1 tier.
  *
  * Earlier rounds probed scale by replicating the sf0.1 parquet 10x with
  * shifted keys. That gets the ROW COUNT right but replicates PAYLOADS:
  * group-key cardinality, shingle vocabulary and value distributions stay
  * frozen at sf0.1, which flatters distinct-aggregation, dedup-candidate
  * and shuffle-width costs. This generator instead derives every cell from
  * `xxhash64(tag, id, ...)` over a `spark.range` spine: a true sf1
  * (6M-row lineitem, 150k distinct custkeys, 50k genuinely distinct
  * documents) materializes fully distributed, deterministically (no RNG
  * state, so identical across runs and resumable), in seconds, with the
  * exact schema of the driver testdata (TESTDATA.md). At a production
  * scale factor the same spine generates 100 TB without any driver-side
  * step — `spark.range` is already partitioned.
  *
  * Proportions mirror the testdata's own ratios (measured at sf0.1):
  * orders = 10x customer, ~4 lineitem rows per order (1..7 uniform),
  * part/supplier/documents/embeddings/events scaled linearly. Distribution
  * shapes (value ranges, flag frequencies, words-per-doc 10..100) follow
  * the sf0.1 measurements so operator selectivities carry over.
  *
  * Facts are written as `files` range-clustered parquet files on their
  * primary access key — the layout a production ingest leaves behind —
  * so downstream scans parallelize. (A naive single-file write serializes
  * every scan on one core and the probe measures file layout, not the
  * engine; that was the r4 10x-probe layout lesson.)
  *
  * Planted structure, so approximate operators have signal to find:
  *   - documents: every 20th doc repeats the previous doc's text plus one
  *     extra token (a ~95% Jaccard near-duplicate);
  *   - embeddings: 10 hash-derived cluster centers, each vector is
  *     0.6*center + 0.4*noise (IVF/LSH bucketing has real geometry).
  */
object SfGen {

  /** Standalone generation for profiling tools:
    * `sbt "runMain graft.tools.SfGen <dir> [scale] [files]"`. */
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val scale = args.lift(1).map(_.toDouble).getOrElse(1.0)
    val files = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val counts = generate(spark, dir, scale, files)
    println(f"[sfgen] $dir scale=$scale gen=${(System.nanoTime() - t0) / 1e9}%.1fs " +
      counts.toSeq.sortBy(_._1).map { case (t, c) => s"$t=$c" }.mkString(" "))
    spark.stop()
  }

  /** Row counts at scale=1.0 (sf1). */
  private val BASE: Map[String, Long] = Map(
    "customer" -> 150000L, "supplier" -> 10000L, "part" -> 200000L,
    "orders" -> 1500000L, "events" -> 1000000L,
    "documents" -> 50000L, "embeddings" -> 20000L)

  private def hash(tag: String, cols: Column*): Column =
    xxhash64((lit(tag) +: cols): _*)

  /** Deterministic uniform value in [0, n) derived from (tag, cols). */
  private def hmod(tag: String, n: Long, cols: Column*): Column =
    pmod(hash(tag, cols: _*), lit(n))

  /** Integer cents -> 2-decimal double: exact under the engine's
    * cast-to-Decimal(18,2) aggregation strategy (Tables.dec). */
  private def cents(c: Column): Column = c / 100.0

  private def pick(values: Seq[String], idx: Column): Column =
    element_at(array(values.map(lit): _*), (idx + 1).cast(IntegerType))

  private val SEGMENTS =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val PRIORITIES = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val REGIONS =
    Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  private val PTYPES =
    Seq("ECONOMY", "SMALL", "MEDIUM", "PROMO", "LARGE", "STANDARD")
  private val ADJS = Seq("large", "hot", "blue", "old", "cold",
    "small", "fast", "slow", "green", "red")
  private val NOUNS = Seq("ring", "bolt", "plate", "screw", "washer",
    "nut", "gear", "rod", "pin", "cap")
  private val ETYPES = Seq("click", "error", "purchase", "signup", "view")
  // same register as the testdata corpus: short query-engine vocabulary
  private val VOCAB = Seq(
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "vector", "join", "shuffle", "plan", "stage", "task", "node",
    "disk", "cache", "read", "write", "map", "fold", "page")

  /** Generate all ten tables under `dir` ( `$dir/<table>.parquet` — the
    * layout [[graft.Tables.load]] reads). Returns per-table row counts. */
  def generate(spark: SparkSession, dir: String, scale: Double = 1.0,
      files: Int = 32): Map[String, Long] = {
    val n = BASE.map { case (t, b) =>
      t -> math.max(1L, math.round(b * scale))
    }
    val id = col("id")

    def write(df: DataFrame, table: String, clusterKey: Option[String]): Unit = {
      val out = clusterKey match {
        case Some(k) => df.repartitionByRange(files, col(k))
        case None => df.coalesce(1)
      }
      out.write.mode("overwrite").parquet(s"$dir/$table.parquet")
    }

    write(spark.range(5).select(
      id.cast(IntegerType).as("r_regionkey"),
      pick(REGIONS, id).as("r_name")), "region", None)

    write(spark.range(25).select(
      id.cast(IntegerType).as("n_nationkey"),
      concat(lit("NATION_"), id).as("n_name"),
      pmod(id, lit(5)).cast(IntegerType).as("n_regionkey")), "nation", None)

    write(spark.range(n("customer")).select(
      id.as("c_custkey"),
      format_string("Customer#%09d", id).as("c_name"),
      hmod("cn", 25, id).cast(IntegerType).as("c_nationkey"),
      cents(hmod("cb", 1099966, id) - 99985).as("c_acctbal"),
      pick(SEGMENTS, hmod("cs", 5, id)).as("c_mktsegment")),
      "customer", Some("c_custkey"))

    write(spark.range(n("supplier")).select(
      id.as("s_suppkey"),
      format_string("Supplier#%09d", id).as("s_name"),
      hmod("sn", 25, id).cast(IntegerType).as("s_nationkey"),
      cents(hmod("sb", 1099966, id) - 99985).as("s_acctbal")),
      "supplier", Some("s_suppkey"))

    write(spark.range(n("part")).select(
      id.as("p_partkey"),
      concat(pick(ADJS, hmod("pa", 10, id)), lit(" "),
        pick(NOUNS, hmod("pn", 10, id))).as("p_name"),
      concat(lit("Brand#"), hmod("pb", 25, id) + 1).as("p_brand"),
      pick(PTYPES, hmod("pt", 6, id)).as("p_type"),
      (hmod("ps", 50, id) + 1).cast(IntegerType).as("p_size"),
      cents(hmod("pr", 10410000, id) + 90000).as("p_retailprice")),
      "part", Some("p_partkey"))

    // testdata timestamps are parquet NTZ (isAdjustedToUTC=false) — match
    // the type so generated tables are schema-identical to the driver's
    val orderDate = date_add(to_date(lit("1995-01-01")),
      hmod("od", 2404, id).cast(IntegerType))
    write(spark.range(n("orders")).select(
      id.as("o_orderkey"),
      hmod("oc", n("customer"), id).as("o_custkey"),
      pick(Seq("O", "P", "F"), hmod("os", 3, id)).as("o_orderstatus"),
      cents(hmod("ot", 49899128, id) + 100191).as("o_totalprice"),
      orderDate.cast(TimestampNTZType).as("o_orderdate"),
      pick(PRIORITIES, hmod("op", 5, id)).as("o_orderpriority")),
      "orders", Some("o_orderkey"))

    // lineitem: 1..7 lines per order (avg 4, matching the measured sf0.1
    // mean), derived from the order spine so l_orderkey FK holds exactly.
    val ln = col("l_linenumber")
    write(spark.range(n("orders"))
      .select(id, explode(sequence(lit(1),
        (hmod("ol", 7, id) + 1).cast(IntegerType))).as("l_linenumber"))
      .select(
        id.as("l_orderkey"),
        hmod("lp", n("part"), id, ln).as("l_partkey"),
        hmod("ls", n("supplier"), id, ln).as("l_suppkey"),
        ln.as("l_linenumber"),
        (hmod("lq", 50, id, ln) + 1).cast(DoubleType).as("l_quantity"),
        cents(hmod("le", 10409924, id, ln) + 90068).as("l_extendedprice"),
        cents(hmod("ld", 11, id, ln)).as("l_discount"),
        cents(hmod("lt", 9, id, ln)).as("l_tax"),
        pick(Seq("A", "N", "R"), hmod("lr", 3, id, ln)).as("l_returnflag"),
        pick(Seq("O", "F"), hmod("ll", 2, id, ln)).as("l_linestatus"),
        date_add(orderDate.as("d"),
          hmod("lsd", 122, id, ln).cast(IntegerType))
          .cast(TimestampNTZType).as("l_shipdate")),
      "lineitem", Some("l_orderkey"))

    // events.ts is a raw nanosecond long — the LongType branch of
    // Tables.normalizeTs (ts div 1000 -> micros); the driver's own
    // fixtures now ship TIMESTAMP(MICROS), exercising the NTZ branch,
    // so between bench and gate both dispatch arms stay covered.
    val T0 = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z in nanos
    write(spark.range(n("events")).select(
      id.as("event_id"),
      (lit(T0) + hmod("ets", 30L * 86400 * 1000000, id) * 1000L).as("ts"),
      hmod("eu", math.max(1L, n("customer") / 100), id).as("user_id"),
      pick(ETYPES, hmod("ee", 5, id)).as("event_type"),
      cents(hmod("ev", 56022, id)).as("value"),
      format_string("{\"k\": %d}", hmod("ek", 100, id)).as("props")),
      "events", Some("event_id"))

    // documents: text is a pure function of `seed`, so the planted
    // near-duplicate (every 20th doc, seed = previous doc) reconstructs
    // the neighbor's exact token stream and appends one extra token.
    val dup = (pmod(id, lit(20)) === 0) && (id > 0)
    val seed = when(dup, id - 1).otherwise(id)
    // Vocabulary realism (Heaps' law): a FIXED word list makes every
    // gram's document frequency grow linearly with the corpus, so any
    // bucket-join dedup op degrades quadratically at scale — at scale=10
    // the n-gram prefix join spilled >200 GB from gram buckets holding
    // hundreds of docs each, a shape no real corpus has (vocabulary grows
    // ~sqrt(tokens)). Half the tokens draw from the 40-word head (the
    // Zipf head: stopword/marker frequencies stay put, so langid/quality/
    // topk signals are unchanged), half from a tail pool sized
    // ~0.8*sqrt(total tokens), growing with the corpus — gram document
    // frequency stays bounded as the data scales, as in a real corpus.
    val tailPool = math.max(VOCAB.size.toLong,
      math.round(0.8 * math.sqrt(n("documents").toDouble * 55)))
    def baseWord(j: Column) =
      pick(VOCAB, pmod(hash("w", seed, j), lit(VOCAB.size.toLong)))
    val words = transform(
      sequence(lit(1), (hmod("dw", 91, seed) + 10).cast(IntegerType)),
      j => when(pmod(hash("wh", seed, j), lit(2L)) === 0, baseWord(j))
        .otherwise(concat(baseWord(j), lit("_"),
          pmod(hash("wt", seed, j), lit(tailPool)))))
    val baseText = array_join(words, " ")
    val text = when(dup, concat(baseText, format_string(" extra%d", id)))
      .otherwise(baseText)
    write(spark.range(n("documents")).select(
      id.as("doc_id"),
      text.as("text"),
      pick(Seq("en", "en", "en", "en", "en", "en", "de", "es", "zh", "fr"),
        hmod("dl", 10, id)).as("lang"),
      concat(lit("src"), hmod("ds", 20, id)).as("source"),
      length(text).cast(LongType).as("n_chars")),
      "documents", Some("doc_id"))

    // embeddings: 0.6*center(label) + 0.4*noise(id) per coordinate — ten
    // real clusters in [-1,1]^64 so IVF/LSH bucketing has geometry to use.
    val label = hmod("el", 10, id)
    def unit(tag: String, k: Column, j: Column): Column =
      (pmod(hash(tag, k, j), lit(2001L)) - 1000L) / 1000.0
    val embedding = transform(sequence(lit(0), lit(63)), j =>
      (unit("ec", label, j) * 0.6 + unit("en", id, j) * 0.4)
        .cast(FloatType))
    write(spark.range(n("embeddings")).select(
      id.as("vec_id"),
      embedding.as("embedding"),
      label.cast(IntegerType).as("label")),
      "embeddings", Some("vec_id"))

    n ++ Map("region" -> 5L, "nation" -> 25L)
  }
}
