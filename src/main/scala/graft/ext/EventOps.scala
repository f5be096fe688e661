package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Event-stream-shaped operators over the `events` table, run as batch
  * event-time processing (the reference has no streaming surface —
  * SURVEY §2.8; the Structured Streaming path over the same parquet is
  * exercised in the test suite with identical semantics).
  *
  * Scale notes: tumbling windows group on a derived time bucket — a single
  * hash shuffle; sessionization is one shuffle on user_id with an
  * in-partition sort, the canonical "gap > threshold" cumulative-flag
  * formulation (no iterative driver loop).
  */
object EventOps {

  type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-hour event-time windows: count / exact sum / exact avg per
    * (window, event_type). `window().start` equals `date_trunc('hour')` for
    * tumbling windows, which is the oracle formulation. */
  def eventsWindowTumbling(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        exactSum(col("value")).as("sum_value"),
        exactAvg(col("value")).as("avg_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"), col("avg_value"))
      .orderBy("hour_start", "event_type")

  /** Sessionization: a new session starts when the gap since the user's
    * previous event exceeds 30 minutes; session id = running count of
    * session starts. One shuffle (user_id), sort within partition. */
  def eventsSessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = load(s, d, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        exactSum(col("value")).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  /** Time-series gap filling: the dense hourly spine per event_type
    * (min..max hour, missing hours as explicit zero rows) — the step
    * every downstream moving-average or chart query needs. The spine is
    * generated DISTRIBUTED: per-type min/max from one aggregate, then
    * `sequence` + `explode` materializes hours on the executors (no
    * driver-side date loop), and a left join against the hourly counts
    * fills the gaps. Spine size is |types| x |hours| — dimension-scale
    * even when the event table is 100 TB. */
  def eventsGapFill(s: SparkSession, d: String): DataFrame = {
    val hours = load(s, d, "events")
      .select(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
    val hourly = hours.groupBy("event_type", "hour_start")
      .agg(count(lit(1)).as("n"))
    val spine = hours.groupBy("event_type")
      .agg(min(col("hour_start")).as("h0"), max(col("hour_start")).as("h1"))
      .select(col("event_type"), explode(
        sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour_start"))
    spine.join(hourly, Seq("event_type", "hour_start"), "left")
      .select(col("hour_start"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("hour_start", "event_type")
  }

  /** Gaps-and-islands: maximal runs of consecutive same-type events per
    * user (the classic streak/segment detection every behavioral pipeline
    * needs). Island key = global row_number minus per-type row_number —
    * constant exactly within a consecutive run — computed in two window
    * passes over ONE user_id shuffle (the partition orderings nest), then
    * one aggregate per island. */
  def eventsIslands(s: SparkSession, d: String): DataFrame = {
    val all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val byType = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    load(s, d, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        (row_number().over(all) - row_number().over(byType)).as("island"))
      .groupBy("user_id", "event_type", "island")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("island_start"),
        max(col("ts")).as("island_end"))
      .select("user_id", "event_type", "island_start", "island_end", "n_events")
      .orderBy("user_id", "island_start", "event_type")
  }

  /** First-order Markov transition matrix over per-user event-type
    * sequences — the path-analysis primitive behind "what do users do
    * next" readouts. One user-keyed window builds consecutive pairs
    * (lag chain), then the matrix is a tiny |types|² rollup; transition
    * probability is one exact-long division per cell. The per-user
    * window is the only corpus-scale shuffle, and it is keyed — no
    * global sort anywhere. */
  def eventsMarkovTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val trans = load(s, d, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy("from_type").agg(sum("n").as("n_from"))
    trans.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("n_from").cast("double"), 9)
          .as("p"))
      .orderBy("from_type", "to_type")
  }

  /** JSON property extraction from the `props` column (semi-structured
    * payload — standard event-pipeline surface). */
  def eventsJsonExtract(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .groupBy((col("k_val") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k_val")).as("sum_k"))
      .orderBy("k_bucket")

  /** The tumbling aggregation as a REAL Structured Streaming query (file
    * source, watermark, memory sink, drained to completion) — proves the
    * stream/batch semantic equivalence through the driver gate: the oracle
    * is the same batch SQL. */
  def eventsStreamTumbling(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StreamingOps
    StreamingOps.runToCompletion(s,
        StreamingOps.tumblingAgg(StreamingOps.eventsStream(s, d)),
        "verify_stream_tumbling")
      .select("hour_start", "event_type", "n", "sum_value")
      .orderBy("hour_start", "event_type")
  }

  /** Native session windows in batch (session_window(ts, gap)) — the
    * built-in counterpart of [[eventsSessionize]]'s cumulative-flag
    * formulation. Boundary semantics differ deliberately: session extent
    * is [first, last + gap) and an event at exactly gap distance starts a
    * NEW session (half-open window), which the oracle replays with >=. */
  def eventsSessionWindow(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StreamingOps
    StreamingOps.sessionWindowAgg(load(s, d, "events"))
      .orderBy("user_id", "session_start")
  }

  /** The same session-window aggregation as a REAL Structured Streaming
    * query: flush-sentinel source so the watermark closes every session,
    * append mode (finalized sessions only), memory sink. Same oracle as
    * the batch form — stream/batch parity for merging session state. */
  def eventsStreamSession(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StreamingOps
    val src = StreamingOps.eventsStreamWithFlush(s, d)
      .withWatermark("ts", "1 second")
    StreamingOps.runToCompletion(s, StreamingOps.sessionWindowAgg(src),
        "verify_stream_session", mode = "append")
      .filter(col("user_id") >= 0) // drop the sentinel's own session
      .orderBy("user_id", "session_start")
  }

  /** Per-user funnel progression as a REAL Structured Streaming query:
    * the [[graft.streaming.StreamingOps.funnelStream]] state machine
    * over a 4-micro-batch time-ordered arrival replay, so funnel state
    * genuinely carries across batches (a user's view can land three
    * batches before their purchase). Emits one conversion record per
    * converted user; the oracle replays the same first-view ->
    * first-later-click -> first-later-purchase MIN-chain in SQL. */
  def eventsStreamFunnel(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StreamingOps
    StreamingOps.runToCompletion(s,
        StreamingOps.funnelStream(StreamingOps.eventsStreamChunked(s, d)).toDF(),
        "verify_stream_funnel", mode = "append")
      .orderBy("user_id")
  }

  /** Sliding windows over the stream (1 hour every 15 minutes) — each
    * event feeds four windows' state; oracle shared with the batch
    * sliding query. */
  def eventsStreamSliding(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StreamingOps
    StreamingOps.runToCompletion(s,
        StreamingOps.slidingAgg(StreamingOps.eventsStream(s, d)),
        "verify_stream_sliding")
      .orderBy("win_start", "event_type")
  }

  /** Stream-stream attribution join (purchases x clicks within 30
    * minutes), drained through the gate; inner joins emit in append mode
    * as matches arrive, so a plain drain completes the bounded stream. */
  def eventsStreamJoin(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StreamingOps
    StreamingOps.runToCompletion(s,
        StreamingOps.clickAttributionJoin(StreamingOps.eventsStream(s, d)),
        "verify_stream_join", mode = "append")
      .orderBy("event_id", "click_ts")
  }

  /** Stream-static enrichment join — the dimension-lookup every streaming
    * pipeline runs: the event stream joins a STATIC tier dimension (re-read
    * per micro-batch, broadcast by size), then aggregates per tier. The
    * drained result must equal the batch join + aggregation, which is what
    * the oracle computes. */
  def eventsStreamStaticJoin(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StreamingOps
    val tiers = load(s, d, "events").select(col("user_id")).distinct()
      .withColumn("tier", concat(lit("tier_"), col("user_id") % 3))
    val joined = StreamingOps.eventsStream(s, d)
      .join(tiers, "user_id")
      .groupBy("tier")
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_value"))
    StreamingOps.runToCompletion(s, joined, "verify_stream_static")
      .orderBy("tier")
  }

  /** Streaming deduplication: two copies of the stream unioned (every
    * event genuinely duplicated), dropDuplicates on the event key with a
    * watermark bounding the dedup state, then aggregated — the drained
    * result must equal the batch aggregation over the SINGLE copy, which
    * is exactly what the oracle computes. */
  def eventsStreamDedup(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StreamingOps
    val doubled = StreamingOps.eventsStream(s, d)
      .unionByName(StreamingOps.eventsStream(s, d))
      .withWatermark("ts", "2 hours")
      .dropDuplicates("event_id")
    val agg = doubled.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_value"))
    StreamingOps.runToCompletion(s, agg, "verify_stream_dedup")
      .orderBy("event_type")
  }

  /** Streaming-maintained MV through the driver gate: 4 time-ordered
    * micro-batches upsert their hourly-aggregate deltas into a persisted
    * parquet MV (StreamingOps.streamingMatviewRefresh); the final MV must
    * equal the batch aggregation over ALL events — proving the per-batch
    * merges compose to the full relation. */
  def matviewStreamRefresh(s: SparkSession, d: String): DataFrame =
    graft.streaming.StreamingOps.streamingMatviewRefresh(s, d)

  /** Late-data semantics through the driver gate: 100 genuinely-late
    * duplicate events (below the watermark) stream through the update-
    * mode aggregation and must ALL be dropped — the final MV equals the
    * on-time aggregation (see StreamingOps.streamingLateDrop). */
  def eventsStreamLateDrop(s: SparkSession, d: String): DataFrame =
    graft.streaming.StreamingOps.streamingLateDrop(s, d)

  /** Ordered conversion funnel view -> click -> purchase: each user's
    * first view, first click strictly AFTER that view, first purchase
    * strictly after that click; per-stage distinct-user counts with the
    * conversion ratio against the entry stage. Every shuffle is keyed on
    * user_id (filter + per-user min, then a user-keyed join per stage) —
    * the standard n-stage funnel plan, no all-pairs or window-over-all
    * step, so it holds at 100 TB. The final ratio divides two exact longs
    * in one IEEE step (deterministic across engines). */
  /** Multi-touch attribution — the marketing-analytics companion to
    * [[eventsFunnel]]: each purchase's value is credited to the user's
    * preceding touch events (view/click) inside a 7-day lookback, under
    * the three standard models — first_touch (all credit to the earliest
    * touch), last_touch (latest), linear (equal split across touches).
    * Purchases with no in-window touch report as `none` per model, so
    * the total credited mass is conserved and auditable.
    *
    * Determinism: per-credit amounts quantize to e6 longs
    * (round(value * 1e6 / n) on the 2-dec money value — identical
    * doubles, identical rounding in both engines), so every aggregation
    * is exact integer arithmetic; first/last pick by (ts, event_id)
    * struct order, replayed as ROW_NUMBER in the oracle.
    *
    * 100 TB shape: ONE (user, day-bucket)-keyed equi-join co-partitions
    * purchases and touches ([[touchWindowPairs]] — the day bucket in
    * the key bounds a whale user's per-task fan-out; the exact 7-day
    * window stays a join-condition filter, not a time-range explosion);
    * per-purchase extremes and counts fold in a single aggregation with
    * map-side combine; the model outputs are touch-type-sized rollups.
    * No event-stream windows anywhere. */
  /** The purchases ⋈ touches lookback join with a hot-user fan-out
    * guard. Joining on `user_id` alone makes one power-law "whale"
    * user's pair count quadratic inside a single task (10⁴ touches x
    * 10³ purchases = 10⁷ rows through one hash cell) — the one
    * data-dependent skew hazard every other hot-key-exposed operator in
    * the tree already guards. The guard: add the touch's UTC
    * [[ATTR_BUCKET_DAYS]]-day bucket to the equi-join key. The purchase
    * side replicates into every bucket its 7-day lookback overlaps
    * while a whale's pair work both spreads across its active buckets
    * and shrinks per cell to (touches that bucket) x (purchases probing
    * it); the width constant prices replication volume against the
    * per-cell bound (see its doc). The pair SET is unchanged: each
    * touch lives in exactly one bucket, each (purchase, touch) pair
    * meets only in the touch's bucket, and the exact window predicate
    * still runs — so the oracle (a plain windowed join) replays
    * identically. Whale bound pinned by ExtrasSpec's planted-whale
    * fixture. */
  /** Bucket width (days) for the lookback join key. The trade (r17
    * optimization round): a purchase's 7-day lookback spans 8 calendar
    * days, so with width b it replicates to ceil spans of at most
    * floor(pday/b) - floor((pday-7)/b) + 1 <= ceil(7/b) + 1 buckets —
    * x8 at b=1, x3 at b=4 — while a whale's per-cell fan-out grows with
    * b (touches in b days x purchases probing the bucket). Purchases
    * are HALF the touch count on this corpus shape, so at b=1 the
    * replicated purchase side outweighed the touch side 4:1 (16M vs 4M
    * rows at the sf10 tier) — the join shuffled more guard replicas
    * than data. b=4 halves the shuffled rows and keeps the whale bound
    * within 4x of the per-day guard (ExtrasSpec's planted-whale fixture
    * still pins an order-of-magnitude cut vs the user-only join).
    * Measured (ProfKey, interleaved same-box A/B, best-of-3): sf1
    * 3.60 -> 2.99, sf10 9.27 -> 8.61. */
  private[graft] val ATTR_BUCKET_DAYS = 4

  private[graft] def touchWindowPairs(
      purchases: DataFrame, touches: DataFrame): DataFrame = {
    val b = ATTR_BUCKET_DAYS
    val pb = purchases.withColumn("__bk",
      explode(expr("sequence((unix_timestamp(p_ts) div 86400 - 7) div " +
        s"$b, unix_timestamp(p_ts) div 86400 div $b)")))
    val tb = touches.withColumn("__bk",
      expr(s"unix_timestamp(t_ts) div 86400 div $b"))
    pb.join(tb, Seq("user_id", "__bk"))
      .filter(col("t_ts") <= col("p_ts") &&
        col("t_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS"))
      .drop("__bk")
  }

  def eventsAttribution(s: SparkSession, d: String): DataFrame = {
    val e = load(s, d, "events")
    val vdec = dec(col("value")).cast("double")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"), vdec.as("p_value"))
    val touches = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts").as("t_ts"),
        col("event_type").as("touch_type"), col("event_id").as("t_id"))
    val joined = touchWindowPairs(purchases, touches)
    // ONE aggregation collapses the events-scale join output to a
    // purchase-sized relation carrying everything every model needs —
    // including per-type touch counts, because linear's equal-split
    // credit is IDENTICAL for every touch of a purchase, so the
    // per-type linear sum is n_type * round(value*1e6/n). The naive
    // formulation re-executed the join for the linear model (its only
    // events-scale consumer); deriving it here cut the key 4.0s ->
    // 2.6s at sf1 and the join now runs exactly once.
    val per = joined.groupBy("p_id", "p_value")
      .agg(count(lit(1)).as("n_touch"),
        min(struct(col("t_ts"), col("t_id"), col("touch_type")))
          .as("first_t"),
        max(struct(col("t_ts"), col("t_id"), col("touch_type")))
          .as("last_t"),
        count(when(col("touch_type") === "view", 1)).as("n_view"),
        count(when(col("touch_type") === "click", 1)).as("n_click"))
      // purchase-sized, four consumers (first/last/linear/anti-join)
      .localCheckpoint()
    def model(name: String, t: org.apache.spark.sql.Column) = per
      .groupBy(t.as("touch_type"))
      .agg(count(lit(1)).as("n_credits"),
        sum(round(col("p_value") * lit(1000000.0)).cast("long"))
          .as("credited_e6"))
      .withColumn("model", lit(name))
    val credit = round(col("p_value") * lit(1000000.0) / col("n_touch"))
      .cast("long")
    val linear = Seq("view", "click").map { t =>
      per.filter(col(s"n_$t") > 0)
        .agg(sum(col(s"n_$t")).as("n_credits"),
          sum(col(s"n_$t") * credit).as("credited_e6"))
        .withColumn("touch_type", lit(t))
    }.reduce(_ unionByName _)
      // an empty filtered side still emits its one global-agg row
      .filter(col("n_credits").isNotNull)
      .withColumn("model", lit("linear"))
    // aggregate the unattributed remainder ONCE and fan out to the
    // three model rows with a 3-row literal frame (the oracle's
    // un CROSS JOIN VALUES shape) — a per-model map would embed the
    // events-scan anti-join subtree three times in the final plan.
    // The n_credits > 0 filter drops the one row a global agg still
    // emits over an empty anti-join, so `none` rows appear only when
    // unattributed purchases exist (the oracle's HAVING count(*) > 0)
    val unattributed = purchases
      .join(per.select("p_id"), Seq("p_id"), "left_anti")
      .agg(count(lit(1)).as("n_credits"),
        sum(round(col("p_value") * lit(1000000.0)).cast("long"))
          .as("credited_e6"))
      .withColumn("touch_type", lit("none"))
      .filter(col("n_credits") > 0)
    val modelNames = {
      import s.implicits._
      Seq("first_touch", "last_touch", "linear").toDF("model")
    }
    val un3 = unattributed.crossJoin(modelNames)
    model("first_touch", col("first_t.touch_type"))
      .unionByName(model("last_touch", col("last_t.touch_type")))
      .unionByName(linear).unionByName(un3)
      .select(col("model"), col("touch_type"), col("n_credits"),
        round(col("credited_e6").cast("double") / lit(1000000.0), 6)
          .as("credited"))
      .orderBy("model", "touch_type")
  }

  /** RFM segmentation — the classic mart rollup: per purchasing user,
    * Recency (days since last purchase vs the corpus max), Frequency
    * (purchase count), Monetary (exact 2-dec spend); each metric cut
    * into quintiles (tile 1 = best: most recent / most frequent /
    * biggest spender), then the 5x5x5 segment grid rolled up.
    *
    * The scale point is the quintile cut: a global NTILE window is a
    * single-partition sort over every user — the trap the two-phase
    * [[graft.operators.Ranks.rowNumberByRange]] exists for. Three
    * chained range-partitioned rank passes (metric, user_id total
    * order) give global row numbers with no global window; the tile is
    * then pure integer arithmetic `(rn-1)*5 div n`, replayed verbatim
    * by the oracle (documented: this spreads remainders evenly, unlike
    * SQL NTILE's front-loading — the formula IS the contract). */
  def eventsRfm(s: SparkSession, d: String): DataFrame = {
    val e = load(s, d, "events")
    val per = e.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(max(col("ts")).as("last_ts"),
        count(lit(1)).as("frequency"),
        exactSum(col("value")).as("monetary"))
    val scal = per.agg(max(col("last_ts")).as("max_ts"),
      count(lit(1)).as("n"))
    val base = per.crossJoin(broadcast(scal))
      .withColumn("recency_days",
        datediff(to_date(col("max_ts")), to_date(col("last_ts"))))
    val ranked = Seq(
      ("r_rn", Seq(col("recency_days").asc, col("user_id").asc)),
      ("f_rn", Seq(col("frequency").desc, col("user_id").asc)),
      ("m_rn", Seq(col("monetary").desc, col("user_id").asc)))
      .foldLeft(base) { case (df, (out, order)) =>
        graft.operators.Ranks.rowNumberByRange(df, 32, order, out)
      }
    ranked
      .withColumn("r_tile", expr("((r_rn - 1) * 5) div n + 1"))
      .withColumn("f_tile", expr("((f_rn - 1) * 5) div n + 1"))
      .withColumn("m_tile", expr("((m_rn - 1) * 5) div n + 1"))
      .groupBy("r_tile", "f_tile", "m_tile")
      .agg(count(lit(1)).as("n_users"),
        exactSum(col("monetary")).as("total_monetary"))
      .orderBy("r_tile", "f_tile", "m_tile")
  }

  def eventsFunnel(s: SparkSession, d: String): DataFrame = {
    val e = load(s, d, "events")
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .join(views, "user_id")
      .filter(col("ts") > col("view_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .join(clicks, "user_id")
      .filter(col("ts") > col("click_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"))
    val staged = views.select(lit("1_view").as("stage"), col("user_id"))
      .unionByName(clicks.select(lit("2_click").as("stage"), col("user_id")))
      .unionByName(
        purchases.select(lit("3_purchase").as("stage"), col("user_id")))
      .groupBy("stage").agg(count(lit(1)).as("users"))
    // entry size as a broadcast 1-row scalar — the view-stage count (the
    // later stages are per-user filtered subsets of it, so it equals
    // max(users) over the stages) — instead of a window over the 3-row
    // stage relation: the global-window form re-executed a
    // SinglePartition stage ~20x per run under AQE and was the last
    // "No Partition Defined" warning source in the bench log
    staged.crossJoin(broadcast(views.agg(count(lit(1)).as("__entry"))))
      .withColumn("pct_of_entry",
        col("users").cast("double") / col("__entry").cast("double"))
      .drop("__entry")
      .orderBy("stage")
  }

  /** Cohort retention: users cohorted by first-seen day, then distinct
    * active users per (cohort_day, day_offset). Two user-keyed shuffles
    * (cohort assignment, then the distinct) plus one small cohort-keyed
    * aggregation — the cohort matrix is |days|² rows regardless of event
    * volume, so the output never explodes with scale. */
  def eventsRetention(s: SparkSession, d: String): DataFrame = {
    val e = load(s, d, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = e.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    e.join(cohort, "user_id")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("active_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Hourly anomaly detection per event type — the ops-analytics alerting
    * rule (|z| > 3 on hourly event counts) over the same rollup the
    * tumbling-window key produces. Every hour is emitted with its z-score
    * and flag, so the output hashes the whole decision surface, not just
    * the (possibly empty) anomaly set.
    *
    * Exactness: the per-type moments are exact long sums (hours, Σc, Σc²
    * — counts are integers, so the squares are exact), variance is ONE
    * double division of two exact longs (sample variance,
    * `(n·Σc² - (Σc)²) / (n·(n-1))`), and z is left-associated double
    * arithmetic rounded to 6 (the sqrt runs on identical inputs in both
    * engines; round 6 absorbs ulp — the stat_corr contract). A zero
    * variance yields z = 0 identically in both engines.
    *
    * Shape: the hourly rollup shuffles (type, hour) with map-side partial
    * aggregation; the per-type moment relation (|types| rows) BROADCASTS
    * back, so scoring is a map-side projection — at 100 TB the only
    * corpus-scale movement is the rollup shuffle, and the output is
    * bounded by hours × types, not event volume. */
  def eventsAnomaly(s: SparkSession, d: String): DataFrame = {
    val hourly = load(s, d, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"))
    val stats = hourly.groupBy("event_type").agg(
      count(lit(1)).as("n_hours"),
      sum(col("n")).as("s"),
      sum(col("n") * col("n")).as("ssq"))
    hourly.join(broadcast(stats), "event_type")
      .withColumn("mean",
        col("s").cast("double") / col("n_hours").cast("double"))
      .withColumn("variance",
        (col("n_hours") * col("ssq") - col("s") * col("s")).cast("double") /
          (col("n_hours") * (col("n_hours") - lit(1L))).cast("double"))
      .withColumn("z",
        // n_hours > 1 guards the n=1 sample variance, which is 0/0 =
        // NaN — and NaN > 0.0 is TRUE under BOTH engines' NaN-greatest
        // orderings, so without the guard both sides emit a NaN z that
        // hash-compares unequal (r13 review finding). A single-hour
        // type has no variance evidence: z = 0, not-anomalous, defined.
        when(col("n_hours") > 1 && col("variance") > 0.0,
          round((col("n").cast("double") - col("mean")) /
            sqrt(col("variance")), 6))
          .otherwise(lit(0.0)))
      .select(col("event_type"), col("hour_start"), col("n"),
        round(col("mean"), 6).as("mean_hourly"), col("z"),
        (abs(col("z")) > lit(3.0)).as("is_anomaly"))
      .orderBy("event_type", "hour_start")
  }

  /** Classical additive seasonal decomposition of the daily revenue
    * series: y = trend + seasonal + residual, with trend the centered
    * 7-day moving average (defined only on full windows — the first and
    * last 3 days emit NULL trend/resid, the textbook contract), the
    * seasonal component the per-day-of-week mean of the detrended
    * series normalized over days WITH trend, and dow computed as
    * epoch_days mod 7 so both engines derive it identically (SQL
    * dayofweek() numbering differs between dialects).
    *
    * Exactness: everything stays DECIMAL until the last step — the
    * detrended series is kept as d7 = 7*y - sum7 (exact, x7 to avoid a
    * decimal division), and the only float ops are the mirrored final
    * casts/divisions, rounded at 6dp like the rest of the stats family.
    *
    * Scale shape: the events-scale work is ONE day-bucket rollup; the
    * window and the dow rollup run over |days| rows (thousands at any
    * corpus age), so the global-ordered window is a deliberate non-cost
    * — the same reasoning the repo's Ranks two-phase machinery exists to
    * apply where |keys| ~ |rows|, recorded here as its inverse. */
  def eventsSeasonalDecompose(s: SparkSession, d: String): DataFrame = {
    val daily = load(s, d, "events")
      .groupBy(to_date(col("ts")).as("ev_day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("y_dec"))
    val w = Window.orderBy("ev_day").rowsBetween(-3, 3)
    val t = daily
      .withColumn("sum7", sum(col("y_dec")).over(w))
      .withColumn("cnt7", count(lit(1)).over(w))
      .withColumn("trend",
        when(col("cnt7") === 7, round(col("sum7").cast("double") / 7.0, 6)))
      .withColumn("d7", lit(7) * col("y_dec") - col("sum7"))
      .withColumn("dow", pmod(unix_date(col("ev_day")).cast("long"), lit(7L)))
    val seas = t.filter(col("cnt7") === 7)
      .groupBy("dow")
      .agg(sum(col("d7")).as("snum"), count(lit(1)).as("scnt"))
      .withColumn("seasonal", round(col("snum").cast("double") /
        (lit(7.0) * col("scnt").cast("double")), 6))
      .select("dow", "seasonal")
    t.join(broadcast(seas), Seq("dow"), "left")
      .select(col("ev_day"),
        col("y_dec").cast("double").as("y"),
        col("trend"),
        col("seasonal"),
        round(col("y_dec").cast("double") - col("trend") - col("seasonal"), 6)
          .as("resid"))
      .orderBy("ev_day")
  }

  /** CUSUM changepoint detection per event type over the daily value
    * series: the classic offline single-changepoint estimator — the day
    * k maximizing |S_k| where S_k = prefix_k - (k/n)*total, the
    * cumulative deviation from the grand mean. Everything is EXACT: the
    * statistic is kept cross-multiplied as S'_k = n*prefix_k - k*total
    * (DECIMAL — same argmax as S_k, no division until the end), ties
    * break to the earliest day, the final day is excluded (S'_n = 0
    * identically). Emits the changepoint plus the exact-decimal
    * pre/post means and their shift, rounded 6dp at the cast like the
    * stats family.
    *
    * Scale shape: the events-scale work is ONE (type, day) rollup; the
    * prefix window and argmax run over |types| x |days| rows (hundreds
    * at any corpus age — the deliberate inverse of the Ranks rule, same
    * as the seasonal key). */
  def eventsChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = load(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("ev_day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("y"))
    val byType = Window.partitionBy("event_type").orderBy("ev_day")
    val pre = daily
      .withColumn("k", row_number().over(byType).cast("long"))
      .withColumn("prefix", sum(col("y")).over(byType))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("total", sum(col("y")).over(Window.partitionBy("event_type")))
      .filter(col("k") < col("n"))
      .withColumn("s_scaled", col("n") * col("prefix") - col("k") * col("total"))
    val best = Window.partitionBy("event_type")
      .orderBy(abs(col("s_scaled")).desc, col("ev_day").asc)
    pre
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("ev_day").as("cp_day"),
        round(col("prefix").cast("double") / col("k").cast("double"), 6)
          .as("pre_mean"),
        round((col("total") - col("prefix")).cast("double") /
          (col("n") - col("k")).cast("double"), 6).as("post_mean"),
        round((col("total") - col("prefix")).cast("double") /
            (col("n") - col("k")).cast("double") -
          col("prefix").cast("double") / col("k").cast("double"), 6)
          .as("mean_shift"))
      .orderBy("event_type")
  }

  /** Seasonal-naive forecast backtest per event type: forecast(day) =
    * value(day - 7) — the standard baseline every fancier forecaster must
    * beat — evaluated over each type's last 7 observed days. Errors stay
    * exact DECIMAL through the fold (SUM |y - yhat|, SUM (y - yhat));
    * the only float ops are the final mirrored divisions, rounded 6dp.
    * Backtest days whose lag day is absent are excluded by the inner
    * lag join (none at the gate SF — the generator is day-dense).
    *
    * Scale shape: one (type, day) rollup at events scale; the lag join
    * and the backtest fold run over |types| x |days| rows. */
  def eventsForecastBacktest(s: SparkSession, d: String): DataFrame = {
    val daily = load(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("ev_day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("y"))
    val mx = daily.groupBy("event_type").agg(max(col("ev_day")).as("mxd"))
    daily.as("a")
      .join(mx, Seq("event_type"))
      .filter(col("ev_day") > date_sub(col("mxd"), 7))
      .join(daily.as("f"),
        col("a.event_type") === col("f.event_type") &&
        col("f.ev_day") === date_sub(col("a.ev_day"), 7))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(count(lit(1)).as("n_backtest"),
        sum(abs(col("a.y") - col("f.y"))).as("sum_abs"),
        sum(col("a.y") - col("f.y")).as("sum_diff"))
      .select(col("event_type"), col("n_backtest"),
        round(col("sum_abs").cast("double") /
          col("n_backtest").cast("double"), 6).as("mae"),
        round(col("sum_diff").cast("double") /
          col("n_backtest").cast("double"), 6).as("bias"))
      .orderBy("event_type")
  }

  /** CDC change-log application — the "apply a day of changes to the
    * serving table" operator downstream of any log-structured ingest:
    * events are read as per-user change records (the LAST event per user
    * wins; `error` means delete, anything else upserts the user's state
    * to that event's value), applied to the customer base relation in
    * one pass. Emits the resulting table plus each row's applied-change
    * count (0 = untouched base row).
    *
    * Scale shape: last-writer-wins per key is an ARG-MAX — a packed
    * struct max inside a keyed aggregate (ts leads the struct, event_id
    * breaks ties; no window over the change stream) — and application
    * is one keyed full-outer join. Cost is O(|changes| + |base|) with
    * two keyed shuffles, never a sort of either relation: exactly the
    * contract that lets a 100 TB base absorb a day's log. Inserts
    * (change key absent from base) and deletes both fall out of the
    * full-outer + filter. */
  def eventsCdcApply(s: SparkSession, d: String): DataFrame = {
    val last = load(s, d, "events")
      .groupBy(col("user_id").as("k"))
      .agg(
        max(struct(col("ts"), col("event_id"),
          col("event_type").as("t"), col("value").as("v"))).as("last"),
        count(lit(1)).as("nch"))
      .select(col("k"), col("last.t").as("op_type"),
        col("last.v").as("new_val"), col("nch"))
    val base = load(s, d, "customer")
      .select(col("c_custkey").cast("long").as("ck"), col("c_acctbal"))
    base.join(last, col("ck") === col("k"), "full_outer")
      .filter(col("op_type").isNull || col("op_type") =!= "error")
      .select(
        coalesce(col("ck"), col("k")).as("custkey"),
        when(col("op_type").isNotNull, col("new_val"))
          .otherwise(col("c_acctbal")).as("balance"),
        coalesce(col("nch"), lit(0L)).as("n_changes"))
      .orderBy("custkey")
  }

  /** Poisson-bootstrap confidence intervals — THE resampling scheme that
    * works at corpus scale (used for exactly this reason in large-scale
    * A/B systems): classical bootstrap needs B passes drawing n rows
    * WITH replacement (a global operation per resample); the Poisson
    * approximation instead gives every row an independent Poisson(1)
    * weight per resample, so all B resamples compute in ONE pass over
    * the data as a keyed aggregate of weighted sums. Here: B = 64
    * resamples of the per-event-type mean value, CI = the (2nd, 63rd)
    * order statistics of the resample means (~95%).
    *
    * Determinism contract: the "random" weight is the inverse Poisson
    * CDF applied to the 52-bit md5 fraction of "b:event_id"
    * ([[graft.Tables.md5Bucket]]) — any engine reproduces every weight,
    * so the oracle replays the whole bootstrap bit-exactly (CDF
    * threshold literals shared verbatim with the SQL). Arithmetic:
    * weighted sums fold in exact long cents; each resample mean is ONE
    * long/long IEEE division; the CI picks (never interpolates) sorted
    * doubles. Scale shape: the B-fold explode is row-local; the only
    * shuffles are the (type, b) aggregate — 5·64 groups — and the 5-row
    * final fold. */
  def statBootstrapCi(s: SparkSession, d: String): DataFrame = {
    val B = 64
    val ev = load(s, d, "events").select(col("event_type"), col("event_id"),
      (dec(col("value")) * 100).cast("long").as("cents"))
    val rs = ev
      .select(col("event_type"), col("event_id"), col("cents"),
        explode(sequence(lit(0), lit(B - 1))).as("b"))
      .withColumn("u", md5Bucket(concat(col("b").cast("string"), lit(":"),
        col("event_id").cast("string")), 13).cast("double")
        / lit(4503599627370496.0)) // / 16^13: uniform in [0, 1)
      .withColumn("w",
        when(col("u") < 0.36787944117144233, 0L)
          .when(col("u") < 0.7357588823428847, 1L)
          .when(col("u") < 0.9196986029286058, 2L)
          .when(col("u") < 0.9810118431238462, 3L)
          .when(col("u") < 0.9963401531726562, 4L)
          .otherwise(5L))
    // An all-zero-weight resample (every row of a (type, b) cell draws
    // Poisson weight 0 — P ~ 0.37^n per cell, astronomically improbable
    // at any gated SF but previously UNDEFINED) has no mean: 0/0 folds a
    // NaN whose hash differs per engine. Defined behavior (r13 VERDICT
    // item 7): the degenerate resample DROPS from the CI order
    // statistics on both sides (oracle: HAVING SUM(w) > 0); with fewer
    // than 63 surviving resamples element_at/list[63] read NULL in both
    // engines, so even the extreme tail stays aligned.
    val means = rs.groupBy(col("event_type"), col("b"))
      .agg(sum(col("w") * col("cents")).as("ws"), sum(col("w")).as("wn"))
      .filter(col("wn") > 0)
      .select(col("event_type"),
        (col("ws").cast("double") / (col("wn") * 100).cast("double")).as("m"))
    // try_element_at, not element_at: with dropped degenerate resamples
    // the list can hold < 63 entries, where DuckDB's ms[63] reads NULL
    // but ANSI element_at THROWS — the spec's 1-event corpus (45
    // survivors) caught exactly this divergence
    val ci = means.groupBy("event_type")
      .agg(sort_array(collect_list(col("m"))).as("ms"))
      .select(col("event_type"),
        try_element_at(col("ms"), lit(2)).as("ci_lo"),
        try_element_at(col("ms"), lit(63)).as("ci_hi"))
    val point = ev.groupBy("event_type")
      .agg((sum(col("cents")).cast("double")
        / (count(lit(1)) * 100).cast("double")).as("mean_value"),
        count(lit(1)).as("n_events"))
    point.join(ci, "event_type")
      .select(col("event_type"), col("n_events"), col("mean_value"),
        col("ci_lo"), col("ci_hi"))
      .orderBy("event_type")
  }

  /** Streaming CDC through the driver gate: the chunked change stream
    * applied batch-by-batch (StreamingOps.streamingCdcApply) must yield
    * the same table as the one-shot batch apply — same oracle SQL. */
  def eventsStreamCdc(s: SparkSession, d: String): DataFrame =
    graft.streaming.StreamingOps.streamingCdcApply(s, d)

  val entries: Map[String, Q] = Map(
    "events_cdc_apply"      -> (eventsCdcApply _),
    "events_stream_cdc"     -> (eventsStreamCdc _),
    "stat_bootstrap_ci"     -> (statBootstrapCi _),
    "events_anomaly"         -> (eventsAnomaly _),
    "events_funnel"          -> (eventsFunnel _),
    "events_attribution"     -> (eventsAttribution _),
    "events_rfm"             -> (eventsRfm _),
    "events_retention"       -> (eventsRetention _),
    "events_stream_late_drop" -> (eventsStreamLateDrop _),
    "matview_stream_refresh" -> (matviewStreamRefresh _),
    "events_stream_dedup"    -> (eventsStreamDedup _),
    "events_stream_static_join" -> (eventsStreamStaticJoin _),
    "events_stream_join"     -> (eventsStreamJoin _),
    "events_stream_tumbling" -> (eventsStreamTumbling _),
    "events_window_tumbling" -> (eventsWindowTumbling _),
    "events_sessionize"      -> (eventsSessionize _),
    "events_session_window"  -> (eventsSessionWindow _),
    "events_stream_session"  -> (eventsStreamSession _),
    "events_stream_funnel"   -> (eventsStreamFunnel _),
    "events_stream_sliding"  -> (eventsStreamSliding _),
    "events_json_extract"    -> (eventsJsonExtract _),
    "events_markov_transitions" -> (eventsMarkovTransitions _),
    "events_gap_fill"        -> (eventsGapFill _),
    "events_islands"         -> (eventsIslands _),
    "events_seasonal_decompose" -> (eventsSeasonalDecompose _),
    "events_changepoint"     -> (eventsChangepoint _),
    "events_forecast_backtest" -> (eventsForecastBacktest _),
  )

  /** session_window semantics replayed: a gap of EXACTLY 30 minutes
    * starts a new session (half-open [first, last + gap) windows), hence
    * >= where the cumulative-flag operator uses >. */
  private val sessionWindowSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, value,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
      |       THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      |  FROM flagged)
      |SELECT user_id, MIN(ts) AS session_start,
      |MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |COUNT(*) AS n_events,
      |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  val oracles: Map[String, String] = Map(
    // the decomposition replayed with the same exact-decimal pipeline:
    // d7 = 7y - sum7 stays DECIMAL, dow is epoch_days % 7 (dialect
    // dayofweek numbering differs), and the only float ops are the
    // mirrored final casts/divisions rounded at 6dp
    "events_seasonal_decompose" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS ev_day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS y_dec
        |  FROM events GROUP BY 1),
        |t AS (SELECT ev_day, y_dec,
        |    SUM(y_dec) OVER w AS sum7, COUNT(*) OVER w AS cnt7,
        |    (ev_day - DATE '1970-01-01') % 7 AS dow
        |  FROM daily
        |  WINDOW w AS (ORDER BY ev_day ROWS BETWEEN 3 PRECEDING
        |               AND 3 FOLLOWING)),
        |t2 AS (SELECT *, CASE WHEN cnt7 = 7
        |    THEN round(CAST(sum7 AS DOUBLE) / 7.0, 6) END AS trend,
        |    7 * y_dec - sum7 AS d7 FROM t),
        |seas AS (SELECT dow, round(CAST(SUM(d7) AS DOUBLE) /
        |    (7.0 * CAST(COUNT(*) AS DOUBLE)), 6) AS seasonal
        |  FROM t2 WHERE cnt7 = 7 GROUP BY dow)
        |SELECT ev_day, CAST(y_dec AS DOUBLE) AS y, trend, seasonal,
        |  round(CAST(y_dec AS DOUBLE) - trend - seasonal, 6) AS resid
        |FROM t2 LEFT JOIN seas USING (dow)
        |ORDER BY ev_day""".stripMargin,

    // the lag join + exact-decimal error fold replayed; only the final
    // mirrored divisions are floats
    "events_forecast_backtest" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS ev_day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS y
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT event_type, MAX(ev_day) AS mxd FROM daily GROUP BY 1)
        |SELECT a.event_type, COUNT(*)::BIGINT AS n_backtest,
        |  round(CAST(SUM(abs(a.y - f.y)) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS mae,
        |  round(CAST(SUM(a.y - f.y) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS bias
        |FROM daily a
        |JOIN mx ON mx.event_type = a.event_type
        |JOIN daily f ON f.event_type = a.event_type
        |  AND f.ev_day = a.ev_day - 7
        |WHERE a.ev_day > mx.mxd - 7
        |GROUP BY a.event_type
        |ORDER BY a.event_type""".stripMargin,

    // the CUSUM statistic replayed cross-multiplied in exact DECIMAL
    // (argmax on n*prefix - k*total, ties to earliest day, final day
    // excluded); the only float ops are the mirrored final divisions
    "events_changepoint" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS ev_day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS y
        |  FROM events GROUP BY 1, 2),
        |pre AS (SELECT event_type, ev_day, y,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
        |    SUM(y) OVER w AS prefix,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n,
        |    SUM(y) OVER (PARTITION BY event_type) AS total
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ev_day)),
        |s AS (SELECT *, n * prefix - k * total AS s_scaled FROM pre
        |  WHERE k < n),
        |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY abs(s_scaled) DESC, ev_day ASC) AS rn FROM s)
        |SELECT event_type, ev_day AS cp_day,
        |  round(CAST(prefix AS DOUBLE) / CAST(k AS DOUBLE), 6)
        |    AS pre_mean,
        |  round(CAST(total - prefix AS DOUBLE) / CAST(n - k AS DOUBLE), 6)
        |    AS post_mean,
        |  round(CAST(total - prefix AS DOUBLE) / CAST(n - k AS DOUBLE)
        |    - CAST(prefix AS DOUBLE) / CAST(k AS DOUBLE), 6)
        |    AS mean_shift
        |FROM best WHERE rn = 1
        |ORDER BY event_type""".stripMargin,

    // the full Poisson bootstrap replayed bit-exactly: same md5
    // fraction, same CDF threshold literals, same exact-cent weighted
    // sums, same single IEEE division per resample mean, same picked
    // (2nd, 63rd) order statistics
    "stat_bootstrap_ci" ->
      """WITH ev AS (SELECT event_type, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |rs AS (SELECT event_type, cents, b,
        |    CAST(('0x' || substr(md5(b::VARCHAR || ':' ||
        |      event_id::VARCHAR), 1, 13)) AS BIGINT)
        |      / 4503599627370496.0 AS u
        |  FROM ev CROSS JOIN (SELECT unnest(range(0, 64)) AS b)),
        |w AS (SELECT event_type, cents, b, CASE
        |    WHEN u < 0.36787944117144233 THEN 0
        |    WHEN u < 0.7357588823428847 THEN 1
        |    WHEN u < 0.9196986029286058 THEN 2
        |    WHEN u < 0.9810118431238462 THEN 3
        |    WHEN u < 0.9963401531726562 THEN 4
        |    ELSE 5 END::BIGINT AS w FROM rs),
        |-- HAVING SUM(w) > 0: an all-zero-weight resample has no mean
        |-- and drops from the CI on both sides (see the Spark filter)
        |means AS (SELECT event_type, b,
        |    SUM(w * cents)::DOUBLE / (SUM(w) * 100)::DOUBLE AS m
        |  FROM w GROUP BY 1, 2 HAVING SUM(w) > 0),
        |ci AS (SELECT event_type, list(m ORDER BY m) AS ms
        |  FROM means GROUP BY 1),
        |pt AS (SELECT event_type, COUNT(*)::BIGINT AS n_events,
        |    SUM(cents)::DOUBLE / (COUNT(*) * 100)::DOUBLE AS mean_value
        |  FROM ev GROUP BY 1)
        |SELECT pt.event_type, n_events, mean_value,
        |  ms[2] AS ci_lo, ms[63] AS ci_hi
        |FROM pt JOIN ci USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // the streaming apply must equal the batch apply — SAME oracle: the
    // gate is the stream==batch equivalence proof
    "events_stream_cdc" ->
      """WITH ranked AS (SELECT user_id AS k, event_type AS op_type,
        |    value AS new_val,
        |    COUNT(*) OVER (PARTITION BY user_id) AS nch,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |l AS (SELECT k, op_type, new_val, nch FROM ranked WHERE rn = 1)
        |SELECT COALESCE(c.c_custkey, l.k)::BIGINT AS custkey,
        |  CASE WHEN l.op_type IS NOT NULL THEN l.new_val
        |       ELSE c.c_acctbal END AS balance,
        |  COALESCE(l.nch, 0)::BIGINT AS n_changes
        |FROM customer c FULL OUTER JOIN l ON c.c_custkey = l.k
        |WHERE l.op_type IS NULL OR l.op_type <> 'error'
        |ORDER BY custkey""".stripMargin,

    // last-writer-wins replayed as a rank window (the oracle may sort;
    // the engine's arg-max is the same (ts, event_id) total order)
    "events_cdc_apply" ->
      """WITH ranked AS (SELECT user_id AS k, event_type AS op_type,
        |    value AS new_val,
        |    COUNT(*) OVER (PARTITION BY user_id) AS nch,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |l AS (SELECT k, op_type, new_val, nch FROM ranked WHERE rn = 1)
        |SELECT COALESCE(c.c_custkey, l.k)::BIGINT AS custkey,
        |  CASE WHEN l.op_type IS NOT NULL THEN l.new_val
        |       ELSE c.c_acctbal END AS balance,
        |  COALESCE(l.nch, 0)::BIGINT AS n_changes
        |FROM customer c FULL OUTER JOIN l ON c.c_custkey = l.k
        |WHERE l.op_type IS NULL OR l.op_type <> 'error'
        |ORDER BY custkey""".stripMargin,

    // same exact long moments, same left-assoc double formula; the
    // rounded z feeds the flag in both engines
    "events_anomaly" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS hour_start,
        |    event_type, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, count(*)::BIGINT AS n_hours,
        |    sum(n)::BIGINT AS s, sum(n * n)::BIGINT AS ssq
        |  FROM hourly GROUP BY 1),
        |j AS (SELECT h.event_type, h.hour_start, h.n, n_hours,
        |    s::DOUBLE / n_hours::DOUBLE AS mean,
        |    (n_hours * ssq - s * s)::DOUBLE /
        |      (n_hours * (n_hours - 1))::DOUBLE AS variance
        |  FROM hourly h JOIN st USING (event_type)),
        |z AS (SELECT event_type, hour_start, n,
        |    round(mean, 6) AS mean_hourly,
        |    CASE WHEN n_hours > 1 AND variance > 0.0
        |         THEN round((n::DOUBLE - mean) / sqrt(variance), 6)
        |         ELSE 0.0 END AS z
        |  FROM j)
        |SELECT event_type, hour_start, n, mean_hourly, z,
        |  abs(z) > 3.0 AS is_anomaly
        |FROM z ORDER BY event_type, hour_start""".stripMargin,
    // the (rn-1)*5 div n tile formula replayed verbatim (NOT SQL NTILE —
    // remainders spread evenly; the formula is the documented contract)
    "events_rfm" ->
      """WITH per AS (SELECT user_id, max(ts) AS last_ts,
        |    count(*)::BIGINT AS frequency,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |scal AS (SELECT max(last_ts) AS max_ts, count(*)::BIGINT AS n
        |  FROM per),
        |base AS (SELECT per.*, scal.n,
        |    date_diff('day', last_ts::DATE, max_ts::DATE) AS recency_days
        |  FROM per, scal),
        |rk AS (SELECT user_id, monetary, n,
        |    ROW_NUMBER() OVER (ORDER BY recency_days, user_id) AS r_rn,
        |    ROW_NUMBER() OVER (ORDER BY frequency DESC, user_id) AS f_rn,
        |    ROW_NUMBER() OVER (ORDER BY monetary DESC, user_id) AS m_rn
        |  FROM base),
        |t AS (SELECT monetary,
        |    ((r_rn - 1) * 5) // n + 1 AS r_tile,
        |    ((f_rn - 1) * 5) // n + 1 AS f_tile,
        |    ((m_rn - 1) * 5) // n + 1 AS m_tile
        |  FROM rk)
        |SELECT r_tile, f_tile, m_tile, count(*)::BIGINT AS n_users,
        |  CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_monetary
        |FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // e6-quantized credits (identical doubles -> identical rounding), so
    // every model aggregate is exact integer arithmetic; first/last as
    // ROW_NUMBER over (t_ts, t_id), the oracle replay of the struct order
    "events_attribution" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS p_value
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT event_id AS t_id, user_id, ts AS t_ts,
        |    event_type AS touch_type
        |  FROM events WHERE event_type IN ('view', 'click')),
        |j AS (SELECT p.p_id, p.p_value, t.t_id, t.t_ts, t.touch_type
        |  FROM p JOIN t USING (user_id)
        |  WHERE t.t_ts <= p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY),
        |per AS (SELECT p_id, p_value, count(*)::BIGINT AS n_touch
        |  FROM j GROUP BY 1, 2),
        |firstt AS (SELECT p_id, p_value, touch_type FROM (
        |    SELECT j.*, ROW_NUMBER() OVER (PARTITION BY p_id
        |      ORDER BY t_ts, t_id) AS rn FROM j) WHERE rn = 1),
        |lastt AS (SELECT p_id, p_value, touch_type FROM (
        |    SELECT j.*, ROW_NUMBER() OVER (PARTITION BY p_id
        |      ORDER BY t_ts DESC, t_id DESC) AS rn FROM j) WHERE rn = 1),
        |m1 AS (SELECT 'first_touch' AS model, touch_type,
        |    count(*)::BIGINT AS n_credits,
        |    sum(CAST(round(p_value * 1000000.0) AS BIGINT)) AS credited_e6
        |  FROM firstt GROUP BY 2),
        |m2 AS (SELECT 'last_touch' AS model, touch_type,
        |    count(*)::BIGINT AS n_credits,
        |    sum(CAST(round(p_value * 1000000.0) AS BIGINT)) AS credited_e6
        |  FROM lastt GROUP BY 2),
        |m3 AS (SELECT 'linear' AS model, j.touch_type,
        |    count(*)::BIGINT AS n_credits,
        |    sum(CAST(round(j.p_value * 1000000.0 / per.n_touch) AS BIGINT))
        |      AS credited_e6
        |  FROM j JOIN per USING (p_id) GROUP BY 2),
        |un AS (SELECT p_id, p_value FROM p ANTI JOIN per USING (p_id)),
        |m4 AS (SELECT m.model, 'none' AS touch_type,
        |    count(*)::BIGINT AS n_credits,
        |    sum(CAST(round(p_value * 1000000.0) AS BIGINT)) AS credited_e6
        |  FROM un CROSS JOIN (VALUES ('first_touch'), ('last_touch'),
        |    ('linear')) m(model)
        |  GROUP BY 1 HAVING count(*) > 0)
        |SELECT model, touch_type, n_credits,
        |  round(credited_e6::DOUBLE / 1000000.0, 6) AS credited
        |FROM (SELECT * FROM m1 UNION ALL SELECT * FROM m2
        |  UNION ALL SELECT * FROM m3 UNION ALL SELECT * FROM m4)
        |ORDER BY model, touch_type""".stripMargin,
    "events_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS view_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS click_ts
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS purchase_ts
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1),
        |u AS (SELECT '1_view' AS stage, user_id FROM v
        |  UNION ALL SELECT '2_click', user_id FROM c
        |  UNION ALL SELECT '3_purchase', user_id FROM p),
        |s AS (SELECT stage, COUNT(*) AS users FROM u GROUP BY 1)
        |SELECT stage, users,
        |CAST(users AS DOUBLE) / CAST(MAX(users) OVER () AS DOUBLE)
        |  AS pct_of_entry
        |FROM s ORDER BY stage""".stripMargin,
    "events_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1),
        |act AS (SELECT DISTINCT cohort_day,
        |  CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
        |  e.user_id
        |  FROM e JOIN cohort USING (user_id))
        |SELECT cohort_day, day_offset, COUNT(*) AS active_users
        |FROM act GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the late duplicates must be dropped: the MV equals the aggregation
    // over the ORIGINAL events alone
    "events_stream_late_drop" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |100::BIGINT AS n_late_injected
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the streamed upserts must compose to the full batch aggregation
    "matview_stream_refresh" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_window_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
        |       THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |MIN(ts) AS session_start, MAX(ts) AS session_end,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "events_session_window" -> sessionWindowSql,
    "events_stream_session" -> sessionWindowSql,
    // the stream's greedy per-user state machine on the (ts, event_id)
    // total order equals this MIN-chain: strict > throughout, so the
    // emitted timestamps depend only on the ts values, never on arrival
    "events_stream_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
        |           FROM events),
        |v AS (SELECT user_id, MIN(ts_us) AS view_us
        |      FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, v.view_us, MIN(e.ts_us) AS click_us
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts_us > v.view_us
        |      GROUP BY 1, 2),
        |p AS (SELECT e.user_id, c.view_us, c.click_us,
        |        MIN(e.ts_us) AS purchase_us
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts_us > c.click_us
        |      GROUP BY 1, 2, 3)
        |SELECT user_id, view_us, click_us, purchase_us
        |FROM p ORDER BY user_id""".stripMargin,
    "events_stream_static_join" ->
      """SELECT 'tier_' || (user_id % 3) AS tier, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_stream_dedup" ->
      """SELECT event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_stream_join" ->
      """SELECT p.event_id, p.user_id, p.ts AS purchase_ts, c.ts AS click_ts
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |ORDER BY p.event_id, c.ts""".stripMargin,
    // identical to the batch sliding-window oracle: the stream drains to
    // the same relation
    "events_stream_sliding" ->
      """WITH w AS (
        |  SELECT e.*, make_timestamp(((epoch_us(ts) // 900000000) - k) * 900000000)
        |    AS win_start
        |  FROM events e, unnest(range(0, 4)) AS t(k)
        |  WHERE ((epoch_us(ts) // 900000000) - k) * 900000000
        |        > epoch_us(ts) - 3600000000)
        |SELECT win_start, event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_islands" ->
      """WITH flagged AS (
        |  SELECT user_id, event_type, ts, event_id,
        |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |  - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS island
        |  FROM events)
        |SELECT user_id, event_type,
        |MIN(ts) AS island_start, MAX(ts) AS island_end,
        |COUNT(*) AS n_events
        |FROM flagged GROUP BY user_id, event_type, island
        |ORDER BY user_id, island_start, event_type""".stripMargin,
    "events_gap_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour_start, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT event_type, MIN(hour_start) AS h0, MAX(hour_start) AS h1
        |  FROM hourly GROUP BY 1),
        |spine AS (
        |  SELECT event_type,
        |  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_start
        |  FROM span)
        |SELECT s.hour_start, s.event_type, COALESCE(n, 0)::BIGINT AS n
        |FROM spine s LEFT JOIN hourly h USING (event_type, hour_start)
        |ORDER BY 1, 2""".stripMargin,
    "events_markov_transitions" ->
      """WITH t AS (SELECT event_type AS from_type,
        |             lead(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS to_type
        |           FROM events),
        |c AS (SELECT from_type, to_type, COUNT(*)::BIGINT AS n
        |      FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT from_type, SUM(n)::BIGINT AS n_from FROM c GROUP BY 1)
        |SELECT from_type, to_type, n,
        |  round(n::DOUBLE / n_from::DOUBLE, 9) AS p
        |FROM c JOIN f USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
    "events_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
        |COUNT(*) AS n,
        |SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))::BIGINT AS sum_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
