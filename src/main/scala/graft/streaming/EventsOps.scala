package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Every transform here is written so the SAME code runs in batch
  * (`spark.read`) and in Structured Streaming (`spark.readStream`):
  * time-window aggregations use `window`/`session_window` (stream-legal,
  * no sort), and dedup keys are bounded in event-time. Streaming entry
  * points add the watermark; see `StreamingJobs`.
  */
object EventsOps {

  /** Tumbling-window aggregate (stream-safe: append output with a
    * watermark upstream).
    */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding-window aggregate — `window(ts, width, slide)` expands each
    * event into width/slide rows via the TimeWindow generator (an Expand,
    * not a shuffle-per-window).
    */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Session windows per user with a fixed inactivity gap. In batch this
    * compiles to a sort-based session assignment within each user
    * partition; in streaming it is state-store backed.
    */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))

  /** As-of join — an operator Spark has no builtin for: for every left
    * row, attach the latest right row with `rightTs <= leftTs` for the
    * same key (optionally within `toleranceSec`). Composed from
    * built-ins (preference (a) of the custom-operator ladder): tag +
    * union + one window pass with `last_value(ignoreNulls)` ordered by
    * (ts, right-before-left on ties) — a single shuffle on the key,
    * no range cross-join, streaming-friendly ordering semantics.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, rightVal: String,
      toleranceSec: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(
        right.schema(rightVal).dataType))
      .withColumn("__rts", lit(null).cast("timestamp"))
    val r = right.select(col(keyCol), col(rightTs).as("__ts"),
        col(rightVal).as("__rv"))
      .withColumn("__side", lit(0))
      .withColumn("__rts", col("__ts"))
    val unioned = l.select((l.columns.filter(c => !c.startsWith("__"))
      .map(col) ++ Seq(col("__ts"), col("__side"), col("__rv"),
      col("__rts"))): _*)
      .unionByName(r, allowMissingColumns = true)
    // tertiary __rv sort makes tied-timestamp right rows deterministic
    // (the max value among ties wins). Carry (ts, value) as ONE struct so
    // both fields always come from the same right row — two independent
    // last(ignoreNulls) calls could mix rows when a value is null.
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ts").asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned
      .withColumn("__r",
        when(col("__side") === 0, struct(col("__rts"), col("__rv"))))
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__asof_v", col("__asof.__rv"))
      .withColumn("__asof_ts", col("__asof.__rts"))
      .filter(col("__side") === 1)
    val bounded = toleranceSec match {
      case Some(t) => carried.withColumn("__asof_v",
        when(col("__ts").cast("long") - col("__asof_ts").cast("long") <= t,
          col("__asof_v")))
        .withColumn("__asof_ts",
          when(col("__ts").cast("long") - col("__asof_ts").cast("long") <= t,
            col("__asof_ts")))
      case None => carried
    }
    bounded
      .withColumnRenamed("__asof_v", s"asof_$rightVal")
      .withColumnRenamed("__asof_ts", "asof_ts")
      .drop("__ts", "__side", "__rv", "__rts", "__r", "__asof")
  }

  /** Interval join (Flink's stream-stream range join): every (left,
    * right) pair sharing `keyCol` with `rightTs - leftTs` in
    * `[lowerSec, upperSec]`.
    *
    * Spark plans a key-equality + time-range theta join as a per-key
    * join with the range as a post-join filter — a cross product per
    * key for hot keys. Here right rows are bucketed by
    * `ts div width` (width = the range span) and each left row explodes
    * to the at-most-two buckets its window can touch, so the join is a
    * pure equi-join on (key, bucket) with the exact range predicate
    * evaluated on same-bucket candidates only. Every right row lands in
    * exactly one bucket → pairs emit exactly once, no dedup pass. At
    * 100 TB: one shuffle per side on (key, bucket); candidate volume is
    * bounded by per-bucket occupancy, never |L|x|R| per key — and the
    * bucket key spreads a hot user across time, which is precisely the
    * skew a bare key-equi join concentrates.
    *
    * Bucket ids use integral `div` (not double `/`) so boundary
    * assignment is exact at any epoch magnitude. Timestamps must be
    * non-negative epochs (1970+), where `div` == floor-division.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, lowerSec: Long, upperSec: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(upperSec >= lowerSec, "need upperSec >= lowerSec")
    val wUs = math.max((upperSec - lowerSec) * 1000000L, 1L)
    val loUs = lowerSec * 1000000L
    val upUs = upperSec * 1000000L
    val rr = right.columns.foldLeft(right)((d, c) =>
      if (c == keyCol) d else d.withColumnRenamed(c, rightPrefix + c))
    val rb = rr
      .withColumn("__rus", unix_micros(col(rightPrefix + rightTs)))
      .withColumn("__bucket", expr(s"__rus div ${wUs}L"))
    val lb = left
      .withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__bucket", explode(sequence(
        expr(s"(__lus + ${loUs}L) div ${wUs}L"),
        expr(s"(__lus + ${upUs}L) div ${wUs}L"))))
    lb.join(rb, Seq(keyCol, "__bucket"))
      .filter(col("__rus").between(col("__lus") + lit(loUs),
        col("__lus") + lit(upUs)))
      .drop("__bucket", "__lus", "__rus")
  }

  /** Event-time-bounded dedup: one row per (user, type, time bucket) —
    * the batch analog of `dropDuplicatesWithinWatermark`.
    */
  /** Strictly-ordered conversion funnel: users reaching step i must
    * have completed steps 0..i-1 at strictly increasing event times
    * (the earliest qualifying time of each step gates the next). All
    * per-step times are `min(CASE ...)` window aggregates over the SAME
    * user partition, so the whole chain is ONE shuffle on user_id —
    * each later step's window reads the previous step's column, and
    * Spark stacks the Window operators on the shared exchange instead
    * of re-partitioning or self-joining the events table per step (the
    * textbook k-way self-join funnel shuffles k times and breaks at
    * scale). Step counts are filtered distinct-user counts in one final
    * aggregation. Bounded by users per partition, not steps.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    val withTs = steps.zipWithIndex.foldLeft(events) { case (df, (st, i)) =>
      val cond =
        if (i == 0) col("event_type") === st
        else col("event_type") === st && col("ts") > col(s"__t${i - 1}")
      df.withColumn(s"__t$i", min(when(cond, col("ts"))).over(w))
    }
    val counts = withTs.agg(
      countDistinct(when(col("__t0").isNotNull, col("user_id"))).as("__c0"),
      steps.indices.tail.map(i =>
        countDistinct(when(col(s"__t$i").isNotNull, col("user_id")))
          .as(s"__c$i")): _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (st, i) =>
      struct(lit(i).as("step"), lit(st).as("event_type"),
        col(s"__c$i").as("users"))
    }: _*)).as("f")).select(col("f.step").as("step"),
      col("f.event_type").as("event_type"), col("f.users").as("users"))
  }

  /** Weekly cohort retention: cohort = a user's first active week, one
    * output row per (cohort_week, week_offset) counting distinct users
    * active `week_offset` weeks after their cohort week. Weeks are pure
    * epoch-second integer arithmetic (`floor(epoch / 604800)`), not
    * calendar `date_trunc` — week-start conventions differ across
    * engines/locales, epoch math replays bit-for-bit in any of them.
    * One user-partition window (first-seen week) + one aggregation on
    * the (cohort, offset) pair — both keys bounded and well-spread; at
    * 100 TB the window is the standard per-user pass every
    * sessionization already pays.
    */
  def retention(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    events
      .withColumn("__week", floor(unix_timestamp(col("ts")) / 604800L))
      .withColumn("__cohort", min(col("__week")).over(w))
      .groupBy(col("__cohort").as("cohort_week"),
        (col("__week") - col("__cohort")).as("week_offset"))
      .agg(countDistinct("user_id").as("users"))
  }

  /** First-order Markov transition matrix over per-user event
    * streams: counts of consecutive (prev → next) event-type pairs in
    * (ts, event_id) order — the tie column makes the ordering total,
    * so the matrix replays engine-exactly — with per-prev transition
    * probabilities as ppm floors (prob_ppm = ⌊10⁶·n_pair/n_prev⌋; the
    * row's probabilities sum to ≤ 10⁶ with the deficit < |next| ulps,
    * a floor-arithmetic invariant specs can assert). The sequence-
    * mining companion to [[funnel]]: the funnel answers "how many
    * reach step k", the matrix answers "where do they go instead".
    * First events (no predecessor) contribute no pair. One
    * user-partition window (lag 1) — the standard per-user pass every
    * sessionization already pays — then one (prev, next) count-agg
    * (at most |event types|² rows) and a literal-sized rollup join.
    */
  def transitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("__prev", lag(col("event_type"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"),
        col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_pair"))
    val byPrev = pairs.groupBy(col("prev_type"))
      .agg(sum(col("n_pair")).as("n_prev"))
    pairs.join(byPrev, "prev_type")
      .select(col("prev_type"), col("next_type"), col("n_pair"),
        col("n_prev"),
        expr("cast((cast(n_pair AS decimal(38,0)) * 1000000)" +
          " div n_prev AS long)").as("prob_ppm"))
  }

  def bucketDedup(events: DataFrame, bucket: String): DataFrame =
    events
      .groupBy(window(col("ts"), bucket).as("w"), col("user_id"),
        col("event_type"))
      .agg(min("event_id").as("keep_event_id"), count(lit(1)).as("n_dups"))
      .select(col("user_id"), col("event_type"),
        col("w.start").as("bucket_start"), col("keep_event_id"),
        col("n_dups"))

  /** SCD Type-2 dimension build from an event log: per user, track the
    * `event_type` attribute and emit one validity interval per change —
    * `valid_from` = the change's timestamp, `valid_to` = the next
    * change's timestamp (null on the open, current interval),
    * `version` = 1-based change ordinal, `is_current` = open interval.
    * The reference's warehouse keeps only latest-state rows
    * (UPDATE-join then INSERT, PIPE:417-435); SCD2 is the production
    * generalization that preserves history so any as-of date can be
    * queried. Two window passes over ONE user-partition shuffle
    * (lag to detect changes, then lead/row_number over the surviving
    * change rows — same partitioning, no second exchange). Scale: the
    * per-user pass every sessionization already pays; no driver state.
    * Ordering ties (same user, same timestamp) break on event_id, so
    * the interval chain is deterministic under any partitioning.
    */
  /** Gap-filled per-key time series: bucket counts at `widthSec`
    * resolution, with EMPTY buckets densified to zero rows between each
    * key's first and last activity — the step chart/alerting shape a
    * bare groupBy can't produce (missing groups are missing rows).
    * Bucket ids are integral epoch `div` (exact at any magnitude); the
    * per-key bucket range materializes via sequence+explode, so the
    * output volume is Σ per-key spans — bounded by time, not by |rows|.
    * One aggregation + one small per-key range join.
    */
  def gapFill(events: DataFrame, keyCol: String, widthSec: Long)
      : DataFrame = {
    val bucket = expr(s"unix_timestamp(ts) div ${widthSec}L")
    val counts = events
      .groupBy(col(keyCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
    val spans = counts.groupBy(keyCol)
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    spans.join(counts, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        timestamp_seconds(col("bucket") * widthSec).as("bucket_start"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Forward-filled (LOCF — last observation carried forward) per-key
    * metric series at `widthSec` resolution: the densified series
    * [[gapFill]] produces, but empty buckets inherit the LAST OBSERVED
    * value instead of zero — the imputation shape feature stores and
    * monitoring backends expect for sampled gauges (a missing reading
    * means "unchanged", not "zero"). Two window passes, both keyed:
    * (1) the in-bucket winner is the latest event by (ts, event_id) —
    * a deterministic total order, so re-runs and DuckDB agree; (2) the
    * carry-forward is `last(ignoreNulls)` over the densified buckets.
    * Values are fixed-point cents — the fill copies observations
    * verbatim, so no FP enters. Volume and shuffle bounds match
    * [[gapFill]]: everything after the first aggregation is sized by
    * Σ per-key bucket spans, not by |events|.
    */
  def locf(events: DataFrame, keyCol: String, widthSec: Long)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = expr(s"unix_timestamp(ts) div ${widthSec}L")
    val wB = Window.partitionBy(col(keyCol), col("bucket"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val perBucket = events
      .select(col(keyCol), bucket.as("bucket"), col("ts"),
        col("event_id"), round(col("value") * 100).cast("long").as("cents"))
      .withColumn("__rn", row_number().over(wB))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("bucket"), col("cents"))
    val spans = perBucket.groupBy(keyCol)
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    val wFill = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans.join(perBucket, Seq(keyCol, "bucket"), "left")
      .withColumn("filled",
        last(col("cents"), ignoreNulls = true).over(wFill))
      .select(col(keyCol), col("bucket"),
        timestamp_seconds(col("bucket") * widthSec).as("bucket_start"),
        col("cents").as("observed"), col("filled"))
  }

  /** OHLC bars (open/high/low/close) per key and time bucket — the
    * candlestick rollup every metrics/trading backend keeps. Open and
    * close are the FIRST/LAST event by the (ts, event_id) total order
    * (deterministic under ties, re-run stable); high/low are plain
    * extremes. ONE aggregation pass: min_by/max_by over the composite
    * order key — no window, no second shuffle; values are fixed-point
    * cents so every bar is engine-exact.
    */
  def ohlc(events: DataFrame, keyCol: String, widthSec: Long)
      : DataFrame = {
    val bucket = expr(s"unix_timestamp(ts) div ${widthSec}L")
    // Composite order coordinate: ts microseconds then event_id —
    // a single orderable long-pair packed into a struct for
    // min_by/max_by (struct comparison is lexicographic).
    val ord = struct(unix_micros(col("ts")), col("event_id"))
    events
      .select(col(keyCol), bucket.as("bucket"),
        round(col("value") * 100).cast("long").as("cents"), ord.as("__o"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min_by(col("cents"), col("__o")).as("open"),
        max(col("cents")).as("high"),
        min(col("cents")).as("low"),
        max_by(col("cents"), col("__o")).as("close"))
  }

  /** Exact sliding distinct count — distinct active users per trailing
    * `windowDays`-day window, one row per (key, day) — the rolling-DAU
    * /-WAU curve. Sliding DISTINCT does not decompose (a user active
    * on 3 days still counts once), so summing daily distincts is
    * wrong; instead each (key, user, day) contributes membership to
    * the `windowDays` window-ends it falls into (an Expand of bounded
    * factor, map-side), then one distinct-agg per (key, window end).
    * Cost: |distinct (key,user,day)| × windowDays rows through one
    * exchange — linear, never a self-join; the factor is the window
    * length, fixed at plan time. Windows with no activity produce no
    * row (compose with [[gapFill]] to densify).
    */
  def slidingDistinct(events: DataFrame, keyCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, "slidingDistinct: windowDays >= 1")
    val day = expr("unix_timestamp(ts) div 86400L")
    import org.apache.spark.sql.expressions.Window
    val active = events
      .select(col(keyCol), col("user_id"), day.as("day"))
      .distinct()
    // Trailing windows past each key's last active day must go. Their
    // bound is recoverable from the AGGREGATED table itself — the
    // largest window end is lastDay + windowDays − 1 — so the clip is
    // a window max on the keys×days result, NOT a second scan of the
    // fact table (a naive span-join re-reads the corpus: this
    // DataFrame's lineage would run twice).
    val agged = active
      .withColumn("endDay",
        explode(sequence(col("day"),
          col("day") + (windowDays - 1).toLong)))
      .groupBy(col(keyCol), col("endDay"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    val wk = Window.partitionBy(keyCol)
    agged
      .withColumn("__hi",
        max(col("endDay")).over(wk) - (windowDays - 1).toLong)
      .filter(col("endDay") <= col("__hi"))
      .select(col(keyCol), col("endDay").as("day"),
        timestamp_seconds(col("endDay") * 86400L).as("day_start"),
        col("n_active"))
  }

  /** Time-weighted average per key — the gauge-average a time-series
    * backend computes when readings are irregularly spaced: each
    * observation holds until the next one, so the mean weights each
    * value by its holding duration (a plain AVG over-counts bursts).
    * One key-partition window (lead over the (ts, event_id) total
    * order) + one aggregation; products accumulate in decimal(38,0)
    * (seconds × cents overflows a long at corpus scale) and the final
    * value is an integral-divide — exact on every engine. The last
    * observation per key has no duration and is excluded (standard
    * left-closed step-function integral); keys with one event yield
    * no row.
    */
  def timeWeightedAvg(events: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy("ts", "event_id")
    events
      .select(col(keyCol), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("__durS",
        unix_timestamp(lead(col("ts"), 1).over(w)) -
          unix_timestamp(col("ts")))
      .filter(col("__durS").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_held"),
        sum(col("__durS")).as("held_s"),
        sum(col("cents").cast("decimal(38,0)") *
          col("__durS").cast("decimal(38,0)")).as("__wsum"))
      .select(col(keyCol), col("n_held"), col("held_s"),
        expr("__wsum div held_s").cast("long").as("twa_cents"))
  }

  /** Frequent-path mining over the event log: the top-k most common
    * length-`steps` event-type sequences users actually follow
    * (journey analysis — where `funnel` checks ONE prescribed order,
    * this DISCOVERS the orders). Consecutive means adjacent in the
    * user's (ts, event_id)-ordered stream. One user-partition window
    * pass builds the paths via lead(); one count agg; top-k via
    * TakeOrderedAndProject. Ties break on the path string for a total
    * order.
    */
  def topPaths(events: DataFrame, steps: Int, k: Int): DataFrame = {
    require(steps >= 2 && k >= 1, "topPaths: need steps >= 2, k >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val withNext = (1 until steps).foldLeft(
      events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("__s0"))) { (df, i) =>
      df.withColumn(s"__s$i", lead(col("__s0"), i).over(w))
    }
    withNext
      .filter(col(s"__s${steps - 1}").isNotNull)
      .select(concat_ws(">", (0 until steps).map(i => col(s"__s$i")): _*)
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }

  /** Rolling z-score anomaly detector over a metric stream — per key,
    * flag events whose value deviates more than `k` standard deviations
    * from the trailing `n`-event window (the window EXCLUDES the
    * current row, so an outlier never masks itself). EXACT integer
    * arithmetic throughout: values are fixed-point cents, and the
    * z-test is cross-multiplied to dodge both sqrt and division —
    * with dx = n·x − Σx and V = n·Σx² − (Σx)², flag iff dx² > k²·V
    * (algebraically identical to (x−μ)² > k²σ², engine-portable to the
    * last bit). Warmup rows (fewer than n predecessors) never flag.
    *
    * Shape: ONE key-partition exchange drives the whole computation
    * (both rolling sums share the frame); no joins, no second pass.
    * Long-arithmetic bounds: |cents| ≤ ~3·10⁶ at n ≤ 10⁴ keeps
    * dx², k²·V well inside bigint.
    */
  def anomalies(events: DataFrame, keyCol: String, n: Int, k: Int)
      : DataFrame = {
    require(n >= 2 && k >= 1, s"anomalies: need n >= 2, k >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy("ts", "event_id")
      .rowsBetween(-n, -1)
    val cents = round(col("value") * 100).cast("long")
    events
      .withColumn("x", cents)
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s1", sum(col("x")).over(w))
      .withColumn("s2", sum(col("x") * col("x")).over(w))
      .filter(col("cnt") === n)
      .withColumn("dx", lit(n) * col("x") - col("s1"))
      .withColumn("v", lit(n) * col("s2") - col("s1") * col("s1"))
      .filter(col("dx") * col("dx") > lit(k.toLong * k) * col("v"))
      .select(col("event_id"), col(keyCol), col("x").as("x_cents"),
        (col("dx") * col("dx")).as("dev2"),
        (lit(k.toLong * k) * col("v")).as("bound2"))
  }

  /** Final exponentially-weighted moving average per key, integer-exact.
    * EWMA is a SEQUENTIAL recurrence (each state depends on the prior),
    * so the portable-exact form is an ordered fold, not a window frame:
    * values become cents (`round(value·100)`, the q112 idiom) scaled by
    * 1e6, the per-key event list is collected ORDERED by (ts, event_id)
    * and folded with `state' = (aNum·x + (aDen−aNum)·state) div aDen` —
    * all bigint floor division, so any engine replays it bit-for-bit
    * (DuckDB: `list(x ORDER BY …)` + `list_reduce`, whose implicit seed
    * is the first element, exactly this fold's zero).
    *
    * Scale shape: one key-partition shuffle; the collected list is one
    * key's history (the same bound every per-key sessionization op
    * carries). The fold itself is a higher-order function — interpreted,
    * but O(events-per-key) work on data already local to its key. Alpha
    * is a RATIONAL aNum/aDen, not a double — the whole point is that no
    * libm call ever runs.
    */
  def ewmaFinal(events: DataFrame, keyCol: String, aNum: Long,
      aDen: Long): DataFrame = {
    require(aNum >= 1 && aNum < aDen, "ewmaFinal: need 0 < aNum/aDen < 1")
    events
      .withColumn("__x",
        round(col("value") * 100).cast("long") * lit(1000000L))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(struct(col("ts"), col("event_id"),
          col("__x")))).as("__h"))
      .withColumn("__xs", expr("transform(__h, e -> e.__x)"))
      .withColumn("ewma6",
        expr(s"aggregate(slice(__xs, 2, greatest(size(__xs) - 1, 0)), " +
          s"element_at(__xs, 1), " +
          s"(acc, v) -> (${aNum}L * v + ${aDen - aNum}L * acc) div ${aDen}L)"))
      .select(col(keyCol), col("n"), col("ewma6"))
  }

  def scd2(events: DataFrame, attrCol: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val changes = events
      .select(col("user_id"), col(attrCol), col("ts"), col("event_id"))
      .withColumn("__prev", lag(col(attrCol), 1).over(byTime))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(byTime))
      .withColumn("version", row_number().over(byTime).cast("long"))
      .select(col("user_id"), col(attrCol),
        col("ts").as("valid_from"), col("valid_to"), col("version"),
        col("valid_to").isNull.as("is_current"))
  }
}
