package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Det._

/** Time-series / event operators over `events` (SURVEY.md §2.9 [ext]).
  * These are the BATCH TWINS of the streaming operators in
  * `graft.streaming` — identical semantics so the DuckDB oracle can check
  * them (it can only verify batch), and so streaming output can be
  * asserted equal to the batch result in tests.
  */
object EventOps {

  /** Tumbling window aggregation — batch twin of
    * `groupBy(window($"ts", "10 minutes"))`. Epoch-aligned (Spark's
    * window origin), mirrored in SQL by integer micros arithmetic.
    */
  val q90 = EngineQuery(
    "q90_window_tumbling",
    (s, dir) => {
      val t = Tables(s, dir)
      t.events
        .groupBy(window(col("ts"), "10 minutes").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          toDouble(sum(dec2(col("value")))).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
          col("event_type"), col("n_events"), col("sum_value"), col("n_users"))
        .orderBy(col("win_start"), col("event_type"))
    },
    Some("""SELECT
              make_timestamp((epoch_us(ts)//600000000)*600000000) AS win_start,
              make_timestamp((epoch_us(ts)//600000000)*600000000
                + 600000000) AS win_end,
              event_type, COUNT(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
              COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2, 3 ORDER BY win_start, event_type"""),
    bench = true)

  /** Sliding window aggregation (10-minute window, 5-minute slide) —
    * batch twin of `window($"ts", "10 minutes", "5 minutes")`; every
    * event lands in exactly windowDuration/slideDuration = 2 windows,
    * which the oracle replicates by unnesting k in {0,1} window offsets.
    */
  val q90b = EngineQuery(
    "q90b_window_sliding",
    (s, dir) => {
      val t = Tables(s, dir)
      t.events
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("win"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          toDouble(sum(dec2(col("value")))).as("sum_value"))
        .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type"))
    },
    Some("""WITH g AS (
              SELECT
                make_timestamp(((epoch_us(ts)//300000000) - k.k)*300000000)
                  AS win_start,
                event_type, value
              FROM events, (SELECT UNNEST(range(0,2)) k) k
            )
            SELECT win_start,
              make_timestamp(epoch_us(win_start) + 600000000) AS win_end,
              event_type, COUNT(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM g GROUP BY 1, 2, 3 ORDER BY win_start, event_type"""))

  /** Session windows (30-minute gap) per user — batch twin of
    * `session_window($"ts", "30 minutes")`; oracle uses the
    * gaps-and-islands formulation. Session end = last event + gap.
    */
  val q91 = EngineQuery(
    "q91_session_window",
    (s, dir) => {
      val t = Tables(s, dir)
      t.events
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          toDouble(sum(dec2(col("value")))).as("sum_value"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    },
    Some("""WITH s AS (
              SELECT user_id, ts, event_id, value,
                CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS brk
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s2 AS (
              SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS sess
              FROM s
            )
            SELECT user_id, MIN(ts) AS session_start,
              MAX(ts) + INTERVAL 30 MINUTE AS session_end,
              COUNT(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM s2 GROUP BY user_id, sess
            ORDER BY user_id, session_start"""))

  /** Keyed dedup — first event per (user, type); the deterministic batch
    * twin of streaming `dropDuplicates`/`dropDuplicatesWithinWatermark`
    * (which keep an arbitrary first — ours pins the earliest by
    * (ts, event_id) so it is checkable).
    */
  val q92 = EngineQuery(
    "q92_event_dedup_first",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      t.events
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
        .orderBy(col("user_id"), col("event_type"))
    },
    Some("""SELECT user_id, event_type, event_id, ts FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                ORDER BY ts, event_id) rn
              FROM events) t
            WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** As-of join (SURVEY.md §2.3 [ext]): each event matched to the
    * customer's latest order at-or-before the event time.
    *
    * Spark has no batch as-of join; this is the union-sort technique —
    * union both sides tagged, one window pass carrying the last order
    * forward. ONE shuffle on the key, linear in |orders|+|events|; never
    * builds the (event × order) pair space, so it scales where a
    * theta-join would not. Orders are first deduped to one per
    * (custkey, date) — max orderkey — because as-of is ambiguous on ties.
    * Oracle uses DuckDB's native ASOF LEFT JOIN.
    */
  val q93 = EngineQuery(
    "q93_asof_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val o = t.orders
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
        .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
          lit(0).as("typ"), col("o_orderkey"),
          col("o_orderdate").as("ord_date"),
          lit(null).cast("long").as("event_id"))
      val e = t.events
        .select(col("user_id").as("k"), col("ts").as("t"),
          lit(1).as("typ"), lit(null).cast("long").as("o_orderkey"),
          lit(null).cast("timestamp").as("ord_date"), col("event_id"))
      val w = Window.partitionBy(col("k")).orderBy(col("t"), col("typ"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.unionByName(e)
        .withColumn("carried_key", last(col("o_orderkey"), ignoreNulls = true).over(w))
        .withColumn("carried_date", last(col("ord_date"), ignoreNulls = true).over(w))
        .filter(col("typ") === 1)
        .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
          col("carried_key").as("o_orderkey"),
          col("carried_date").as("o_orderdate"))
        .orderBy(col("event_id"))
    },
    Some("""WITH o AS (
              SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
              FROM orders GROUP BY 1, 2)
            SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
            FROM events e ASOF LEFT JOIN o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
            ORDER BY e.event_id"""),
    bench = true)

  /** Interval (time-range) join: each click attributed to the same
    * user's purchases within the next 30 minutes. Equi-join on the user
    * key + range predicate — the pair space is per-user, and the range
    * condition is exactly what bounds stream-stream join state in the
    * streaming twin (StreamingOps.attributionJoin).
    */
  val q94 = EngineQuery(
    "q94_interval_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val clicks = t.events.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val purchases = t.events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"), col("value"))
      clicks.join(purchases, Seq("user_id"))
        .filter(col("purchase_ts") > col("click_ts")
          && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          col("click_ts"), col("purchase_ts"), col("value"))
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    },
    Some("""SELECT c.user_id, c.event_id AS click_id,
              p.event_id AS purchase_id, c.ts AS click_ts,
              p.ts AS purchase_ts, p.value
            FROM events c JOIN events p
              ON c.user_id = p.user_id
              AND c.event_type = 'click' AND p.event_type = 'purchase'
              AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
            ORDER BY c.user_id, click_id, purchase_id"""))

  /** Funnel analysis: per-user first signup → first click → first
    * purchase, sequenced by timestamps; one conditional-MIN aggregation
    * pass, no joins — at scale a single shuffle on user_id.
    */
  val q95 = EngineQuery(
    "q95_funnel",
    (s, dir) => {
      val t = Tables(s, dir)
      val f = t.events.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "signup", col("ts"))).as("s"),
        min(when(col("event_type") === "click", col("ts"))).as("c"),
        min(when(col("event_type") === "purchase", col("ts"))).as("p"))
      f.agg(
        count(lit(1)).as("users"),
        count(col("s")).as("signed"),
        count(when(col("c") > col("s"), 1)).as("clicked_after"),
        count(when(col("p") > col("c") && col("c") > col("s"), 1))
          .as("converted"))
    },
    Some("""WITH f AS (
              SELECT user_id,
                MIN(ts) FILTER (event_type = 'signup') s,
                MIN(ts) FILTER (event_type = 'click') c,
                MIN(ts) FILTER (event_type = 'purchase') p
              FROM events GROUP BY user_id)
            SELECT COUNT(*) AS users, COUNT(s) AS signed,
              COUNT(CASE WHEN c > s THEN 1 END) AS clicked_after,
              COUNT(CASE WHEN p > c AND c > s THEN 1 END) AS converted
            FROM f"""))

  /** Cohort retention: users grouped by first-seen day, activity counted
    * per (cohort, activity day). Two aggregations + one equi-join on
    * user_id. No broadcast hint: firstSeen is one row per USER, i.e.
    * O(10^8..10^9) rows at 100 TB — a forced broadcast would OOM every
    * executor. AQE broadcasts when the side actually fits; otherwise the
    * equi-join shuffles once on user_id, reusing the aggregation's
    * hash partitioning.
    */
  val q96 = EngineQuery(
    "q96_cohort_retention",
    (s, dir) => {
      val t = Tables(s, dir)
      val firstSeen = t.events.groupBy(col("user_id"))
        .agg(date_trunc("day", min(col("ts"))).as("cohort"))
      t.events
        .join(firstSeen, Seq("user_id"))
        .groupBy(col("cohort"), date_trunc("day", col("ts")).as("act_day"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort"), col("act_day"))
    },
    Some("""WITH first AS (
              SELECT user_id, date_trunc('day', MIN(ts)) AS cohort
              FROM events GROUP BY user_id)
            SELECT f.cohort, date_trunc('day', e.ts) AS act_day,
              COUNT(DISTINCT e.user_id) AS n_active
            FROM events e JOIN first f USING (user_id)
            GROUP BY 1, 2 ORDER BY cohort, act_day"""))

  /** Rolling 7-day distinct actives (DAU + WAU per day) — the metric a
    * sliding COUNT(DISTINCT) window cannot express (distinct state
    * doesn't compose across frames). The scalable formulation: reduce
    * to distinct (user, day) pairs first (bounded by users × active
    * days, NOT by events), then each pair CONTRIBUTES to the 7 window
    * days via a ×7 explode, then one count-distinct per target day.
    * Two shuffles total, both on pre-reduced data; the explode factor
    * is window/granularity, independent of corpus size. The oracle
    * computes the same windows with a range join (fine at oracle
    * scale, quadratic at 100 TB — which is the point of the explode
    * form). Target days are semi-joined to observed days so the
    * output carries no partial phantom days past the data's edge.
    */
  val q111 = EngineQuery(
    "q111_rolling_active_users",
    (s, dir) => {
      val t = Tables(s, dir)
      val pairs = t.events
        .select(date_trunc("DAY", col("ts")).as("d"), col("user_id"))
        .distinct()
      val days = pairs.select(col("d").as("day")).distinct()
      val dau = pairs.groupBy(col("d").as("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val contrib = pairs
        .select(col("user_id"), col("d"),
          explode(sequence(lit(0), lit(6))).as("o"))
        .select(col("user_id"), expr("timestampadd(DAY, o, d)").as("day"))
      val wau = contrib.join(days, Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, Seq("day"))
        .orderBy(col("day"))
    },
    Some("""WITH pairs AS (
              SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
            ), days AS (SELECT DISTINCT d FROM pairs),
            dau AS (
              SELECT d AS day, COUNT(DISTINCT user_id) AS dau
              FROM pairs GROUP BY 1
            ), wau AS (
              SELECT dy.d AS day, COUNT(DISTINCT p.user_id) AS wau
              FROM days dy JOIN pairs p
                ON p.d <= dy.d AND p.d > dy.d - INTERVAL 7 DAY
              GROUP BY 1
            )
            SELECT day, dau, wau FROM dau JOIN wau USING (day)
            ORDER BY day"""))

  /** Time-series gap filling / daily resample — the regularization
    * step before any rolling metric or model input: per event type, a
    * complete day spine over the observed range, absent days filled
    * with 0 (flagged) and a forward-filled last-observed value. The
    * spine is sequence()-generated from the global min/max day (a
    * scalar agg broadcast — never a driver collect) × the distinct
    * type dim; the left join back to the daily aggregate is
    * spine-sized, types × days, independent of event count. The
    * forward-fill is last(ignoreNulls) over a per-type window —
    * partitioned by type so the sort is parallel across the cluster.
    * The aggregated signal is the high-value event subset (value>250)
    * so the fixture actually HAS gaps (54/150 cells at sf0.01) — the
    * fill and leading-null carry paths execute, not just the dense
    * pass-through.
    */
  val q113 = EngineQuery(
    "q113_gap_fill_resample",
    (s, dir) => {
      val t = Tables(s, dir)
      val daily = t.events
        .filter(col("value") > 250.0)
        .groupBy(col("event_type"),
          date_trunc("DAY", col("ts")).as("day"))
        .agg(toDouble(sum(dec2(col("value")))).as("day_value"),
          count(lit(1)).as("n_events"))
      // bounds AND the type dim from ONE scalar aggregation over one
      // scan (collect_set is bounded by type cardinality, a dim by
      // nature) — a separate distinct() would be a third events scan
      val meta = t.events.agg(
        date_trunc("DAY", min(col("ts"))).as("d0"),
        date_trunc("DAY", max(col("ts"))).as("d1"),
        collect_set(col("event_type")).as("types"))
      val spine = meta
        .select(explode(col("types")).as("event_type"),
          col("d0"), col("d1"))
        .select(col("event_type"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("day_value"), lit(0.0)).as("day_value"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("day_value").isNull.as("filled"),
          last(col("day_value"), ignoreNulls = true).over(w).as("carried"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS day,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  AS day_value,
                COUNT(*) AS n_events
              FROM events WHERE value > 250.0 GROUP BY 1, 2
            ), bounds AS (
              SELECT date_trunc('day', MIN(ts)) d0,
                date_trunc('day', MAX(ts)) d1 FROM events
            ), spine AS (
              SELECT t.event_type, g.day
              FROM (SELECT DISTINCT event_type FROM events) t,
                (SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))
                   AS day FROM bounds) g
            )
            SELECT s.event_type, s.day,
              COALESCE(d.day_value, 0.0) AS day_value,
              COALESCE(d.n_events, 0) AS n_events,
              d.day_value IS NULL AS filled,
              last_value(d.day_value IGNORE NULLS) OVER (
                PARTITION BY s.event_type ORDER BY s.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS carried
            FROM spine s LEFT JOIN daily d
              ON d.event_type = s.event_type AND d.day = s.day
            ORDER BY s.event_type, s.day"""))

  /** Session-path mining: top event-type transitions within 30-minute
    * sessions — the product-analytics "what do users do next" query
    * (and, for training-data pipelines, the n-gram statistics of event
    * sequences). A transition is (prev_type → type) between CONSECUTIVE
    * events of the same user with no session break between them.
    *
    * Scale shape: ONE exchange on user_id serves both the session-break
    * flag and the lag — the transition is `lag(event_type)` over the
    * same (user, ts) window, kept only where no break occurred, so no
    * second (user, session)-keyed shuffle exists. The count rollup
    * aggregates |event_type|² groups; top-k is TakeOrderedAndProject.
    */
  val q122 = EngineQuery(
    "q122_event_transitions",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val prevUs = lag(unix_micros(col("ts")), 1).over(w)
      t.events
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("brk",
          col("prev_type").isNull ||
            (unix_micros(col("ts")) - prevUs) >= 1800000000L)
        .filter(!col("brk"))
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("prev_type"), col("event_type"))
        .limit(15)
    },
    Some("""WITH s AS (
              SELECT user_id, ts, event_id, event_type,
                lag(event_type) OVER w AS prev_type,
                (lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE) AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT prev_type, event_type, COUNT(*) AS n
            FROM s WHERE NOT brk
            GROUP BY prev_type, event_type
            ORDER BY n DESC, prev_type, event_type LIMIT 15"""),
    bench = true)

  /** Daily volume anomaly detection: flag days whose event count jumps
    * or drops sharply against the trailing-week median — the pipeline
    * health monitor every ingestion system runs (a crawler stall or a
    * duplicate-feed burst shows up as a volume step long before any
    * content-level signal).
    *
    * Scale shape: the raw stream reduces to ONE row per day first
    * (map-side-combined count), so the day spine, trailing-window
    * range join, and exact median run over O(days) rows — at 100 TB
    * the daily rollup is still only thousands of rows. The flag
    * threshold (±50% of the trailing median) is exact double
    * arithmetic on both engines.
    *
    * The spine matters for the semantics, not just completeness: a
    * TOTAL stall produces no daily row at all, so without zero-filled
    * spine days the one case the monitor most exists for (100% drop)
    * would silently vanish from the output. Spine days left-join the
    * trailing stats so the first day (no baseline) still appears,
    * unflagged.
    */
  /** Anomaly tail of q123, factored over any (day, n) daily rollup —
    * the streaming path produces the SAME rollup from a tumbling
    * 1-day window (StreamingOps/StreamingSpec), then analyzes it with
    * this exact code: stream-ingest → batch-analyze with one shared
    * definition of "anomalous", no lambda-architecture drift.
    */
  def dailyVolumeAnomaly(daily: DataFrame): DataFrame = {
    // spine bounds come from the DAILY rollup (O(days) rows), not a
    // second scan of the raw stream — min/max(day) == min/max(ts)
    // truncated, because date_trunc is monotonic
    val spine = daily
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val filled = spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
    val trail = filled.select(col("day").as("d2"), col("n").as("n2"))
    val ratio = col("n").cast("double") / col("trail_med")
    // flag semantics, in order: no baseline days -> never anomalous;
    // live baseline -> out-of-band ratio; DEAD baseline (median 0,
    // e.g. deep inside a prolonged stall) -> any signal at all is
    // the anomaly (the resume burst), while continued silence over
    // a silent baseline is no NEW deviation (the stall was flagged
    // at onset, when the median was still live)
    val anomaly = when(col("n_trail_days") === 0, lit(false))
      .when(col("trail_med") > 0, ratio > 1.5 || ratio < 0.5)
      .otherwise(col("n") > 0)
    filled.join(trail,
        col("d2") >= col("day") - expr("INTERVAL 7 DAYS") &&
          col("d2") < col("day"), "left")
      .groupBy(col("day"), col("n"))
      .agg(expr("percentile(n2, 0.5)").as("trail_med"),
        count(col("n2")).as("n_trail_days"))
      .select(col("day"), col("n"), col("trail_med"),
        col("n_trail_days"),
        when(col("trail_med") > 0, ratio).as("ratio"),
        anomaly.as("anomaly"))
      .orderBy(col("day"))
  }

  val q123 = EngineQuery(
    "q123_volume_anomaly",
    (s, dir) => {
      val t = Tables(s, dir)
      dailyVolumeAnomaly(t.events
        .groupBy(date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))
    },
    Some("""WITH daily AS (
              SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
              FROM events GROUP BY 1
            ), bounds AS (
              SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily
            ), spine AS (
              SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
              FROM bounds
            ), filled AS (
              SELECT s.day, COALESCE(d.n, 0) AS n
              FROM spine s LEFT JOIN daily d ON s.day = d.day
            ), j AS (
              SELECT a.day, a.n, quantile_cont(b.n, 0.5) AS trail_med,
                COUNT(b.n) AS n_trail_days
              FROM filled a LEFT JOIN filled b
                ON b.day >= a.day - INTERVAL 7 DAY AND b.day < a.day
              GROUP BY a.day, a.n
            )
            SELECT day, n, trail_med, n_trail_days,
              CASE WHEN trail_med > 0 THEN CAST(n AS DOUBLE) / trail_med
                   END AS ratio,
              CASE WHEN n_trail_days = 0 THEN false
                   WHEN trail_med > 0 THEN
                     (CAST(n AS DOUBLE) / trail_med > 1.5
                      OR CAST(n AS DOUBLE) / trail_med < 0.5)
                   ELSE n > 0 END AS anomaly
            FROM j ORDER BY day"""),
    bench = true)

  val all: Seq[EngineQuery] = Seq(q90, q90b, q91, q92, q93, q94, q95, q96,
    q111, q113, q122, q123)
}
