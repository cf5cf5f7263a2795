package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.ops.Det._

/** Structured Streaming surface (SURVEY.md §2.9 [ext]) — streaming twins
  * of the batch event operators in `graft.ops.EventOps`, so every
  * streaming transform has an oracle-checkable batch equivalent (the
  * DuckDB oracle can only verify batch semantics).
  *
  * Sources are `readStream` over the events parquet layout; sinks in
  * tests are the memory sink driven by `processAllAvailable()`. At scale
  * the same plans run against Kafka/file sources with watermark-bounded
  * state — nothing here holds unbounded state except the explicitly
  * stateful example.
  */
object StreamingOps {

  /** Raw parquet schema of the events fixture (ts is TIMESTAMP(NANOS),
    * surfaced as long nanos — see `graft.ops.Tables#events`).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a directory of events parquet files.
    *
    * File streams need an explicit schema; the fixture's `ts` encoding
    * varies by driver generation (TIMESTAMP(NANOS) read as long vs
    * TIMESTAMP(MICROS) read as TIMESTAMP_NTZ — see
    * [[graft.ops.Tables.events]]), so probe the actual type with a
    * footer-only batch read and normalize to micros TimestampType.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The probe is a batch read of whatever files are already there.
    // File-stream sources commonly START on an empty directory with
    // files arriving later — the probe then throws (unable to infer
    // schema); fall back to the legacy long-nanos schema rather than
    // failing stream construction (r6 advice).
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException => LongType }
    val src = spark.readStream
      .schema(StructType(rawSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = tsType) else f)))
      .parquet(dir)
    tsType match {
      case LongType =>
        src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        src.withColumn("ts", col("ts").cast(TimestampType))
      case _ => src
    }
  }

  /** Tumbling-window aggregation with a watermark — streaming twin of
    * EventOps.q90 (same grouping, same aggregates).
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        toDouble(sum(dec2(col("value")))).as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding-window aggregation (10-minute window, 5-minute slide) with
    * a watermark — streaming twin of EventOps.q90b. State per key is
    * bounded: watermark evicts windows older than window+delay.
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        toDouble(sum(dec2(col("value")))).as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Daily volume rollup — the streaming PRODUCER half of q123's
    * anomaly monitor: a tumbling 1-day window count whose output
    * schema (day, n) is exactly what `EventOps.dailyVolumeAnomaly`
    * consumes. The split is the scale design: the stream continuously
    * maintains the O(days) rollup (watermark-bounded state, one row
    * per day), and the anomaly pass — which needs a trailing-median
    * over a completed spine — runs as a cheap batch over the SINK, not
    * over 100 TB of raw events. One shared definition of "anomalous"
    * (StreamingSpec asserts stream-fed == batch q123 on the same
    * fixture), no lambda-architecture drift.
    */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("win"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("day"), col("n"))

  /** Session windows (30-minute gap) per user — streaming twin of
    * EventOps.q91.
    */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"))

  /** Watermarked streaming dedup on (user_id, event_type) — twin of
    * EventOps.q92's keyed dedup (streaming keeps the first arrival).
    */
  def dedupByKey(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-stream interval join — streaming twin of EventOps.q94:
    * clicks joined to the same user's purchases within 30 minutes. The
    * watermarks + time-range condition bound join state on both sides
    * (Spark evicts buffered rows once the range can no longer match).
    */
  def attributionJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("value"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user_id")
        && col("purchase_ts") > col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** flatMapGroupsWithState: zero-or-more outputs per group per batch —
    * emits a row the FIRST time a user exhibits an event type (state =
    * the set of seen types per user). The batch twin is
    * `SELECT DISTINCT user_id, event_type`, asserted in StreamingSpec.
    * State is bounded by |users| × |event types|.
    */
  def newEventTypes(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .select(col("user_id"), col("event_type"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Set[String], (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[Set[String]]) =>
          val seen = state.getOption.getOrElse(Set.empty[String])
          val fresh = rows.map(_._2).toSeq.distinct.filterNot(seen)
          state.update(seen ++ fresh)
          fresh.iterator.map(t => (uid, t))
      }
      .toDF("user_id", "event_type")
  }

  /** Stateful funnel — streaming twin of EventOps.q95: per user, the
    * earliest signup/click/purchase timestamps tracked in
    * mapGroupsWithState. MIN is commutative and associative, so arrival
    * order within and across micro-batches cannot change the final
    * state — the last emitted row per user equals the batch q95
    * per-user relation exactly (asserted in StreamingSpec, which then
    * folds the funnel counts and compares to the oracle-proven q95).
    * State per key is three optional timestamps — bounded by |users|.
    */
  final case class FunnelMilestones(user_id: Long, signup_us: Option[Long],
      click_us: Option[Long], purchase_us: Option[Long])

  def funnelMilestones(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    def minOpt(a: Option[Long], b: Option[Long]): Option[Long] =
      (a ++ b).minOption
    // no event-type prefilter: q95 counts EVERY user with any event in
    // its funnel base, so non-milestone events must still create state
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Option[Long], Option[Long], Option[Long]),
        FunnelMilestones](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          var (s, c, p) = state.getOption.getOrElse(
            (Option.empty[Long], Option.empty[Long], Option.empty[Long]))
          rows.foreach {
            case (_, "signup", us)   => s = minOpt(s, Some(us))
            case (_, "click", us)    => c = minOpt(c, Some(us))
            case (_, "purchase", us) => p = minOpt(p, Some(us))
            case _                   => ()
          }
          state.update((s, c, p))
          FunnelMilestones(uid, s, c, p)
      }
      .toDF()
  }

  /** Explicit stateful processing: running event count + value sum per
    * user via mapGroupsWithState — the `KeyValueGroupedDataset` custom-
    * state surface. State is one small struct per key, watermark-free
    * (bounded by key cardinality).
    */
  final case class UserAgg(user_id: Long, n_events: Long, sum_value: Double)

  def statefulUserCounts(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .select(col("user_id"), dec2(col("value")).cast("double").as("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), UserAgg](
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[(Long, Double)]) =>
          val (pn, pv) = state.getOption.getOrElse((0L, 0.0))
          var n = pn
          var v = pv
          rows.foreach { r => n += 1; v += r._2 }
          state.update((n, v))
          UserAgg(uid, n, v)
      }
      .toDF()
  }

  /** Streaming incremental exact dedup — the streaming twin of batch
    * q46's crawl-vs-corpus shape, exact-hash form: documents arriving
    * on a stream are dropped when their content key already exists in
    * the STATIC corpus (stream-static left-anti equi-join — stateless,
    * no watermark needed; Spark rescans only the new micro-batch, the
    * static side is a bounded lookup). Within-stream duplicates are a
    * separate concern (watermarked dropDuplicates, see dedupByKey).
    * At 100 TB the static side is the corpus's content-key index, a
    * bucketed table the join co-locates against.
    */
  def incrementalExactDedup(newDocs: DataFrame,
      existing: DataFrame): DataFrame = {
    // internal join key under a collision-proof name, dropped on the
    // way out so the caller's schema passes through untouched
    val k = "_graft_content_key"
    require(!newDocs.columns.contains(k), s"column $k is reserved")
    val keys = existing.select(md5(col("text")).as(k)).distinct()
    newDocs
      .withColumn(k, md5(col("text")))
      .join(keys, Seq(k), "left_anti")
      .drop(k)
  }

  /** Streaming per-source quota enforcement — the streaming twin of
    * batch q77's domain-frequency cap: admit documents from a source
    * only while its running admitted-count is below the cap, across
    * micro-batches, ranking admission within each batch by the SAME
    * quality key as the batch rule (n_chars DESC, ties on doc_id ASC).
    * Run over a single batch this therefore selects exactly q77's
    * top-cap set — gate-checked against the windowed SQL in q154.
    * Across micro-batches the cap still binds first-come per batch
    * (a stream cannot rank against documents it hasn't seen), which is
    * the inherent batch/stream divergence of any quota rule.
    *
    * PERSISTED state per key is ONE long (the admitted count); working
    * memory while processing a group is O(cap) — a bounded heap of the
    * best (n_chars, doc_id) keys — never O(rows in batch), so a skewed
    * mega-source costs one streaming pass, not a buffer. Replays admit
    * the same documents (deterministic key, no rand()), the same
    * reproducibility contract as the batch rule. flatMapGroupsWithState
    * because each input row maps to 0-or-1 outputs.
    */
  final case class Admitted(doc_id: Long, source: String, n_chars: Long)

  def sourceQuota(spark: SparkSession, docs: DataFrame,
      cap: Long): DataFrame = {
    import spark.implicits._
    // head of the bounded heap = WORST kept doc (smallest n_chars,
    // then largest doc_id) so it is evicted first when a better one
    // arrives — the max-heap inversion of (n_chars DESC, doc_id ASC)
    val worstFirst: Ordering[(Long, Long)] =
      Ordering.by { case (nChars, id) => (-nChars, id) }
    docs
      .select(col("doc_id"), col("source"),
        col("n_chars").cast(LongType).as("n_chars"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (src, rows, state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          // clamp: a cap beyond Int.MaxValue must saturate, not wrap
          // negative through .toInt
          val room = math.min(cap - admitted, Int.MaxValue.toLong).toInt
          if (room <= 0) {
            // exhausted source: drain without buffering anything
            Iterator.empty
          } else {
            val heap = scala.collection.mutable
              .PriorityQueue.empty[(Long, Long)](worstFirst)
            rows.foreach { case (id, _, nChars) =>
              if (heap.size < room) heap.enqueue((nChars, id))
              else if (worstFirst.compare((nChars, id), heap.head) < 0) {
                heap.dequeue(); heap.enqueue((nChars, id))
              }
            }
            val drained: Seq[(Long, Long)] = heap.dequeueAll
            val winners = drained.sortBy(_._2) // ascending doc_id
            state.update(admitted + winners.size)
            winners.iterator.map { case (nChars, id) =>
              Admitted(id, src, nChars) }
          }
      }
      .toDF()
  }
}
