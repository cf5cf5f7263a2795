package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measured 10× scaling evidence for the EVENTS analytics
  * family (round-9 verdict #7: windows, sessionization, as-of/interval
  * joins, funnel, cohort retention, rolling distinct, daily anomaly —
  * the one op family with no measured point above sf0.1).
  *
  * Fixture synthesis AMPLIFIES the real sf0.1 events table: `factor`
  * copies with the TIMESTAMPS SHIFTED per copy (copy k lands
  * k·(span+2) days later) and event_ids shifted for uniqueness, while
  * user_ids stay unchanged. That preserves per-day event densities and
  * per-user daily behavior exactly — the stream simply runs `factor`×
  * longer, which is the 100 TB shape for an event log (retention
  * grows, traffic doesn't) — so per-window and per-session work is
  * constant and only the number of windows/sessions grows. Session
  * gaps (minutes) can never bridge the multi-day copy boundaries.
  *
  * Same measurement discipline as [[ScaleTpch]]: two reps per point,
  * min reported (memoized ingest halves on rep 1), both printed.
  *
  * Usage: runMain graft.ScaleEvents [factor]
  * Output: one JSON line per op with both points and the time ratio.
  */
object ScaleEvents {

  private def amplify(spark: SparkSession, base: String, dir: String,
      factor: Int): Unit = {
    val e = spark.read.parquet(s"$base/events.parquet")
    val b = e.agg(min(col("ts")).cast("date"), max(col("ts")).cast("date"),
      max(col("event_id"))).head()
    val spanDays = java.time.temporal.ChronoUnit.DAYS.between(
      b.getDate(0).toLocalDate, b.getDate(1).toLocalDate) + 2
    val idShift = b.getLong(2) + 1
    val copies = spark.range(factor).select(col("id").as("_k"))
    e.crossJoin(broadcast(copies))
      .select(
        (col("event_id") + col("_k") * idShift).as("event_id"),
        expr(s"timestampadd(DAY, cast(_k * $spanDays as int), ts)")
          .as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // everything else byte-copied so Tables resolves every path
    Seq("orders", "lineitem", "customer", "supplier", "part", "nation",
        "region", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = "/root/testdata/sf0.1"
    val big = java.nio.file.Files
      .createTempDirectory(s"graft_events_${factor}x").toString
    System.err.println(s"[ScaleEvents] amplifying $base ${factor}x -> $big")
    amplify(spark, base, big, factor)

    val evs: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "q90_window_tumbling" -> (d => ops.EventOps.q90.run(spark, d)),
      "q90b_window_sliding" -> (d => ops.EventOps.q90b.run(spark, d)),
      "q91_session_window" -> (d => ops.EventOps.q91.run(spark, d)),
      "q92_event_dedup_first" -> (d => ops.EventOps.q92.run(spark, d)),
      "q93_asof_join" -> (d => ops.EventOps.q93.run(spark, d)),
      "q94_interval_join" -> (d => ops.EventOps.q94.run(spark, d)),
      "q95_funnel" -> (d => ops.EventOps.q95.run(spark, d)),
      "q96_cohort_retention" -> (d => ops.EventOps.q96.run(spark, d)),
      "q111_rolling_active_users" -> (d => ops.EventOps.q111.run(spark, d)),
      "q122_event_transitions" -> (d => ops.EventOps.q122.run(spark, d)),
      "q123_volume_anomaly" -> (d => ops.EventOps.q123.run(spark, d)))

    val pts = Seq(1 -> base, factor -> big)
    pts.foreach { case (_, d) =>
      spark.read.parquet(s"$d/events.parquet").count()
    }
    // noop sink, not count(): under count() Catalyst prunes unused
    // columns and with them entire operators — q93's as-of window
    // vanishes (its output feeds only the final projection), so the
    // "measurement" reads a scan+filter count. The noop write executes
    // the FULL plan and materializes every output column, with no
    // driver collect.
    def execute(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    evs.foreach { case (name, run) =>
      val res = pts.map { case (f, d) =>
        val samples = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          execute(run(d))
          val sec = (System.nanoTime() - t0) / 1e9
          ops.SessionScratch.evictTransients()
          sec
        }
        (f, samples.min, samples.head)
      }
      val (_, t1, i1) = res.head
      val (_, t2, i2) = res.last
      println(f"""{"op":"$name","factor":$factor,"sec_sf01":$t1%.2f,""" +
        f""""sec_big":$t2%.2f,"time_ratio":${t2 / t1}%.2f,""" +
        f""""ingest_sf01":$i1%.2f,"ingest_big":$i2%.2f}""")
    }
    spark.stop()
  }
}
