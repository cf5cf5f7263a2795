package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.ops.{EventOps, Tables}
import graft.streaming.StreamingOps

/** Streaming twins must equal their batch counterparts — the oracle can
  * only check batch, so these tests close the loop for streaming
  * semantics (SURVEY.md §2.9).
  */
class StreamingSpec extends SparkTestBase {

  /** Stage the single events parquet file into a directory (streaming
    * file source lists directories).
    */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft_events_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("streaming tumbling agg == batch twin (q90 grouping)") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val got = runToMemory(StreamingOps.tumblingAgg(stream), "tumbling",
      "complete")
      .orderBy(col("win_start"), col("event_type")).collect()
    val want = EventOps.q90.run(spark, sfDir)
      .select(col("win_start"), col("event_type"), col("n_events"),
        col("sum_value"))
      .orderBy(col("win_start"), col("event_type")).collect()
    assert(got.map(_.toString) sameElements want.map(_.toString))
  }

  test("streaming sliding agg == batch twin (q90b grouping)") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val got = runToMemory(StreamingOps.slidingAgg(stream), "sliding",
      "complete")
      .orderBy(col("win_start"), col("event_type")).collect()
    val want = EventOps.q90b.run(spark, sfDir)
      .select(col("win_start"), col("event_type"), col("n_events"),
        col("sum_value"))
      .orderBy(col("win_start"), col("event_type")).collect()
    assert(got.map(_.toString) sameElements want.map(_.toString))
  }

  test("streaming session windows == batch twin (q91 grouping)") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val got = runToMemory(StreamingOps.sessionAgg(stream), "sessions",
      "complete")
      .orderBy(col("user_id"), col("session_start")).collect()
    val want = EventOps.q91.run(spark, sfDir)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .orderBy(col("user_id"), col("session_start")).collect()
    assert(got.map(_.toString) sameElements want.map(_.toString))
  }

  test("streaming dedup-within-watermark keeps one row per key") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val got = runToMemory(StreamingOps.dedupByKey(stream), "dedup", "append")
    val batchKeys = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type")).distinct().count()
    assert(got.select("user_id", "event_type").distinct().count() == batchKeys)
    assert(got.count() == batchKeys)
  }

  test("stream-stream interval join == batch twin (q94)") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val got = runToMemory(StreamingOps.attributionJoin(stream),
      "attribution", "append")
      .orderBy(col("user_id"), col("click_id"), col("purchase_id")).collect()
    val want = EventOps.q94.run(spark, sfDir).collect()
    assert(got.map(_.toString) sameElements want.map(_.toString))
  }

  test("checkpointed streaming restart restores state and skips committed files") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val srcDir = Files.createTempDirectory("graft_ckpt_src")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val outName = "ckpt_out"
    def runOnce(): Long = {
      val q = StreamingOps
        .tumblingAgg(StreamingOps.readEvents(spark, srcDir.toString))
        .writeStream.format("memory").queryName(outName)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      val n = spark.table(outName)
        .agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
      q.stop()
      n
    }
    val first = runOnce()
    val totalEvents = Tables(spark, sfDir).events.count()
    assert(first == totalEvents)
    // add a SECOND copy of the data, restart from the checkpoint: the
    // committed file is NOT reprocessed, but restored state merges with
    // the new file -> totals double (state lost would give 1x; full
    // reprocess without offsets would also give 2x but from scratch --
    // the checkpointed offsets + state together give exactly one extra)
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val second = runOnce()
    assert(second == 2 * totalEvents)
  }

  test("parquet file sink is exactly-once across restarts (commit log)") {
    val srcDir = Files.createTempDirectory("graft_fsink_src")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val outDir = Files.createTempDirectory("graft_fsink_out").toString
    val ckpt = Files.createTempDirectory("graft_fsink_ckpt").toString
    def runOnce(): Unit = {
      val q = StreamingOps.readEvents(spark, srcDir.toString)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    val total = Tables(spark, sfDir).events.count()
    runOnce()
    assert(spark.read.parquet(outDir).count() == total)
    // restart with NO new input: the sink commit log prevents both
    // reprocessing and duplicate file registration
    runOnce()
    assert(spark.read.parquet(outDir).count() == total)
    // new input file -> exactly the delta is appended
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    runOnce()
    assert(spark.read.parquet(outDir).count() == 2 * total)
    // distinct event ids stay intact (no partial-file double counts)
    assert(spark.read.parquet(outDir).select("event_id").distinct()
      .count() == Tables(spark, sfDir).events
      .select("event_id").distinct().count())
  }

  test("flatMapGroupsWithState new-type emission == batch DISTINCT pairs") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val got = runToMemory(
      StreamingOps.newEventTypes(spark, stream), "newtypes", "append")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
  }

  test("stateful streaming funnel == oracle-proven batch q95") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val milestones = runToMemory(
      StreamingOps.funnelMilestones(spark, stream), "funnel", "update")
    // last emitted row per user is the final state; fold the funnel
    // counts from it exactly as q95 does from its per-user relation
    val finalState = milestones
      .groupBy(col("user_id"))
      .agg(min(col("signup_us")).as("s"), min(col("click_us")).as("c"),
        min(col("purchase_us")).as("p"))
    val got = finalState.agg(
      count(lit(1)).as("users"),
      count(col("s")).as("signed"),
      count(when(col("c") > col("s"), 1)).as("clicked_after"),
      count(when(col("p") > col("c") && col("c") > col("s"), 1))
        .as("converted")).head()
    val want = graft.ops.EventOps.q95.run(spark, sfDir).head()
    assert(got.toString == want.toString)
  }

  test("streaming CDC merge via foreachBatch: change batches upsert the snapshot") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val snapDir = Files.createTempDirectory("cdc_snap").toString
    val chgDir = Files.createTempDirectory("cdc_chg")
    val ckpt = Files.createTempDirectory("cdc_ckpt").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
      .write.mode("overwrite").parquet(snapDir)
    val chgSchema = StructType(Seq(
      StructField("k", LongType), StructField("name", StringType),
      StructField("bal", DoubleType), StructField("op", StringType)))
    def runOnce(): Unit = {
      val q = spark.readStream.schema(chgSchema).parquet(chgDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val snap = spark.read.parquet(snapDir)
          // materialize BEFORE overwriting the path being read
          val merged = graft.etl.MergeOps
            .merge(snap, batch, "k", "op").drop("action")
            .localCheckpoint()
          merged.write.mode("overwrite").parquet(snapDir)
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    // the file source lists only the top level — stage each change
    // batch's part-file into the root under a unique name
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("cdc_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, chgDir.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    // batch 1: update k=1, insert k=4
    stage(Seq((1L, "a2", 11.0, "U"), (4L, "d", 40.0, "I"))
      .toDF("k", "name", "bal", "op"), "b1.parquet")
    runOnce()
    // batch 2: delete k=2, update the batch-1 insert
    stage(Seq((2L, "b", 20.0, "D"), (4L, "d2", 44.0, "U"))
      .toDF("k", "name", "bal", "op"), "b2.parquet")
    runOnce()
    val got = spark.read.parquet(snapDir).orderBy(col("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "a2", 11.0), (3L, "c", 30.0),
      (4L, "d2", 44.0)))
  }

  test("mapGroupsWithState running counts == batch groupBy (final state)") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val got = runToMemory(
      StreamingOps.statefulUserCounts(spark, stream), "stateful", "update")
    // one micro-batch -> emitted state is the final count per user
    val gotMap = got.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = Tables(spark, sfDir).events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(gotMap.keySet == want.keySet)
    want.foreach { case (k, (n, v)) =>
      assert(gotMap(k)._1 == n, s"count for user $k")
      assert(math.abs(gotMap(k)._2 - v) < 1e-6, s"sum for user $k")
    }
  }

  test("stream-static incremental exact dedup == batch anti-join twin") {
    val t = Tables(spark, sfDir)
    val existing = t.documents.filter(col("doc_id") % 2 === 0)
    // stage the "new crawl" (odd ids) as a streaming source directory
    // the crawl = odd ids PLUS re-crawled copies of 10 existing texts
    // under fresh ids (the fixture has no cross-parity exact dups)
    val recrawled = existing.limit(10)
      .withColumn("doc_id", col("doc_id") + 10000L)
    val crawl = t.documents.filter(col("doc_id") % 2 === 1)
      .unionByName(recrawled)
    val dir = Files.createTempDirectory("graft_docs_stream")
    crawl.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream
      .schema(t.documents.schema).parquet(dir.toString)
    val got = runToMemory(
      StreamingOps.incrementalExactDedup(stream, existing),
      "incdedup", "append")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val want = crawl
      .withColumn("content_key", md5(col("text")))
      .join(existing.select(md5(col("text")).as("content_key")).distinct(),
        Seq("content_key"), "left_anti")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(got.nonEmpty && got.length < crawl.count(),
      "the re-crawled copies must be dropped")
    assert(got.forall(_ < 10000L), "every re-crawled id must be dropped")
    assert(got.toSeq == want.toSeq)
  }

  test("streaming per-source quota: caps bind across micro-batches") {
    import spark.implicits._
    val t = Tables(spark, sfDir)
    val cap = 3L
    // two micro-batches from the same sources: the second batch must
    // see the FIRST batch's admitted counts (cross-batch state), so a
    // source exhausted in batch 1 admits nothing in batch 2
    val dir = Files.createTempDirectory("graft_docs_quota")
    val docs = t.documents.select(col("doc_id"), col("source"),
      col("n_chars").cast("long").as("n_chars"))
    val batch1 = docs.filter(col("doc_id") < 25)
    val batch2 = docs.filter(col("doc_id") >= 25)
    batch1.coalesce(1).write.parquet(s"$dir/b=1")
    val stream = spark.readStream
      .schema(batch1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/b=*")
    val q = StreamingOps.sourceQuota(spark, stream, cap)
      .writeStream.format("memory").queryName("quota")
      .outputMode("append").start()
    q.processAllAvailable()
    val afterB1 = spark.table("quota").collect().length
    batch2.coalesce(1).write.parquet(s"$dir/b=2")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("quota").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // per-source cap holds globally across both batches
    val bySource = got.groupBy(_._2).view.mapValues(_.length)
    assert(bySource.values.forall(_ <= cap))
    // batch 2 really flowed: some admitted doc must come from it
    assert(got.exists(_._1 >= 25), "no batch-2 doc was admitted")
    assert(afterB1 < got.length, "batch 2 admitted nothing new")
    // equals the per-batch quality rule: within each batch a source
    // admits its best remaining docs by q77's key (n_chars DESC,
    // doc_id ASC) until its cross-batch cap is exhausted
    def best(rows: Array[(Long, String, Long)], k: Int) =
      rows.sortBy { case (id, _, nc) => (-nc, id) }.take(k)
    val b1 = batch1.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2)))
    val b2 = batch2.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = (b1 ++ b2).map(_._2).distinct.flatMap { src =>
      val first = best(b1.filter(_._2 == src), cap.toInt)
      val second = best(b2.filter(_._2 == src), cap.toInt - first.length)
      (first ++ second).map { case (id, s, _) => (id, s) }
    }.toSet
    assert(got.toSet == want)
  }

  test("stream-fed daily rollup + shared anomaly tail == batch q123") {
    // the lambda-architecture-free split: the stream maintains the
    // O(days) daily rollup; the anomaly pass runs the SAME
    // dailyVolumeAnomaly code over the sink that batch q123 runs over
    // its own rollup — one definition of "anomalous", byte-equal output
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val sink = runToMemory(StreamingOps.dailyCounts(stream),
      "daily_counts", "complete")
    val got = EventOps.dailyVolumeAnomaly(sink).collect()
    val want = EventOps.q123.run(spark, sfDir).collect()
    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) =>
      assert(g.toString == w.toString, s"drift: $g vs $w") }
  }

  test("streaming histogram bins merge additively == batch histogram") {
    // q163's scale claim is that fixed-bin counts are MERGEABLE
    // (partials combine by addition); a streaming aggregation over the
    // same bin rule is that property exercised live — micro-batch
    // partials merge into state, and the final histogram must equal
    // the batch one bin-for-bin
    val ordersDir = {
      val dir = Files.createTempDirectory("graft_orders_stream")
      Files.copy(Paths.get(s"$sfDir/orders.parquet"),
        dir.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
      dir.toString
    }
    val batch = Tables(spark, sfDir).orders
    val r = batch.agg(min(col("o_totalprice")), max(col("o_totalprice")))
      .head()
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    def bin(df: org.apache.spark.sql.DataFrame) = df
      .select(col("o_orderpriority"),
        least(lit(1023L), floor((col("o_totalprice") - mn) * 1024 /
          (mx - mn)).cast("long")).as("b"))
      .groupBy(col("o_orderpriority"), col("b"))
      .agg(count(lit(1)).as("c"))
    val stream = spark.readStream.schema(batch.schema).parquet(ordersDir)
    val got = runToMemory(bin(stream), "hist_stream", "complete")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val want = bin(batch)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("streaming classifier scoring via foreachBatch == batch q168") {
    // model inference over a document stream: each micro-batch scores
    // through the SAME classifierScores core the q168 gate query runs
    // (stateless per-doc scoring — broadcast weights, no cross-batch
    // state), appending results to a sink. Two-batch split proves the
    // composition; equality with the batch run is by shared code, and
    // THAT code is what the DuckDB oracle already hash-checks.
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
    val docsDir = Files.createTempDirectory("graft_docs_stream")
    val outDir = Files.createTempDirectory("clf_out").toString
    val ckpt = Files.createTempDirectory("clf_ckpt").toString
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("clf_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, docsDir.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    def runOnce(): Unit = {
      val q = spark.readStream.schema(docs.schema)
        .parquet(docsDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.llmops.Curation.classifierScores(batch)
            .write.mode("append").parquet(outDir)
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    stage(docs.filter(col("doc_id") % 2 === 0), "b1.parquet")
    runOnce()
    stage(docs.filter(col("doc_id") % 2 === 1), "b2.parquet")
    runOnce()
    val got = spark.read.parquet(outDir).orderBy(col("doc_id"))
      .collect().map(_.toString).toSeq
    val want = graft.llmops.Curation.q168.run(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want)
  }

  /** Stage a frame as one parquet file named `name` inside `dir`. */
  private def stageInto(dir: java.nio.file.Path,
      df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val tmp = Files.createTempDirectory("graft_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, dir.resolve(name),
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  test("streaming TV-distance drift == batch q170 (additive bin state)") {
    // monitoring is the operator class that RUNS continuously: each
    // micro-batch contributes exact-int64 (source, bin) partial counts
    // — the monitor's whole state — which merge by ADDITION; the TV
    // readout re-aggregates the accumulated state grid. After all
    // batches the readout must equal the single-pass batch gate query
    // bit-exactly (integer state + one boundary division).
    import graft.llmops.Curation
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"), col("n_chars"))
    // production fixed-bin monitoring: bounds are a deployment constant
    // (here: the corpus bounds, so the twin and the gate bin alike)
    val r0 = docs.agg(min(col("n_chars")), max(col("n_chars"))).head()
    val (mn, mx) = (r0.getLong(0), r0.getLong(1))
    val inDir = Files.createTempDirectory("graft_drift_stream")
    val stateDir = Files.createTempDirectory("drift_state").toString
    val ckpt = Files.createTempDirectory("drift_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.schema(docs.schema).parquet(inDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Curation.driftSrcBins(batch, mn, mx)
            .write.mode("append").parquet(stateDir)
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    stageInto(inDir, docs.filter(col("doc_id") % 2 === 0), "b1.parquet")
    runOnce()
    stageInto(inDir, docs.filter(col("doc_id") % 2 === 1), "b2.parquet")
    runOnce()
    val merged = spark.read.parquet(stateDir)
      .groupBy(col("source"), col("b")).agg(sum(col("cb")).as("cb"))
    val got = Curation.driftTv(merged).collect().map(_.toString).toSeq
    val want = Curation.q170.run(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("drift state bins clamp to [0, B) for out-of-range micro-batches") {
    import spark.implicits._
    // under FIXED deployment bounds a later micro-batch can carry
    // values outside [mn, mx]; both tails must clamp into the grid
    // (an unclamped low side emits negative bins with engine-dependent
    // rounding — Spark's div truncates, DuckDB's // floors)
    val docs = Seq((1L, "s1", 5L), (2L, "s1", 500L), (3L, "s2", 50L))
      .toDF("doc_id", "source", "n_chars")
    val bins = graft.llmops.Curation.driftSrcBins(docs, mn = 10L, mx = 100L)
      .select(col("b")).collect().map(_.getLong(0))
    assert(bins.nonEmpty)
    assert(bins.forall(b =>
      b >= 0 && b < graft.llmops.Curation.DriftBins))
    assert(bins.contains(0L) &&
      bins.contains(graft.llmops.Curation.DriftBins - 1L))
  }

  test("streaming embedding drift == batch q171 (additive sum state)") {
    // same shape in representation space: per-batch exact fixed-point
    // (label, dim) component sums + vector counts are the state; the
    // centroid-shift readout runs over the merged |labels|×dims grid.
    import graft.llmops.Curation
    val emb = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("label"), col("embedding"))
    val inDir = Files.createTempDirectory("graft_emb_stream")
    val stateDir = Files.createTempDirectory("emb_state").toString
    val ckpt = Files.createTempDirectory("emb_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.schema(emb.schema).parquet(inDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Curation.embedLabelSums(batch.select(col("label"),
              col("embedding")))
            .write.mode("append").parquet(stateDir)
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    stageInto(inDir, emb.filter(col("vec_id") % 2 === 0), "b1.parquet")
    runOnce()
    stageInto(inDir, emb.filter(col("vec_id") % 2 === 1), "b2.parquet")
    runOnce()
    val merged = spark.read.parquet(stateDir)
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("sc")).as("sc"), sum(col("cnt")).as("cnt"))
    // the corpus vector count is derivable from the state itself: cnt
    // at any one dim sums to it
    val big = merged.filter(col("pos") === 0)
      .agg(sum(col("cnt"))).head().getLong(0)
    val got = Curation.embedDrift(merged, big)
      .collect().map(_.toString).toSeq
    val want = Curation.q171.run(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("streaming persisted-index maintenance via foreachBatch == " +
    "sequential batch appends (DedupIndex as the stream's state)") {
    // the daily crawl is naturally a stream; DedupIndex.append per
    // micro-batch is the pipeline-shaped form of q46's maintenance —
    // the cross-batch state is the ON-DISK index itself (q155's
    // stream-static pattern with a persisted sink). The twin: N
    // micro-batch appends must leave an index row-identical to the
    // same N waves appended in batch mode, with identical survivors —
    // so batch-2 docs dedup against batch-1 SURVIVORS, across a
    // stream restart (fresh query per wave, shared checkpoint).
    import graft.llmops.DedupIndex
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 3 === 0)
    val wave1 = docs.filter(col("doc_id") % 3 === 1)
    val wave2 = docs.filter(col("doc_id") % 3 === 2)

    // batch side: sequential appends
    val batchIdx = Files.createTempDirectory("didx_batch").toString
    DedupIndex.build(base, batchIdx)
    val sB1 = DedupIndex.append(wave1, batchIdx)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    graft.ops.SessionScratch.evictTransients()
    val sB2 = DedupIndex.append(wave2, batchIdx)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    graft.ops.SessionScratch.evictTransients()

    // stream side: same waves as micro-batches through foreachBatch
    val streamIdx = Files.createTempDirectory("didx_stream").toString
    DedupIndex.build(base, streamIdx)
    val inDir = Files.createTempDirectory("didx_in")
    val survOut = Files.createTempDirectory("didx_surv").toString
    val ckpt = Files.createTempDirectory("didx_ckpt").toString
    var batches = 0
    def runOnce(): Unit = {
      val q = spark.readStream.schema(docs.schema).parquet(inDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          DedupIndex.append(batch, streamIdx)
            .write.mode("append").parquet(survOut)
          graft.ops.SessionScratch.evictTransients()
          batches += 1
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    stageInto(inDir, wave1, "w1.parquet")
    runOnce()
    stageInto(inDir, wave2, "w2.parquet")
    runOnce()
    assert(batches == 2, s"expected two micro-batches, saw $batches")

    // index row-identical to the batch twin's
    val a = DedupIndex.signatures(spark, streamIdx)
    val b = DedupIndex.signatures(spark, batchIdx)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "streamed index must equal the batch-appended index row-for-row")
    // survivors identical per wave (wave-1 ids ≡ %3==1, wave-2 ≡ %3==2)
    val got = spark.read.parquet(survOut).select(col("doc_id"))
      .collect().map(_.getLong(0))
    assert(got.filter(_ % 3 == 1).sorted.sameElements(sB1))
    assert(got.filter(_ % 3 == 2).sorted.sameElements(sB2))
    // and the stream really dropped something (cross-wave dups exist)
    assert(got.length < wave1.count() + wave2.count())
  }

  test("streaming IVF maintenance via foreachBatch == sequential batch " +
    "appends (assignments under the recorded centroids)") {
    // the embedding-side twin of the dedup-index stream: vectors arrive
    // as micro-batches, each assigned under the RECORDED centroids and
    // appended — no retrain, so the on-disk index after N micro-batches
    // must equal the batch-mode appends of the same waves row-for-row
    import graft.llmops.IvfIndex
    val embs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
    val base = embs.filter(col("vec_id") % 3 === 0)
    val wave1 = embs.filter(col("vec_id") % 3 === 1)
    val wave2 = embs.filter(col("vec_id") % 3 === 2)

    val batchIdx = Files.createTempDirectory("ivfx_batch").toString
    IvfIndex.build(base, batchIdx, k = 4)
    IvfIndex.append(wave1, batchIdx)
    IvfIndex.append(wave2, batchIdx)

    val streamIdx = Files.createTempDirectory("ivfx_stream").toString
    IvfIndex.build(base, streamIdx, k = 4)
    val inDir = Files.createTempDirectory("ivfx_in")
    val ckpt = Files.createTempDirectory("ivfx_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.schema(embs.schema).parquet(inDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          IvfIndex.append(batch, streamIdx)
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    stageInto(inDir, wave1, "w1.parquet")
    runOnce()
    stageInto(inDir, wave2, "w2.parquet")
    runOnce()

    val a = spark.read.parquet(IvfIndex.dataDir(spark, streamIdx))
      .selectExpr("member_id", "cell")
    val b = spark.read.parquet(IvfIndex.dataDir(spark, batchIdx))
      .selectExpr("member_id", "cell")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "streamed IVF index must equal the batch-appended index")
    assert(a.count() == embs.count(), "every vector indexed exactly once")

    // provenance twin: n_appended accumulates ADDITIVELY across
    // micro-batches to exactly the batch store's value, and the
    // cumulative growth flips the q230/q234 republish decision (two
    // waves on a one-third base is 67% appended — over the 25% rule)
    import graft.llmops.StoreRemediator
    val tsStream = IvfIndex.fsck(spark, streamIdx).trainStats.get
    val tsBatch = IvfIndex.fsck(spark, batchIdx).trainStats.get
    assert(tsStream == tsBatch,
      "streamed provenance must equal the batch twin's")
    assert(tsStream.nTrain == base.count() &&
      tsStream.nAppended == wave1.count() + wave2.count())
    assert(StoreRemediator.needsRepublish(tsStream),
      "cumulative micro-batch growth must flip the republish decision")
  }

  test("streaming takedown feed via foreachBatch == one batch delete " +
    "(tombstones accumulate across micro-batches)") {
    // deletes arrive operationally as a stream too (DSR/opt-out
    // queues); IvfIndex.delete per micro-batch is the tombstone
    // counterpart of the append twin — after N micro-batch deletes the
    // masked member set and the search results must equal one batch
    // delete of the union
    import graft.llmops.IvfIndex
    val embs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
    def freshIdx(tag: String): String = {
      val p = Files.createTempDirectory(tag).toString
      IvfIndex.build(embs.filter(col("vec_id") % 2 === 0), p, k = 4)
      IvfIndex.append(embs.filter(col("vec_id") % 2 === 1), p)
      p
    }
    val delAll = embs.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"))
    val wave1 = delAll.filter(col("vec_id") % 20 === 0)
    val wave2 = delAll.filter(col("vec_id") % 20 =!= 0)

    val batchIdx = freshIdx("ivfdel_batch")
    IvfIndex.delete(delAll, batchIdx)

    val streamIdx = freshIdx("ivfdel_stream")
    val inDir = Files.createTempDirectory("ivfdel_in")
    val ckpt = Files.createTempDirectory("ivfdel_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.schema(delAll.schema)
        .parquet(inDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          IvfIndex.delete(batch, streamIdx)
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    stageInto(inDir, wave1, "d1.parquet")
    runOnce()
    stageInto(inDir, wave2, "d2.parquet")
    runOnce()

    val a = IvfIndex.members(spark, streamIdx)
      .selectExpr("member_id", "cell")
    val b = IvfIndex.members(spark, batchIdx)
      .selectExpr("member_id", "cell")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "streamed deletes must mask the same member set as one batch " +
        "delete")
    assert(a.filter(col("member_id") % 10 === 0).count() == 0)
    val q10 = embs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("eq"))
    val ra = IvfIndex.search(q10, streamIdx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    val rb = IvfIndex.search(q10, batchIdx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    assert(ra.sameElements(rb),
      "search after streamed deletes must equal the batch-delete twin")
  }

  test("streaming IVF-PQ maintenance via foreachBatch == sequential " +
    "batch appends (cells + codes under the recorded artifacts)") {
    // the codes-only store streamed: each micro-batch is assigned AND
    // PQ-encoded under the recorded centroids/codebook — neither is
    // retrained, so the code table after N micro-batches must equal
    // the batch-mode appends row-for-row
    import graft.llmops.IvfPqIndex
    val embs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
    val base = embs.filter(col("vec_id") % 3 === 0)
    val wave1 = embs.filter(col("vec_id") % 3 === 1)
    val wave2 = embs.filter(col("vec_id") % 3 === 2)

    val batchIdx = Files.createTempDirectory("ivfpqx_batch").toString
    IvfPqIndex.build(base, batchIdx, k = 4)
    IvfPqIndex.append(wave1, batchIdx)
    IvfPqIndex.append(wave2, batchIdx)

    val streamIdx = Files.createTempDirectory("ivfpqx_stream").toString
    IvfPqIndex.build(base, streamIdx, k = 4)
    val inDir = Files.createTempDirectory("ivfpqx_in")
    val ckpt = Files.createTempDirectory("ivfpqx_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.schema(embs.schema).parquet(inDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          IvfPqIndex.append(batch, streamIdx)
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    stageInto(inDir, wave1, "w1.parquet")
    runOnce()
    stageInto(inDir, wave2, "w2.parquet")
    runOnce()

    val a = spark.read.parquet(IvfPqIndex.dataDir(spark, streamIdx))
      .selectExpr("vec_id", "cell", "s", "cw")
    val b = spark.read.parquet(IvfPqIndex.dataDir(spark, batchIdx))
      .selectExpr("vec_id", "cell", "s", "cw")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "streamed IVF-PQ codes must equal the batch-appended codes")
    assert(a.count() == embs.count() * IvfPqIndex.M,
      "every vector coded exactly once, M rows each")
  }

  test("streaming kNN-graph maintenance via foreachBatch == sequential " +
    "batch appends (forward + reverse edges under the recorded " +
    "artifacts)") {
    // the graph-index twin: each micro-batch is assigned under the
    // RECORDED centroids, edged against (existing ∪ batch) same-cell
    // members, and appended with reverses — so the on-disk member AND
    // edge row sets after N micro-batches must equal the batch-mode
    // appends of the same waves
    import graft.llmops.GraphIndex
    val embs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
    val base = embs.filter(col("vec_id") % 3 === 0)
    val wave1 = embs.filter(col("vec_id") % 3 === 1)
    val wave2 = embs.filter(col("vec_id") % 3 === 2)

    val batchIdx = Files.createTempDirectory("grx_batch").toString
    GraphIndex.build(base, batchIdx, k = 4)
    GraphIndex.append(wave1, batchIdx)
    GraphIndex.append(wave2, batchIdx)

    val streamIdx = Files.createTempDirectory("grx_stream").toString
    GraphIndex.build(base, streamIdx, k = 4)
    val inDir = Files.createTempDirectory("grx_in")
    val ckpt = Files.createTempDirectory("grx_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.schema(embs.schema).parquet(inDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          GraphIndex.append(batch, streamIdx)
          graft.ops.SessionScratch.evictTransients()
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    stageInto(inDir, wave1, "w1.parquet")
    runOnce()
    stageInto(inDir, wave2, "w2.parquet")
    runOnce()

    val a = spark.read.parquet(GraphIndex.dataDir(spark, streamIdx))
      .selectExpr("kind", "member_id", "cell", "src", "dst")
    val b = spark.read.parquet(GraphIndex.dataDir(spark, batchIdx))
      .selectExpr("kind", "member_id", "cell", "src", "dst")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "streamed graph store must equal the batch-appended store")
    // identical search answers off both
    val q10 = embs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("eq"))
    val hs = GraphIndex.search(q10, streamIdx).collect().map(_.toString)
    val hb = GraphIndex.search(q10, batchIdx).collect().map(_.toString)
    assert(hs.sameElements(hb))
  }

  test("streaming semantic-dedup ingest via foreachBatch == sequential " +
    "batch ingests (IvfIndex.dedupIngest as the stream's state)") {
    // the embedding flavor of the dedup-index stream: each micro-batch
    // is semantic-probed against the on-disk IVF index and only the
    // survivors' rows admitted — wave-2 vectors must dedup against
    // wave-1 SURVIVORS, never wave-1 rejects, across a stream restart
    import graft.llmops.IvfIndex
    val embs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
    val base = embs.filter(col("vec_id") % 3 === 0)
    val wave1 = embs.filter(col("vec_id") % 3 === 1)
    val wave2 = embs.filter(col("vec_id") % 3 === 2)

    val batchIdx = Files.createTempDirectory("sdx_batch").toString
    IvfIndex.build(base, batchIdx, k = 4)
    val sB1 = IvfIndex.dedupIngest(wave1, batchIdx)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted
    graft.ops.SessionScratch.evictTransients()
    val sB2 = IvfIndex.dedupIngest(wave2, batchIdx)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted
    graft.ops.SessionScratch.evictTransients()

    val streamIdx = Files.createTempDirectory("sdx_stream").toString
    IvfIndex.build(base, streamIdx, k = 4)
    val inDir = Files.createTempDirectory("sdx_in")
    val survOut = Files.createTempDirectory("sdx_surv").toString
    val ckpt = Files.createTempDirectory("sdx_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.schema(embs.schema).parquet(inDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          IvfIndex.dedupIngest(batch, streamIdx)
            .select(col("vec_id"))
            .write.mode("append").parquet(survOut)
          graft.ops.SessionScratch.evictTransients()
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    stageInto(inDir, wave1, "w1.parquet")
    runOnce()
    stageInto(inDir, wave2, "w2.parquet")
    runOnce()

    val a = spark.read.parquet(IvfIndex.dataDir(spark, streamIdx))
      .selectExpr("member_id", "cell")
    val b = spark.read.parquet(IvfIndex.dataDir(spark, batchIdx))
      .selectExpr("member_id", "cell")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "streamed semantic-dedup index must equal the batch twin")
    val got = spark.read.parquet(survOut).select(col("vec_id"))
      .collect().map(_.getLong(0))
    assert(got.filter(_ % 3 == 1).sorted.sameElements(sB1))
    assert(got.filter(_ % 3 == 2).sorted.sameElements(sB2))
    assert(got.length < wave1.count() + wave2.count(),
      "the stream must drop at least one semantic near-dup")
  }

  test("streaming text-index maintenance via foreachBatch == batch " +
    "appends (postings + exact-integer stats)") {
    import graft.llmops.TextIndex
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 3 === 0)
    val wave1 = docs.filter(col("doc_id") % 3 === 1)
    val wave2 = docs.filter(col("doc_id") % 3 === 2)

    val batchIdx = Files.createTempDirectory("tix_batch").toString
    TextIndex.build(base, batchIdx)
    TextIndex.append(wave1, batchIdx)
    TextIndex.append(wave2, batchIdx)

    val streamIdx = Files.createTempDirectory("tix_stream").toString
    TextIndex.build(base, streamIdx)
    val inDir = Files.createTempDirectory("tix_in")
    val ckpt = Files.createTempDirectory("tix_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.schema(docs.schema).parquet(inDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          TextIndex.append(batch, streamIdx)
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    stageInto(inDir, wave1, "w1.parquet")
    runOnce()
    stageInto(inDir, wave2, "w2.parquet")
    runOnce()

    val a = TextIndex.postings(spark, streamIdx)
    val b = TextIndex.postings(spark, batchIdx)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "streamed postings must equal the batch-appended postings")
    assert(TextIndex.stats(spark, streamIdx) ==
      TextIndex.stats(spark, batchIdx))
    // and the search answers identically off both
    val terms = Seq("spark", "join", "window")
    val sa = TextIndex.search(spark, streamIdx, terms)
      .collect().map(_.toString).toSeq
    val sb = TextIndex.search(spark, batchIdx, terms)
      .collect().map(_.toString).toSeq
    assert(sa.nonEmpty && sa == sb)
  }

  test("streaming n-gram-LM maintenance via foreachBatch == batch " +
    "appends (additive partials merge identically)") {
    import graft.llmops.NgramIndex
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 3 === 0)
    val wave1 = docs.filter(col("doc_id") % 3 === 1)
    val wave2 = docs.filter(col("doc_id") % 3 === 2)

    val batchIdx = Files.createTempDirectory("nix_batch").toString
    NgramIndex.build(base, batchIdx)
    NgramIndex.append(wave1, batchIdx)
    NgramIndex.append(wave2, batchIdx)

    val streamIdx = Files.createTempDirectory("nix_stream").toString
    NgramIndex.build(base, streamIdx)
    val inDir = Files.createTempDirectory("nix_in")
    val ckpt = Files.createTempDirectory("nix_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.schema(docs.schema).parquet(inDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          NgramIndex.append(batch, streamIdx)
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    stageInto(inDir, wave1, "w1.parquet")
    runOnce()
    stageInto(inDir, wave2, "w2.parquet")
    runOnce()

    val a = NgramIndex.lm(spark, streamIdx)
    val b = NgramIndex.lm(spark, batchIdx)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "streamed partials must merge to the batch-appended model")
  }

  test("streaming decontamination via foreachBatch == batch q224 " +
    "survivor set (per-doc stateless against the static test index)") {
    // the train corpus arrives as a crawl stream; each micro-batch is
    // decontaminated through the SAME Dedup.decontaminateSurvivors
    // core the q224 gate runs, against the STATIC test-split span
    // index. Per-doc decisions are stateless, so N micro-batches must
    // union to exactly the one-batch survivor set — the q155
    // stream-static discipline on the decontamination operator.
    import graft.llmops.{Dedup, PortableHash}
    val base = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"), col("text"),
        PortableHash.splitDraw(col("doc_id")).as("bk"))
    val testIdx = Dedup.spanIndex(base.filter(col("bk") >= 900))
      .localCheckpoint()
    val train = base.filter(col("bk") < 800)
      .select(col("doc_id"), col("source"), col("text"))

    val want = Dedup.decontaminateSurvivors(train, testIdx)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(want.size < train.count(),
      "the fixture must plant cross-split duplicated spans")

    val inDir = Files.createTempDirectory("decon_in")
    val outDir = Files.createTempDirectory("decon_out").toString
    val ckpt = Files.createTempDirectory("decon_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.schema(train.schema)
        .parquet(inDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Dedup.decontaminateSurvivors(batch, testIdx)
            .select(col("doc_id"), col("source"))
            .write.mode("append").parquet(outDir)
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    stageInto(inDir, train.filter(col("doc_id") % 2 === 0), "b1.parquet")
    runOnce()
    stageInto(inDir, train.filter(col("doc_id") % 2 === 1), "b2.parquet")
    runOnce()

    val got = spark.read.parquet(outDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want,
      "streamed survivors must equal the one-batch decontamination")
  }
}
