package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query at
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * A short warmup (session init, codegen, parquet footer cache) runs
  * before timing so the first query measured doesn't absorb one-off JVM
  * costs — mirroring steady-state behavior on a long-lived cluster.
  *
  * Contention-evident measurement (round-5 postmortem): BENCH_r05 was
  * contaminated by co-tenant machine load and consecutive-rep
  * min-of-N could not reject it — all reps of a query shared one
  * contention window, so the min was as polluted as the max. Two
  * changes make a contaminated round detectable from the JSON alone:
  *
  *  1. ROUND-ROBIN reps: the full registry runs as pass 1, then
  *     repeats as pass 2, ... Per-query repeats are now separated by
  *     the whole registry's wall time (~minutes), so a contention
  *     burst poisons one PASS, not every sample of one query — the
  *     min is taken over independent windows.
  *  2. CALIBRATION SENTINELS: two fixed ops are timed before each
  *     pass and after the last. On an idle box their times are flat;
  *     under external load they spread. The JSON carries the per-pass
  *     sentinel times, their max/min spreads, and
  *     `contention_suspect` (either spread > 2.0) — a judge can
  *     reject a round without re-running anything.
  *
  *     a. CPU sentinel: constant hash-sum work across all cores, zero
  *        I/O — moves only under CPU/scheduler competition.
  *     b. IO sentinel (round-14, the BENCH_r13 postmortem): a
  *        fixed-size scratch parquet write + full read-back + an
  *        fsync'd raw slab — moves under DISK and page-cache
  *        competition. BENCH_r13's driver window read the
  *        store-ingest gates at 3-8× their clean values while the
  *        CPU-only sentinel certified the window clean (spread 1.10):
  *        a CPU sentinel is structurally blind to exactly the
  *        contention mode that store builds, transient checkpoints,
  *        and parquet ingest pay. The IO sentinel times the same
  *        write-commit-read path those gates use, so an IO-contended
  *        window now flags itself.
  *
  * The spreads compare only samples taken AFTER at least one full
  * registry pass: running 150+ queries measurably slows the sentinel
  * (~2-2.5× — code-cache/GC state, observed on an idle box), so
  * including the pristine pre-pass-1 sample flags "contention" on
  * every clean run. The pre samples are still reported (first element
  * of `sentinel_sec` / `io_sentinel_sec`) — they carry the
  * warmup-quality signal, just not the contention verdict.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Fixed calibration op: ~constant CPU work across all cores, no
    // I/O, no shuffle — its wall time moves only when something else
    // is competing for the machine.
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      // hash() keeps per-row work non-trivial while the running sum
      // stays far below int64 range (5e7 * 2^31 ~ 1e17), so the op is
      // ANSI-overflow-safe at any rep count
      spark.range(50000000L)
        .selectExpr("sum(cast(hash(id) as bigint))").collect()
      (System.nanoTime() - t0) / 1e9
    }

    // Fixed IO calibration op: constant-size parquet round-trip under
    // the bench's own session scratch (hash columns defeat column
    // encodings, so the bytes are real) plus one fsync'd raw slab —
    // the force(true) guarantees at least part of each sample touches
    // the DEVICE, so a window where the page cache is under external
    // dirty-page pressure cannot read as memory-speed. This is the
    // write-commit-read path every store-ingest gate pays; its wall
    // time moves when the disk is contended even while the CPU
    // sentinel stays flat (the BENCH_r13 mode).
    val ioDir = ops.SessionScratch.base("bench_io",
      spark.sparkContext.applicationId)
    def ioSentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(4000000L)
        .selectExpr("hash(id) as a", "hash(id + 1) as b",
          "hash(id + 2) as c", "hash(id + 3) as d")
        .write.mode("overwrite").parquet(s"$ioDir/probe")
      val raw = java.nio.file.Paths.get(ioDir, "probe.raw")
      val ch = java.nio.channels.FileChannel.open(raw,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      try {
        val slab = new Array[Byte](1 << 20)
        java.util.Arrays.fill(slab, 0x5a.toByte)
        val buf = java.nio.ByteBuffer.wrap(slab)
        var i = 0
        while (i < 64) {
          buf.rewind()
          while (buf.hasRemaining) ch.write(buf)
          i += 1
        }
        ch.force(true)
      } finally ch.close()
      spark.read.parquet(s"$ioDir/probe")
        .selectExpr("sum(cast(a as bigint) + cast(b as bigint))")
        .collect()
      // delete the probe INSIDE the timed window: unlinking discards
      // the parquet write's still-dirty pages, so the sentinel's own
      // writeback can never bleed into the pass it precedes (a bias
      // present in EVERY pass, which min-over-passes cannot remove)
      val probeDir = new java.io.File(ioDir, "probe")
      Option(probeDir.listFiles()).foreach(_.foreach(_.delete()))
      probeDir.delete()
      java.nio.file.Files.deleteIfExists(raw)
      (System.nanoTime() - t0) / 1e9
    }

    // Warmup: exercise scheduler + codegen + parquet reader once.
    // The sentinel itself must be warmed to steady state (JIT +
    // codegen cache) before its first MEASURED sample, or pass-1
    // reads high on every run and the spread flags contention on an
    // idle box: repeat until two consecutive runs agree within 30%
    // (bounded at 6 tries).
    var prev = sentinel()
    var cur = sentinel()
    var tries = 2
    while (tries < 6 && cur < prev * 0.7) { prev = cur; cur = sentinel(); tries += 1 }
    // the IO sentinel needs the same steady-state discipline (first
    // run pays scratch-dir creation + parquet writer codegen)
    var ioPrev = ioSentinel()
    var ioCur = ioSentinel()
    tries = 2
    while (tries < 6 && ioCur < ioPrev * 0.7) {
      ioPrev = ioCur; ioCur = ioSentinel(); tries += 1
    }
    ops.Tables.names.foreach { n =>
      try ops.Tables(spark, sfDir).table(n).limit(1).count()
      catch { case _: Throwable => () }
    }

    // default: full registry (the driver's per-round measurement);
    // headline mode times only the flagged subset for quick iteration
    val timed =
      (if (sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("headline"))
        SparkEntry.benchQueries
      else SparkEntry.registry).sortBy(_.name)
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption)
      .filter(_ >= 1).getOrElse(2)

    val names = timed.map(_.name)
    // SPARK_GRAFT_BENCH_SINK=noop executes the FULL plan through the
    // noop DSv2 sink instead of count() — count() lets Catalyst prune
    // operators that feed only unused output columns, so
    // projection-shaped queries bench the pruned plan (the BASELINE.md
    // round-10 caveat). Default stays count() for cross-round
    // per-query diffability; the noop mode is the pre-registered
    // switch (expect a one-time uniform upward step in
    // projection-shaped entries when flipping it).
    val noopSink = sys.env.get("SPARK_GRAFT_BENCH_SINK").contains("noop")
    def execute(df: org.apache.spark.sql.DataFrame): Unit =
      if (noopSink) df.write.mode("overwrite").format("noop").save()
      else { df.count(); () }
    val times = Array.fill(timed.size, reps)(Double.NaN)
    val ok = Array.fill(timed.size)(true)
    val sentinels = new Array[Double](reps + 1)
    val ioSentinels = new Array[Double](reps + 1)
    for (pass <- 0 until reps) {
      sentinels(pass) = sentinel()
      ioSentinels(pass) = ioSentinel()
      timed.zipWithIndex.foreach { case (q, i) =>
        val t0 = System.nanoTime()
        // withEvictionDiagnostics: a query that retains a transient
        // checkpoint across evictions fails here with a descriptive
        // contract-violation error instead of a bare block-not-found
        try ops.SessionScratch.withEvictionDiagnostics(
          execute(q.run(spark, sfDir)))
        catch { case e: Throwable =>
          ok(i) = false
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        times(i)(pass) = (System.nanoTime() - t0) / 1e9
        // outside the timed window: release this query's transient
        // checkpoints so a 169-query marathon doesn't accumulate
        // block-manager pressure that inflates later queries (the r7
        // fixpoint family read 2-3× its steady state from exactly this)
        ops.SessionScratch.evictTransients()
      }
    }
    sentinels(reps) = sentinel()
    ioSentinels(reps) = ioSentinel()

    // failed queries are excluded from the per-query map AND both
    // totals: a fast failure must never improve the headline number or
    // read as a per-query speedup when diffing rounds — the `failed`
    // list is the only place a broken query appears
    val good = names.indices.filter(ok)
    val qs = good.map(i => s""""${names(i)}":${times(i).min}""")
      .mkString("{", ",", "}")
    // per-rep samples (pass order): min-of-N hides one-sided pressure —
    // r7's fixpoint family could only be diagnosed by an out-of-band
    // re-run because BOTH passes ran inside the same marathon. With the
    // raw samples in the artifact, drift vs steady state is readable
    // without re-running anything.
    val samples = good.map(i =>
        s""""${names(i)}":${times(i).mkString("[", ",", "]")}""")
      .mkString("{", ",", "}")
    val total = good.map(i => times(i).min).sum
    val rawTotal = good.map(i => times(i)(0)).sum
    val passTotals = (0 until reps)
      .map(p => good.map(i => times(i)(p)).sum).mkString("[", ",", "]")
    val failed = names.indices.filterNot(ok)
      .map(i => s""""${names(i)}"""").mkString("[", ",", "]")
    val sentinelJson = sentinels.mkString("[", ",", "]")
    val ioSentinelJson = ioSentinels.mkString("[", ",", "]")
    // like-for-like JVM states only: drop the pristine pre-pass-1
    // sample (see scaladoc). With reps=1 only one post sample exists,
    // so no contention verdict is POSSIBLE — emit null rather than a
    // vacuous 1.0/false that reads as an affirmatively clean round.
    def spreadOf(xs: Array[Double]): Option[Double] = {
      val post = xs.drop(1)
      if (post.length < 2) None
      else Some(post.max / math.max(post.min, 1e-9))
    }
    val cpuSp = spreadOf(sentinels)
    val ioSp = spreadOf(ioSentinels)
    val spread = cpuSp.map(_.toString).getOrElse("null")
    val ioSpread = ioSp.map(_.toString).getOrElse("null")
    // a window is suspect when EITHER resource was contended — the
    // BENCH_r13 lesson: CPU-clean does not certify IO-clean
    val suspect =
      if (cpuSp.isEmpty && ioSp.isEmpty) "null"
      else (cpuSp.exists(_ > 2.0) || ioSp.exists(_ > 2.0)).toString
    val sinkMode = if (noopSink) "noop" else "count"
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
        s""""sink":"$sinkMode",""" +
        s""""rep_mode":"round_robin","raw_first_run_total":$rawTotal,""" +
        s""""pass_totals":$passTotals,"sentinel_sec":$sentinelJson,""" +
        s""""sentinel_spread":$spread,""" +
        s""""io_sentinel_sec":$ioSentinelJson,"io_spread":$ioSpread,""" +
        s""""contention_suspect":$suspect,""" +
        s""""failed":$failed,"queries":$qs,"samples":$samples,""" +
        s""""sf":"$sfDir"}"""
    println(json)
    // A println is a fragile artifact channel: BENCH_r06.json preserved
    // only the log TAIL, losing every q1xx per-query timing. Persist the
    // same line to a file so the full map survives any log truncation.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      val w = new java.io.PrintWriter(out, "UTF-8")
      try w.println(json) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    // The driver captures only the last ~2000 chars of stdout and the
    // full line above (~16 KB at 190 queries) overflows that window —
    // its HEAD is truncated away and BENCH_r{07..10}.json all recorded
    // parsed:null. Emit a compact summary as the LAST stdout line so a
    // tail-window scan finds one complete parseable JSON object: the
    // headline totals + sentinel verdict inline, the top-cost queries
    // (the ones a per-round grade reads first), and a pointer to the
    // persisted full map.
    val topK = good.sortBy(i => -times(i).min).take(10)
      .map(i => s""""${names(i)}":${math.round(times(i).min * 1000) / 1000.0}""")
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
        s""""rep_mode":"round_robin","raw_first_run_total":$rawTotal,""" +
        s""""sentinel_spread":$spread,"io_spread":$ioSpread,""" +
        s""""contention_suspect":$suspect,""" +
        s""""failed":$failed,"n_queries":${good.size},""" +
        s""""queries_truncated":true,"top_queries":$topK,""" +
        s""""queries_file":"$out","sf":"$sfDir"}""")
    spark.stop()
  }
}
