package graft

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

/** Runtime proofs for the two adaptive/cost-based scale levers the
  * static plan audits (PLANS.md) cannot show: AQE skew-join splitting
  * and CBO statistics-driven join reordering. Both are the "100 TB
  * lever proven, not narrated" discipline — the assertions read the
  * EXECUTED adaptive plan / the optimized logical plan, not a doc
  * claim.
  */
class ScaleLeversSpec extends SparkTestBase {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) =>
      // getOption can itself return a null VALUE for confs whose
      // default is null (e.g. adaptive.autoBroadcastJoinThreshold) —
      // flatten that to "unset" or the restore would set(k, null)
      k -> util.Try(spark.conf.get(k)).toOption.flatMap(Option(_)) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed shuffle join partition at runtime") {
    import spark.implicits._
    // 200k-row left side where 90% of rows share key 0 (pathological
    // producer skew); right side large enough that broadcast is off the
    // table anyway, and explicitly disabled so the join must shuffle
    val left = spark.range(200000L).select(
      when(col("id") % 10 =!= 0, 0L).otherwise(col("id") % 97).as("k"),
      concat(lit("payload_payload_payload_payload_"), col("id"))
        .as("pad"))
    val right = spark.range(97L).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("name"))
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB") {
      val joined = left.join(right, Seq("k"))
      // collect() (not count()) so the adaptive plan inspected below is
      // the one that actually executed — count() plans a separate query
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE to mark the skewed join, got:\n$finalPlan")
    }
  }

  test("same-text flood (hot LSH band): the exact stage removes copies " +
    "LINEARLY before the quadratic pair stage; the residual bucket " +
    "stays variant-bounded") {
    import spark.implicits._
    // 800 exact copies of one boilerplate page (the crawler re-crawl /
    // license-page flood — the worst hot-bucket input for LSH: every
    // copy shares all 8 band signatures), 20 near-dup VARIANTS of it,
    // and 100 unique docs
    val boiler = "this is the same boilerplate license page text " +
      "that appears on every mirror of the site word for word " +
      "with enough distinct words to shingle into stable minhash bands"
    val flood = spark.range(800L)
      .select(col("id").as("doc_id"), lit(boiler).as("text"))
    val variants = spark.range(800L, 820L)
      .select(col("id").as("doc_id"),
        concat(lit(boiler + " variant tail number "), col("id"))
          .as("text"))
    // genuinely distinct texts: 24 per-doc pseudo-random words each —
    // shared boilerplate words would themselves collide in the bands
    val uniques = spark.range(900L, 1000L)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(24)),
          i => concat(lit("w"),
            pmod(col("id") * 31L + i.cast("long") * 7919L, lit(99991L)))))
          .as("text"))
    val docs = flood.unionByName(variants).unionByName(uniques)

    // stage 1 — EXACT dedup (q40's groupBy-text semantics): linear,
    // join-free; the 800-copy flood collapses to ONE representative
    val exactKept = docs
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .join(docs, Seq("doc_id", "text"), "left_semi")
    val keptCount = exactKept.count()
    assert(keptCount == 1 + 20 + 100,
      s"exact stage should keep one per distinct text, got $keptCount")

    // stage 2 — the LSH band stage runs on the exact-deduped corpus:
    // its quadratic term is max bucket occupancy, which is now bounded
    // by the VARIANT count, never the flood size
    val rawMax = graft.llmops.Dedup.bandSignaturesOf(docs)
      .groupBy(col("band"), col("sig")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    val dedupedMax = graft.llmops.Dedup.bandSignaturesOf(exactKept)
      .groupBy(col("band"), col("sig")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(rawMax >= 800,
      s"flood should form a hot bucket without the exact stage ($rawMax)")
    assert(dedupedMax <= 21,
      s"post-exact max bucket must be variant-bounded, got $dedupedMax")
    // pair-space arithmetic the ordering buys: 800² ≈ 640k pairs per
    // band avoided, ≤ 21² ≈ 441 remaining — the flood never reaches
    // the quadratic stage
    info(s"hot bucket: raw max occupancy $rawMax -> " +
      s"post-exact $dedupedMax")
  }

  test("CBO reorders a star join so the selective dim joins first") {
    // fact(100k) ⋈ wide(10k) ⋈ tiny(10): written worst-order-first —
    // fact⋈wide would carry every fact row through the first join.
    // With row-count statistics and joinReorder on, Catalyst should
    // put the 10-row tiny dim against the fact first.
    val app = spark.sparkContext.applicationId
    val wh = graft.ops.SessionScratch.base("cbo_spec", app)
    def mk(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      df.write.mode("overwrite").option("path", s"$wh/$name")
        .saveAsTable(name)
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS")
    }
    mk("cbo_fact", spark.range(100000L).select(
      (col("id") % 10000).as("wk"), (col("id") % 1000).as("tk"),
      col("id").as("v")))
    mk("cbo_wide", spark.range(10000L).select(col("id").as("wk"),
      concat(lit("w"), col("id")).as("wname")))
    // tiny carries tk values 0..9 only — selective on the fact too
    mk("cbo_tiny", spark.range(10L).select(col("id").as("tk"),
      concat(lit("t"), col("id")).as("tname")))

    def firstJoinTables(cbo: Boolean): Seq[String] = {
      val q =
        """SELECT f.v, w.wname, t.tname
          |FROM cbo_fact f
          |JOIN cbo_wide w ON f.wk = w.wk
          |JOIN cbo_tiny t ON f.tk = t.tk""".stripMargin
      withConf(
        "spark.sql.cbo.enabled" -> cbo.toString,
        "spark.sql.cbo.joinReorder.enabled" -> cbo.toString) {
        val plan = spark.sql(q).queryExecution.optimizedPlan
        // deepest Join node = the join executed first
        val deepest = plan.collect { case j: Join => j }.last
        deepest.collectLeaves().map(_.toString)
      }
    }
    // without CBO: syntactic order — the first join is fact ⋈ wide
    val base = firstJoinTables(cbo = false)
    assert(base.exists(_.contains("cbo_wide")) &&
      !base.exists(_.contains("cbo_tiny")),
      s"baseline order should be syntactic, got: $base")
    // with CBO + stats: the 10-row dim moves into the first join
    val reordered = firstJoinTables(cbo = true)
    assert(reordered.exists(_.contains("cbo_tiny")),
      s"CBO should join the selective tiny dim first, got: $reordered")
  }

  test("partitioned checkpoint survives as hashpartitioning for consumers") {
    import spark.implicits._
    // the Pregel/epoch lever behind q159's large regime and q176's
    // feature table: a checkpoint taken through
    // partitionedTransientCheckpoint must carry hashpartitioning(k), so
    // a downstream groupBy(k) needs NO exchange — a plain checkpoint of
    // the same repartition (under AQE) loses the partitioning and
    // re-shuffles every consumer
    val df = spark.range(10000L)
      .select((col("id") % 100).as("k"), col("id").as("v"))
    val part = graft.ops.SessionScratch
      .partitionedTransientCheckpoint(df, Seq(col("k")))
    val agg = part.groupBy(col("k")).agg(sum(col("v")).as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(k"),
      s"groupBy over the partitioned checkpoint re-exchanged:\n$plan")
    // and the values are intact
    assert(agg.agg(sum(col("s"))).head().getLong(0) ==
      (0L until 10000L).sum)
    graft.ops.SessionScratch.evictTransients()
  }
}
