package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measured scaling evidence for the text/dedup family.
  *
  * Generates a synthetic corpus of UNIQUE documents (deterministic
  * token stream keyed on (doc_id, position) — no planted duplicates, so
  * pair spaces stay linear and the measurement isolates the engine's
  * scaling, not the data's duplication rate) at two sizes (n and n/8),
  * runs the heavy text operators on both, and prints the wall-time
  * ratio. A shuffle-bounded operator should scale ~linearly in corpus
  * size (ratio ≈ size ratio, modulo fixed overhead); a quadratic stage
  * would show immediately.
  *
  * Usage: runMain graft.ScaleSmoke [nDocs] [tokensPerDoc]
  * Output: one JSON line per operator with both times and the ratio.
  */
object ScaleSmoke {

  private def synth(spark: SparkSession, n: Long, toks: Int): DataFrame =
    spark.range(n).select(
      col("id").as("doc_id"),
      // tokens are LETTER-only ("w" + digits spelled a-j): the text
      // operators segment words as \p{L} runs, so digit-bearing
      // tokens would all collapse to the single word "w" and starve
      // the tokenizer-training ops (BPE measured exactly that)
      concat_ws(" ", transform(sequence(lit(1), lit(toks)),
        i => concat(lit("w"), translate(
          pmod(hash(col("id") * 131 + i), lit(30000)).cast("string"),
          "0123456789", "abcdefghij")))).as("text"),
      lit("en").as("lang"),
      concat(lit("src"), pmod(col("id"), lit(20))).as("source"),
      lit(toks.toLong * 6).as("n_chars"))

  /** Synthetic events with the fixture's physical layout (ts stored as
    * int64 NANOS, matching what Tables#events expects to convert):
    * n events over ~90 days, a fixed population of 4000 users (so
    * growing n deepens per-user histories rather than widening the
    * key space — the harder case for the windowed operators), 5 types.
    */
  private def synthEvents(spark: SparkSession, n: Long): DataFrame = {
    val baseNs = 1735689600000000000L // 2025-01-01 UTC in nanos
    spark.range(n).select(
      col("id").as("event_id"),
      (lit(baseNs) + (pmod(hash(col("id") * 7), lit(7776000)).cast("long")
        * lit(1000000000L))).as("ts"),
      pmod(hash(col("id") * 13), lit(4000)).cast("long").as("user_id"),
      element_at(
        array(lit("view"), lit("click"), lit("signup"), lit("purchase"),
          lit("refund")),
        (pmod(hash(col("id") * 17), lit(5)) + 1).cast("int"))
        .as("event_type"),
      (pmod(hash(col("id") * 19), lit(10000)).cast("double") / 100.0)
        .as("value"),
      lit("{}").as("props"))
  }

  private def timed(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val rows = f
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val toks = args.lift(1).map(_.toInt).getOrElse(120)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ops: Seq[(String, String => DataFrame)] = Seq(
      "q40_dedup_exact" -> (d => llmops.Dedup.q40.run(spark, d)),
      "q41_dedup_minhash_lsh" -> (d => llmops.Dedup.q41.run(spark, d)),
      "q43_dedup_ngram_jaccard" -> (d => llmops.Dedup.q43.run(spark, d)),
      "q47_dup_span_detection" -> (d => llmops.Dedup.q47.run(spark, d)),
      "q48_cross_split_leakage" -> (d => llmops.Dedup.q48.run(spark, d)),
      "q76_bigram_lm_quality" -> (d => llmops.TextAnalysis.q76.run(spark, d)),
      "q157_dsir_importance_resampling" ->
        (d => llmops.Curation.q157.run(spark, d)),
      "q158_ccnet_perplexity_buckets" ->
        (d => llmops.Curation.q158.run(spark, d)),
      "q160_source_ngram_diversity" ->
        (d => llmops.TextAnalysis.q160.run(spark, d)),
      // round-7 additions: the 3-length span explode must track the
      // corpus like q47 does (3× the spans, same physics); the
      // classifier is one scan + a broadcast join, so it must run FLAT
      // relative to corpus growth modulo the explode
      "q165_multilen_span_dedup" -> (d => llmops.Dedup.q165.run(spark, d)),
      "q168_quality_classifier" -> (d => llmops.Curation.q168.run(spark, d)),
      "q170_distribution_drift" -> (d => llmops.Curation.q170.run(spark, d)),
      // round-8: held-out BPE — training runs on the Zipf-bounded
      // word table (synth vocab is fixed at 30k words, so train cost
      // should be ~flat in corpus size), the eval side is one
      // held-out word agg + a chained-replace projection
      "q173_bpe_heldout_fertility" -> (d => llmops.Bpe.q173.run(spark, d)),
      // round-8: unigram-LM EM — ONE corpus pass (word freq), then
      // seeding/DP/recounts on the fixed-vocab word table → ~flat
      "q174_unigram_lm_vocab" -> (d => llmops.UnigramLm.q174.run(spark, d)))

    val eventOps: Seq[(String, String => DataFrame)] = Seq(
      "q111_rolling_active_users" -> (d => graft.ops.EventOps.q111.run(spark, d)),
      "q122_event_transitions" -> (d => graft.ops.EventOps.q122.run(spark, d)))

    // relational/composite family: measured against the driver fixtures
    // at sf0.01 vs sf0.1 (10x lineitem) — no synthesis, the real tables
    val tpchOps: Seq[(String, String => DataFrame)] = Seq(
      "q130_tpch_q3_shipping_priority" ->
        (d => graft.ops.TpchSuite.q130.run(spark, d)),
      "q133_tpch_q18_large_orders" ->
        (d => graft.ops.TpchSuite.q133.run(spark, d)),
      "q138_tpch_q17_small_qty" ->
        (d => graft.ops.TpchSuite2.q138.run(spark, d)),
      "q144_tpch_q16_supplier_diversity" ->
        (d => graft.ops.TpchSuite2.q144.run(spark, d)),
      "q145_tpch_q21_waiting_supplier" ->
        (d => graft.ops.TpchSuite2.q145.run(spark, d)),
      // the two fixpoint-loop operators — rounds, not rows, dominate;
      // measured so "inherent iteration cost" stays evidence-backed
      "q102_recursive_hierarchy" ->
        (d => graft.ops.Advanced.q102.run(spark, d)),
      "q112_dedup_components" ->
        (d => graft.llmops.Components.q112.run(spark, d)),
      // the span/leakage family on the REAL fixtures (500 vs 5000
      // docs): complements the synthetic points above, which isolate
      // engine scaling on unique text — these carry the fixtures'
      // planted duplicates, so span-count fanout is also exercised
      "q47_dup_span_detection_fixture" ->
        (d => llmops.Dedup.q47.run(spark, d)),
      "q48_cross_split_leakage_fixture" ->
        (d => llmops.Dedup.q48.run(spark, d)),
      // the ANN family on the real embeddings fixtures (10x rows):
      // brute-force is the O(n·k) floor, LSH and trained-IVF are the
      // scale paths whose candidate sets must grow sub-linearly
      "q50_ann_brute_topk_fixture" ->
        (d => llmops.Similarity.q50.run(spark, d)),
      "q52_ann_lsh_fixture" ->
        (d => llmops.Similarity.q52.run(spark, d)),
      "q54_ann_ivf_trained_fixture" ->
        (d => llmops.Similarity.q54.run(spark, d)),
      "q44_embed_near_dup_fixture" ->
        (d => llmops.Dedup.q44.run(spark, d)),
      // round-6 curation/graph family on the real fixtures: DSIR's
      // cost must track the two corpus passes (LM fit + score), CCNet
      // bucketing must track q76's LM cost (the histogram stage is
      // size-independent), PageRank's rounds are fixed so its cost
      // tracks the edge-list size
      "q157_dsir_fixture" ->
        (d => llmops.Curation.q157.run(spark, d)),
      "q158_ccnet_buckets_fixture" ->
        (d => llmops.Curation.q158.run(spark, d)),
      "q159_pagerank_fixture" ->
        (d => graft.ops.GraphRank.q159.run(spark, d)),
      "q160_source_diversity_fixture" ->
        (d => llmops.TextAnalysis.q160.run(spark, d)),
      "q161_pagerank_weighted_fixture" ->
        (d => graft.ops.GraphRank.q161.run(spark, d)),
      // round-7: binary Hamming ANN — code build is one scan
      // projection, the probe is |q|·|corpus| integer ops, so cost
      // tracks the code scan, never the raw-vector width
      "q169_knn_hamming_fixture" ->
        (d => llmops.Similarity.q169.run(spark, d)),
      "q165_multilen_span_fixture" ->
        (d => llmops.Dedup.q165.run(spark, d)),
      "q171_embedding_drift_fixture" ->
        (d => llmops.Curation.q171.run(spark, d)))

    val sizes = Seq(n / 8, n)
    val dirs = sizes.map { sz =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_scale_$sz").toString
      synth(spark, sz, toks).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      synthEvents(spark, sz * 5).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      sz -> dir
    }
    // warmup: touch both corpora once so IO caches are comparable
    dirs.foreach { case (_, d) =>
      spark.read.parquet(s"$d/documents.parquet").count()
      spark.read.parquet(s"$d/events.parquet").count() }

    def report(groups: Seq[(String, String => DataFrame)],
        pts: Seq[(Long, String)]): Unit =
      groups.foreach { case (name, run) =>
        val res = pts.map { case (sz, d) =>
          val (sec, rows) = timed(run(d).count())
          // outside the timed window, between measurements: without
          // this, per-call transient checkpoints (fixpoint iterates,
          // degree tables, DP segmentations) accumulate across the
          // whole op matrix and bias later points — the exact
          // marathon pressure the Bench eviction fixed
          graft.ops.SessionScratch.evictTransients()
          (sz, sec, rows)
        }
        val (s1, t1, r1) = res.head
        val (s2, t2, r2) = res.last
        val ratio = t2 / t1
        println(f"""{"op":"$name","n_small":$s1,"sec_small":$t1%.2f,""" +
          f""""rows_small":$r1,"n_big":$s2,"sec_big":$t2%.2f,""" +
          f""""rows_big":$r2,"time_ratio":$ratio%.2f,""" +
          f""""size_ratio":${s2.toDouble / s1}%.1f}""")
      }

    report(ops ++ eventOps, dirs)

    // fixture points: ~60k vs ~600k lineitem rows; warm both first
    val sfPts = Seq(60000L -> "/root/testdata/sf0.01",
      600000L -> "/root/testdata/sf0.1")
    sfPts.foreach { case (_, d) =>
      spark.read.parquet(s"$d/lineitem.parquet").count()
      spark.read.parquet(s"$d/documents.parquet").count()
      spark.read.parquet(s"$d/embeddings.parquet").count() }
    report(tpchOps, sfPts)
    spark.stop()
  }
}
