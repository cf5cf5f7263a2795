package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measured evidence that persisted-index MAINTENANCE cost
  * scales with the DELTA, not the corpus (IndexMaintenanceSpec proves
  * correctness; this measures the operational claim that makes the
  * artifacts worth persisting at all).
  *
  * The experiment holds the DELTA fixed and grows the CORPUS: for each
  * corpus scale (1x, 8x — key-shifted copies of the sf fixture, text /
  * vectors unchanged, the ScaleTpch amplification shape), build the
  * index on the base corpus, time appending the SAME fixed delta, and
  * time a full rebuild of base+delta. The claim is the SHAPE of the
  * two curves: append stays flat as the corpus grows 8x (its input is
  * the delta plus an index-side bucket join), while rebuild grows with
  * the corpus. Comparing append vs rebuild at ONE fixture-sized point
  * is meaningless — fixed job overhead dominates both and the fixture
  * fits in one task wave; the cross-scale shape is what survives to
  * 100 TB, where "rebuild" is a full-corpus job.
  *
  * An untimed full cycle (build + append + rebuild at 1x) runs first
  * so JIT/codegen warm-up is not attributed to the first timed point.
  *
  * Usage: runMain graft.ScaleIndex [sfDir]
  * Output: one JSON line per (index, corpus_scale).
  */
object ScaleIndex {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def fresh(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_scaleidx_$tag").toString

  /** `factor` key-shifted copies of `df` (ids disjoint per copy, all
    * other columns byte-identical) written to parquet — the amplified
    * corpus is read off disk like any real corpus, so build/rebuild
    * timings include the scan they would pay in production.
    */
  private def amplify(df: DataFrame, idCol: String, factor: Int,
      dest: String): DataFrame = {
    val spark = df.sparkSession
    val shift = df.agg(max(col(idCol))).head().getLong(0) + 1
    val copies = spark.range(factor).select(col("id").as("_k"))
    df.crossJoin(broadcast(copies))
      .select(df.columns.map {
        case `idCol` => (col(idCol) + col("_k") * shift).as(idCol)
        case c       => col(c)
      }.toSeq: _*)
      .write.mode("overwrite").parquet(dest)
    spark.read.parquet(dest)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // fixed delta: every 10th id; base: the rest, amplified per scale
    val dDelta = docs.filter(col("doc_id") % 10 === 0)
    val vDelta = embs.filter(col("vec_id") % 10 === 0)
    val nDocDelta = dDelta.count(); val nVecDelta = vDelta.count()

    // untimed warm-up cycle at 1x: JIT/codegen for every code path
    locally {
      val w = fresh("warm")
      llmops.DedupIndex.build(docs.filter(col("doc_id") % 10 =!= 0),
        s"$w/dedup")
      llmops.DedupIndex.append(dDelta, s"$w/dedup").count()
      llmops.IvfIndex.build(embs.filter(col("vec_id") % 10 =!= 0),
        s"$w/ivf", k = 16)
      llmops.IvfIndex.append(vDelta, s"$w/ivf")
      llmops.TextIndex.build(docs.filter(col("doc_id") % 10 =!= 0),
        s"$w/text")
      llmops.TextIndex.append(dDelta, s"$w/text")
      llmops.TextIndex.search(spark, s"$w/text",
        Seq("spark", "join", "window")).count()
      llmops.NgramIndex.build(docs.filter(col("doc_id") % 10 =!= 0),
        s"$w/ngram")
      llmops.NgramIndex.append(dDelta, s"$w/ngram")
      llmops.NgramIndex.score(dDelta, s"$w/ngram").count()
      llmops.IvfPqIndex.build(embs.filter(col("vec_id") % 10 =!= 0),
        s"$w/ivfpq", k = 16)
      llmops.IvfPqIndex.append(vDelta, s"$w/ivfpq")
      llmops.IvfPqIndex.search(vDelta.limit(10)
        .select(col("vec_id").as("qid"), col("embedding").as("eq")),
        s"$w/ivfpq").count()
      llmops.IvfIndex.semanticProbe(vDelta, s"$w/ivf").count()
      llmops.GraphIndex.build(embs.filter(col("vec_id") % 10 =!= 0),
        s"$w/graph", k = 16)
      llmops.GraphIndex.append(vDelta, s"$w/graph")
      llmops.GraphIndex.search(vDelta.limit(10)
        .select(col("vec_id").as("qid"), col("embedding").as("eq")),
        s"$w/graph").count()
      ops.SessionScratch.evictTransients()
    }

    Seq(1, 8).foreach { f =>
      val root = fresh(s"x$f")
      val dBase = amplify(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", f, s"$root/docs_base")
      val nBase = dBase.count()
      val dPath = s"$root/dedup"
      val build = timed(llmops.DedupIndex.build(dBase, dPath))
      val append = timed {
        llmops.DedupIndex.append(dDelta, dPath).count()
        ops.SessionScratch.evictTransients()
      }
      val rebuild = timed(llmops.DedupIndex.build(
        dBase.unionByName(dDelta), s"$root/dedup_rb"))
      // compaction: the build+append-fragmented store rewrites into
      // ~64 MB files under the recorded config (atomic generation
      // swap); probe timed before/after — the claim is that probe cost
      // never degrades and the file count collapses
      val probePre = timed {
        llmops.DedupIndex.probe(dDelta, dPath).count()
        ops.SessionScratch.evictTransients()
      }
      var cFiles = (0, 0)
      val compactSec = timed {
        cFiles = llmops.DedupIndex.compact(spark, dPath)
      }
      val probePost = timed {
        llmops.DedupIndex.probe(dDelta, dPath).count()
        ops.SessionScratch.evictTransients()
      }
      println(f"""{"index":"dedup_signatures","corpus_scale":$f,""" +
        f""""n_base":$nBase,"n_delta":$nDocDelta,""" +
        f""""build_sec":$build%.2f,"append_delta_sec":$append%.2f,""" +
        f""""rebuild_full_sec":$rebuild%.2f,""" +
        f""""append_vs_rebuild":${append / rebuild}%.2f,""" +
        f""""compact_sec":$compactSec%.2f,""" +
        f""""files_before":${cFiles._1},"files_after":${cFiles._2},""" +
        f""""probe_pre_sec":$probePre%.2f,"probe_post_sec":$probePost%.2f}""")

      val tPath = s"$root/text"
      val tBuild = timed(llmops.TextIndex.build(dBase, tPath))
      val tAppend = timed(llmops.TextIndex.append(dDelta, tPath))
      val tRebuild = timed(llmops.TextIndex.build(
        dBase.unionByName(dDelta), s"$root/text_rb"))
      val tq = Seq("spark", "join", "window")
      val tPre = timed(llmops.TextIndex.search(spark, tPath, tq).count())
      var tFiles = (0, 0)
      val tCompact = timed {
        tFiles = llmops.TextIndex.compact(spark, tPath)
      }
      val tPost = timed(llmops.TextIndex.search(spark, tPath, tq).count())
      println(f"""{"index":"text_bm25","corpus_scale":$f,""" +
        f""""n_base":$nBase,"n_delta":$nDocDelta,""" +
        f""""build_sec":$tBuild%.2f,"append_delta_sec":$tAppend%.2f,""" +
        f""""rebuild_full_sec":$tRebuild%.2f,""" +
        f""""append_vs_rebuild":${tAppend / tRebuild}%.2f,""" +
        f""""compact_sec":$tCompact%.2f,""" +
        f""""files_before":${tFiles._1},"files_after":${tFiles._2},""" +
        f""""search_pre_sec":$tPre%.2f,"search_post_sec":$tPost%.2f}""")

      val nPath = s"$root/ngram"
      val nBuild = timed(llmops.NgramIndex.build(dBase, nPath))
      val nAppend = timed(llmops.NgramIndex.append(dDelta, nPath))
      val nRebuild = timed(llmops.NgramIndex.build(
        dBase.unionByName(dDelta), s"$root/ngram_rb"))
      val nScorePre = timed(llmops.NgramIndex.score(dDelta, nPath).count())
      var nFiles = (0, 0)
      val nCompact = timed {
        nFiles = llmops.NgramIndex.compact(spark, nPath)
      }
      val nScorePost = timed(llmops.NgramIndex.score(dDelta, nPath).count())
      println(f"""{"index":"ngram_lm","corpus_scale":$f,""" +
        f""""n_base":$nBase,"n_delta":$nDocDelta,""" +
        f""""build_sec":$nBuild%.2f,"append_delta_sec":$nAppend%.2f,""" +
        f""""rebuild_full_sec":$nRebuild%.2f,""" +
        f""""append_vs_rebuild":${nAppend / nRebuild}%.2f,""" +
        f""""compact_sec":$nCompact%.2f,""" +
        f""""files_before":${nFiles._1},"files_after":${nFiles._2},""" +
        f""""score_pre_sec":$nScorePre%.2f,"score_post_sec":$nScorePost%.2f}""")

      val vBase = amplify(embs.filter(col("vec_id") % 10 =!= 0),
        "vec_id", f, s"$root/embs_base")
      val nVBase = vBase.count()
      val vPath = s"$root/ivf"
      val vBuild = timed(llmops.IvfIndex.build(vBase, vPath, k = 16))
      // semantic-dedup probe BEFORE the delta is appended — the
      // dedupIngest flow's real state (probing an already-appended
      // delta self-matches every vector and measures nothing)
      val semProbe = timed {
        llmops.IvfIndex.semanticProbe(vDelta, vPath).count()
        ops.SessionScratch.evictTransients()
      }
      val vAppend = timed(llmops.IvfIndex.append(vDelta, vPath))
      val vRebuild = timed(llmops.IvfIndex.build(
        vBase.unionByName(vDelta), s"$root/ivf_rb", k = 16))
      val vq = vDelta.limit(10)
        .select(col("vec_id").as("qid"), col("embedding").as("eq"))
      val vProbePre = timed(llmops.IvfIndex.search(vq, vPath).count())
      var vFiles = (0, 0)
      val vCompactSec = timed {
        vFiles = llmops.IvfIndex.compact(spark, vPath)
      }
      val vProbePost = timed(llmops.IvfIndex.search(vq, vPath).count())
      println(f"""{"index":"ivf_ann","corpus_scale":$f,""" +
        f""""n_base":$nVBase,"n_delta":$nVecDelta,""" +
        f""""build_sec":$vBuild%.2f,"append_delta_sec":$vAppend%.2f,""" +
        f""""rebuild_full_sec":$vRebuild%.2f,""" +
        f""""append_vs_rebuild":${vAppend / vRebuild}%.2f,""" +
        f""""compact_sec":$vCompactSec%.2f,""" +
        f""""files_before":${vFiles._1},"files_after":${vFiles._2},""" +
        f""""search_pre_sec":$vProbePre%.2f,""" +
        f""""search_post_sec":$vProbePost%.2f,""" +
        f""""semprobe_delta_sec":$semProbe%.2f}""")

      // IVF-PQ: the codes-only store — append must additionally pay the
      // delta's PQ encode (argmin vs the recorded codebook), and search
      // reads codes instead of raw vectors, so its pre/post numbers are
      // the family's cheapest IO
      val pPath = s"$root/ivfpq"
      val pBuild = timed(llmops.IvfPqIndex.build(vBase, pPath, k = 16))
      val pAppend = timed(llmops.IvfPqIndex.append(vDelta, pPath))
      val pRebuild = timed(llmops.IvfPqIndex.build(
        vBase.unionByName(vDelta), s"$root/ivfpq_rb", k = 16))
      val pSearchPre = timed(llmops.IvfPqIndex.search(vq, pPath).count())
      var pFiles = (0, 0)
      val pCompactSec = timed {
        pFiles = llmops.IvfPqIndex.compact(spark, pPath)
      }
      val pSearchPost = timed(llmops.IvfPqIndex.search(vq, pPath).count())
      println(f"""{"index":"ivfpq_codes","corpus_scale":$f,""" +
        f""""n_base":$nVBase,"n_delta":$nVecDelta,""" +
        f""""build_sec":$pBuild%.2f,"append_delta_sec":$pAppend%.2f,""" +
        f""""rebuild_full_sec":$pRebuild%.2f,""" +
        f""""append_vs_rebuild":${pAppend / pRebuild}%.2f,""" +
        f""""compact_sec":$pCompactSec%.2f,""" +
        f""""files_before":${pFiles._1},"files_after":${pFiles._2},""" +
        f""""search_pre_sec":$pSearchPre%.2f,"search_post_sec":$pSearchPost%.2f}""")

      // kNN graph: build pays the cell-blocked pair space; append pays
      // delta × cell occupancy (grows with corpus at FIXED k — same
      // caveat as the semantic probe); search is |queries|-bounded
      // walks, the family's flattest read curve
      val gPath = s"$root/graph"
      val gBuild = timed(llmops.GraphIndex.build(vBase, gPath, k = 16))
      val gAppend = timed {
        llmops.GraphIndex.append(vDelta, gPath)
        ops.SessionScratch.evictTransients()
      }
      val gRebuild = timed(llmops.GraphIndex.build(
        vBase.unionByName(vDelta), s"$root/graph_rb", k = 16))
      val gSearchPre = timed {
        llmops.GraphIndex.search(vq, gPath).count()
        ops.SessionScratch.evictTransients()
      }
      var gFiles = (0, 0)
      val gCompactSec = timed {
        gFiles = llmops.GraphIndex.compact(spark, gPath)
      }
      val gSearchPost = timed {
        llmops.GraphIndex.search(vq, gPath).count()
        ops.SessionScratch.evictTransients()
      }
      println(f"""{"index":"knn_graph","corpus_scale":$f,""" +
        f""""n_base":$nVBase,"n_delta":$nVecDelta,""" +
        f""""build_sec":$gBuild%.2f,"append_delta_sec":$gAppend%.2f,""" +
        f""""rebuild_full_sec":$gRebuild%.2f,""" +
        f""""append_vs_rebuild":${gAppend / gRebuild}%.2f,""" +
        f""""compact_sec":$gCompactSec%.2f,""" +
        f""""files_before":${gFiles._1},"files_after":${gFiles._2},""" +
        f""""search_pre_sec":$gSearchPre%.2f,"search_post_sec":$gSearchPost%.2f}""")
    }

    // OCCUPANCY-CONSTANT protocol: the loop above holds k FIXED while
    // the corpus grows 8x, so cell occupancy grows 8x and the
    // occupancy-bounded costs (the graph build's cell-blocked pair
    // space, the semantic probe's delta x occupancy candidate set)
    // grow super-linearly — the documented caveat. Production scales k
    // WITH the corpus (HNSW's hierarchy, SemDeDup's 11k cells on
    // LAION) so occupancy stays constant; this block measures exactly
    // that remediation: the same 8x corpus at k=16 (occupancy 8x) vs
    // k=128 (occupancy ~1x). The `None` points run the AUTO-k default
    // (k = kFor(n), occ-256 policy — round-13 verdict #5): the builder
    // must restore the pair_space/n invariant at 8x WITHOUT the caller
    // choosing k.
    Seq((1, Some(16)), (8, Some(16)), (8, Some(128)),
      (1, None), (8, None)).foreach { case (f, kOpt) =>
      val kTag = kOpt.map(_.toString).getOrElse("auto")
      val root = fresh(s"occ_${f}x_k$kTag")
      val vBase = amplify(embs.filter(col("vec_id") % 10 =!= 0),
        "vec_id", f, s"$root/base")
      val nVBase = vBase.count()
      val gPath = s"$root/graph"
      val gBuild = timed {
        kOpt match {
          case Some(k) => llmops.GraphIndex.build(vBase, gPath, k = k)
          case None    => llmops.GraphIndex.build(vBase, gPath)
        }
        ops.SessionScratch.evictTransients()
      }
      val k = kOpt.getOrElse(
        llmops.IndexMaintenance.kFor(nVBase))
      val sPath = s"$root/ivf"
      llmops.IvfIndex.build(vBase, sPath, k = k)
      val semProbe = timed {
        llmops.IvfIndex.semanticProbe(vDelta, sPath).count()
        ops.SessionScratch.evictTransients()
      }
      // the occupancy claim as a ROW-COUNT fact (fixture timings mix
      // in the n·k training term): Σ_cell occ·(occ-1) = the build's
      // same-cell pair space, and max occupancy = the quadratic bound.
      // Measured BEFORE the append so the numbers are the quantity the
      // label claims (the BUILD's pair space, not build ∪ delta).
      val occ = spark.read.parquet(
          llmops.GraphIndex.dataDir(spark, gPath))
        .filter(col("kind") === "m")
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1)).as("pairs"),
          max(col("n")).as("occ_max"))
        .head()
      val gAppend = timed {
        llmops.GraphIndex.append(vDelta, gPath)
        ops.SessionScratch.evictTransients()
      }
      println(f"""{"protocol":"occupancy_constant","corpus_scale":$f,""" +
        f""""k":$k,"k_policy":"${kOpt.fold("auto")(_ => "explicit")}",""" +
        f""""n_base":$nVBase,"n_delta":$nVecDelta,""" +
        f""""pair_space":${occ.getLong(0)},""" +
        f""""pair_space_per_n":${occ.getLong(0).toDouble / nVBase}%.1f,""" +
        f""""occ_max":${occ.getLong(1)},""" +
        f""""graph_build_sec":$gBuild%.2f,""" +
        f""""graph_append_sec":$gAppend%.2f,""" +
        f""""sem_probe_sec":$semProbe%.2f}""")
    }

    // DELETE cost shape: the takedown claim is "one manifested
    // tombstone append, deletes-sized" — so with a FIXED delete set,
    // delete time must stay flat as the corpus grows 8x, the masked
    // probe pays one deletes-sized anti-join on top of its normal
    // cost, and only the physical drop (compact = corpus rewrite)
    // scales with the corpus.
    Seq(1, 8).foreach { f =>
      val root = fresh(s"del_${f}x")
      val dBase = amplify(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", f, s"$root/docs_base")
      val nD = dBase.count()
      val path = s"$root/dedup"
      llmops.DedupIndex.build(dBase, path)
      // fixed-size delete set at every scale: the UN-amplified ids
      val delIds = docs.filter(col("doc_id") % 10 =!= 0)
        .filter(col("doc_id") % 7 === 0).select(col("doc_id"))
      val nDel = delIds.count()
      val tDelete = timed(llmops.DedupIndex.delete(delIds, path))
      val tProbe = timed {
        llmops.DedupIndex.probe(dDelta, path).count()
        ops.SessionScratch.evictTransients()
      }
      var files = (0, 0)
      val tCompact = timed { files = llmops.DedupIndex.compact(spark, path) }
      val tProbePost = timed {
        llmops.DedupIndex.probe(dDelta, path).count()
        ops.SessionScratch.evictTransients()
      }
      println(f"""{"protocol":"delete_cost","corpus_scale":$f,""" +
        f""""n_base":$nD,"n_deleted":$nDel,""" +
        f""""delete_sec":$tDelete%.2f,"probe_masked_sec":$tProbe%.2f,""" +
        f""""compact_drop_sec":$tCompact%.2f,""" +
        f""""probe_post_sec":$tProbePost%.2f}""")
    }

    // REMEDIATION cost shape (the q234 loop's claim): DECIDING is a
    // sidecar read — flat at any corpus size — and ACTING is the
    // republish only the FLAGGED store pays. Measured: a decide-only
    // sweep (fresh store, verdict ok) vs a decide+act sweep (store
    // built on 2/3 and grown by 1/3 — 33% appended, over the 25%
    // rule) at 1x and 8x.
    Seq(1, 8).foreach { f =>
      val root = fresh(s"rem_${f}x")
      val vBase = amplify(embs.filter(col("vec_id") % 10 =!= 0),
        "vec_id", f, s"$root/base")
      val nVBase = vBase.count()
      llmops.IvfIndex.build(vBase, s"$root/fresh", k = 16)
      llmops.IvfIndex.build(vBase.filter(col("vec_id") % 3 =!= 0),
        s"$root/stale", k = 16)
      llmops.IvfIndex.append(vBase.filter(col("vec_id") % 3 === 0),
        s"$root/stale")
      val tDecide = timed {
        llmops.StoreRemediator.sweepAndRemediate(spark,
          Seq(("fresh", "ivf", s"$root/fresh"))).count()
        ops.SessionScratch.evictTransients()
      }
      val tAct = timed {
        llmops.StoreRemediator.sweepAndRemediate(spark,
          Seq(("stale", "ivf", s"$root/stale"))).count()
        ops.SessionScratch.evictTransients()
      }
      println(f"""{"protocol":"remediation_cost","corpus_scale":$f,""" +
        f""""n_base":$nVBase,"decide_only_sec":$tDecide%.2f,""" +
        f""""decide_and_act_sec":$tAct%.2f}""")
    }

    // WAREHOUSE-maintenance cost shape (the q236 composition's claim):
    // fsck is a sidecar/listing read and vacuum touches only garbage
    // files, so repair-without-act is ~FLAT as the corpus grows; the
    // only corpus-sized work is the republish of a store BOTH healthy
    // and flagged. Measured: a maintain-only sweep (healthy fresh
    // store + torn fresh store — repair happens, no act) vs a
    // maintain+act sweep (torn AND stale store — repair, then the
    // rebuild) at 1x and 8x.
    def injectTorn(dataDir: String): Unit =
      llmops.IndexMaintenance.injectTornAppend(spark, dataDir)
    Seq(1, 8).foreach { f =>
      val root = fresh(s"wh_${f}x")
      val vBase = amplify(embs.filter(col("vec_id") % 10 =!= 0),
        "vec_id", f, s"$root/base")
      val nVBase = vBase.count()
      llmops.IvfIndex.build(vBase, s"$root/healthy", k = 16)
      llmops.IvfIndex.build(vBase, s"$root/torn", k = 16)
      injectTorn(llmops.IvfIndex.dataDir(spark, s"$root/torn"))
      llmops.IvfIndex.build(vBase.filter(col("vec_id") % 3 =!= 0),
        s"$root/torn_stale", k = 16)
      llmops.IvfIndex.append(vBase.filter(col("vec_id") % 3 === 0),
        s"$root/torn_stale")
      injectTorn(llmops.IvfIndex.dataDir(spark, s"$root/torn_stale"))
      val tMaintain = timed {
        llmops.WarehouseMaintenance.sweep(spark, Seq(
          ("healthy", "ivf", s"$root/healthy"),
          ("torn", "ivf", s"$root/torn"))).count()
        ops.SessionScratch.evictTransients()
      }
      val tMaintainAct = timed {
        llmops.WarehouseMaintenance.sweep(spark, Seq(
          ("torn_stale", "ivf", s"$root/torn_stale"))).count()
        ops.SessionScratch.evictTransients()
      }
      println(f"""{"protocol":"warehouse_cost","corpus_scale":$f,""" +
        f""""n_base":$nVBase,"maintain_only_sec":$tMaintain%.2f,""" +
        f""""maintain_and_act_sec":$tMaintainAct%.2f}""")
    }

    // MULTI-STORE remediation serialization (round-14 verdict #6):
    // both sweeps act in a sequential driver loop. Each republish is
    // itself a parallel Spark job over every executor slot, so the
    // hypothesis is that the loop costs nothing to amortize — N acts
    // in one sweep should track N× one act (the rebuilds already
    // saturate the cores; a driver-side pool could only time-slice
    // the same slots and interleave their shuffles). Measured: one
    // flagged store swept alone vs EIGHT flagged stores (same ingest
    // recipe, disjoint paths) swept in one call.
    {
      val root = fresh("fanout")
      val vBase = embs.filter(col("vec_id") % 10 =!= 0)
      def staleStore(i: Int): (String, String, String) = {
        val p = s"$root/stale_$i"
        llmops.IvfIndex.build(vBase.filter(col("vec_id") % 3 =!= 0),
          p, k = 16)
        llmops.IvfIndex.append(vBase.filter(col("vec_id") % 3 === 0), p)
        (s"stale_$i", "ivf", p)
      }
      val single = staleStore(0)
      val tOne = timed {
        llmops.StoreRemediator.sweepAndRemediate(spark,
          Seq(single)).count()
        ops.SessionScratch.evictTransients()
      }
      val eight = (1 to 8).map(staleStore)
      val tEight = timed {
        llmops.StoreRemediator.sweepAndRemediate(spark, eight).count()
        ops.SessionScratch.evictTransients()
      }
      println(f"""{"protocol":"remediation_fanout","n_stores":8,""" +
        f""""one_act_sec":$tOne%.2f,"eight_act_sweep_sec":$tEight%.2f,""" +
        f""""per_store_ratio":${tEight / (8 * tOne)}%.2f}""")
    }
    spark.stop()
  }
}
