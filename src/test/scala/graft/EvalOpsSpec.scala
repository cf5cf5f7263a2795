package graft

import org.apache.spark.sql.functions._

import graft.llmops.{Dedup, GraphIndex, IvfIndex, Sampling, Similarity,
  TextAnalysis}
import graft.ops.{Profiling, Tables}

/** Proofs for the round-12 retrieval-quality / governance / mixing
  * operators: the ANN eval harness (q217), RRF fusion (q218), MMR
  * diversified rerank (q219), the k-anonymity audit (q220), and the
  * UniMax waterfilling allocation (q221). Each gate is replayed
  * independently in plain Scala over collected fixture rows — the
  * specs check the OPERATOR semantics; the DuckDB oracle checks the
  * distributed execution.
  */
class EvalOpsSpec extends SparkTestBase {

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_eval_${tag}_").toString
    new java.io.File(d).deleteOnExit()
    d
  }

  /** floor(v·1e7) per component — PortableHash.fixedPoint in plain
    * Scala, so fdots replay bit-exactly.
    */
  private def fdot(a: Array[Float], b: Array[Float]): Long =
    a.iterator.zip(b.iterator).map { case (x, y) =>
      math.floor(x.toDouble * 1e7).toLong *
        math.floor(y.toDouble * 1e7).toLong
    }.sum

  private lazy val embMap: Map[Long, Array[Float]] =
    Tables(spark, sfDir).embeddings.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
      .toMap

  /** The q180/q217/q219 store recipe on a private path: build on the
    * even ids, append the odd ids under the recorded centroids.
    */
  private lazy val evalStore: String = {
    val path = freshDir("ivf")
    val em = Tables(spark, sfDir).embeddings
    IvfIndex.build(em.filter(col("vec_id") % 2 === 0), path, k = 4)
    IvfIndex.append(em.filter(col("vec_id") % 2 === 1), path)
    path
  }

  test("q217 ANN eval harness: metrics equal an independent replay " +
    "from exact truth x index results; bounds hold") {
    val out = Similarity.q217.run(spark, sfDir).collect()
    assert(out.length == 10)

    val truth = Similarity.q50.run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val qs = Tables(spark, sfDir).embeddings
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("eq"))
    val sys = IvfIndex.search(qs, evalStore).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"),
        r.getAs[Int]("rn")))
      .groupBy(_._1)

    out.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val nRel = r.getAs[Long]("n_rel")
      val nHit = r.getAs[Long]("n_hit")
      val fr = r.getAs[Long]("first_rank")
      val rr = r.getAs[Long]("rr_e12")
      val t = truth(qid)
      val s = sys(qid).sortBy(_._3)
      assert(nRel == t.size && nRel <= 8)
      assert(nHit == s.count(x => t.contains(x._2)), s"q$qid n_hit")
      val expFr = s.find(x => t.contains(x._2)).map(_._3.toLong)
      assert(fr == expFr.getOrElse(0L), s"q$qid first_rank")
      assert(rr == expFr.map(1000000000000L / _).getOrElse(0L))
      assert(nHit <= nRel)
    }
  }

  test("q226 graph-index eval: metrics equal an independent replay " +
    "from exact truth x beam-search results") {
    val out = Similarity.q226.run(spark, sfDir).collect()
    assert(out.length == 10)
    val truth = Similarity.q50.run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val store = freshDir("graph")
    val em = Tables(spark, sfDir).embeddings
    GraphIndex.build(em.filter(col("vec_id") % 2 === 0), store, k = 4)
    GraphIndex.append(em.filter(col("vec_id") % 2 === 1), store)
    val qs = em.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("eq"))
    val sys = GraphIndex.search(qs, store).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"),
        r.getAs[Int]("rn")))
      .groupBy(_._1)
    out.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val t = truth(qid)
      val s = sys(qid).sortBy(_._3)
      assert(r.getAs[Long]("n_hit") == s.count(x => t.contains(x._2)))
      val expFr = s.find(x => t.contains(x._2)).map(_._3.toLong)
      assert(r.getAs[Long]("first_rank") == expFr.getOrElse(0L))
      assert(r.getAs[Long]("rr_e12") ==
        expFr.map(1000000000000L / _).getOrElse(0L))
    }
  }

  test("q222 nDCG@8: the metric replays from exact truth x index " +
    "results under the literal discount table; dcg <= idcg") {
    val disc = Map(1 -> 1000000000L, 2 -> 630929753L, 3 -> 500000000L,
      4 -> 430676558L, 5 -> 386852807L, 6 -> 356207187L,
      7 -> 333333333L, 8 -> 315464876L)
    val truth = Similarity.q50.run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"),
        r.getAs[Int]("rn")))
      .groupBy(_._1)
    val qs = Tables(spark, sfDir).embeddings
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("eq"))
    val sys = IvfIndex.search(qs, evalStore).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"),
        r.getAs[Int]("rn")))
      .groupBy(_._1)
    val out = Similarity.q222.run(spark, sfDir).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val gain = truth(qid).map(t => t._2 -> (9L - t._3)).toMap
      val idcg = truth(qid).map(t => (9L - t._3) * disc(t._3)).sum
      val dcg = sys(qid)
        .flatMap(s => gain.get(s._2).map(g => g * disc(s._3))).sum
      assert(r.getAs[Long]("dcg_e9") == dcg, s"q$qid dcg")
      assert(r.getAs[Long]("idcg_e9") == idcg, s"q$qid idcg")
      assert(r.getAs[Long]("ndcg_e6") == dcg * 1000000L / idcg)
      assert(dcg <= idcg && r.getAs[Long]("ndcg_e6") <= 1000000L)
    }
  }

  test("q223 dedup eval: precision/recall replay from an independent " +
    "Scala computation of the capped-shingle Jaccard truth") {
    val row = Dedup.q223.run(spark, sfDir).collect().head
    val (nPred, nTrue, nHit) = (row.getAs[Long]("n_pred"),
      row.getAs[Long]("n_true"), row.getAs[Long]("n_hit"))
    assert(nHit <= math.min(nPred, nTrue))
    assert(row.getAs[Long]("precision_e6") ==
      (if (nPred == 0) 0L else nHit * 1000000L / nPred))
    assert(row.getAs[Long]("recall_e6") ==
      (if (nTrue == 0) 0L else nHit * 1000000L / nTrue))

    // independent truth: per-doc distinct 3-shingle sets, global df cap,
    // pairs sharing a shingle with 3*|inter| >= |a|+|b|  (J >= 0.5)
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split(" ", -1).toSeq)
      .filter(_._2.size >= 3)
      .map { case (id, ws) =>
        id -> ws.sliding(3).map(_.mkString(" ")).toSet }
    val df = docs.flatMap(_._2).groupBy(identity).map {
      case (s, o) => s -> o.size }
    val capped = docs.map { case (id, ss) =>
      id -> ss.filter(s => df(s) <= Dedup.dfCap) }.toMap
    val ids = capped.keys.toSeq.sorted
    val truthPairs = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      a = capped(ids(i)); b = capped(ids(j))
      ni = a.intersect(b).size
      if ni > 0 && 3L * ni >= a.size + b.size
    } yield (ids(i), ids(j))).toSet
    assert(nTrue == truthPairs.size, "independent truth pair count")

    val pred = Dedup.q41.run(spark, sfDir).collect()
      .filter(_.getAs[Long]("n_bands") >= 4)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(nPred == pred.size)
    assert(nHit == pred.intersect(truthPairs).size)
  }

  test("q218 RRF fusion: scores recompute from the ranks, the cosine " +
    "ranks match an exact replay, ordering is total") {
    val out = Similarity.q50.run(spark, sfDir) // force fixture presence
    assert(out.columns.nonEmpty)
    val rows = TextAnalysis.q218.run(spark, sfDir).collect()
    assert(rows.length == 10)

    // exact cosine top-20 replay (gate tie rule: sim double desc, id)
    val q0 = embMap(0L)
    val cosRank = embMap.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, fdot(q0, v).toDouble / 1e14) }
      .sortBy { case (id, s) => (-s, id) }
      .take(20).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap

    var prev = Long.MaxValue
    var prevId = -1L
    rows.foreach { r =>
      val doc = r.getAs[Long]("doc_id")
      val rb = r.getAs[Long]("bm25_rank")
      val rc = r.getAs[Long]("cos_rank")
      val rrf = r.getAs[Long]("rrf")
      assert(rb >= 0 && rb <= 20 && rc >= 0 && rc <= 20)
      assert(rb > 0 || rc > 0, "a fused doc must come from some system")
      val exp = (if (rb > 0) 1000000000000L / (60 + rb) else 0L) +
        (if (rc > 0) 1000000000000L / (60 + rc) else 0L)
      assert(rrf == exp, s"doc $doc rrf")
      if (rc > 0) assert(cosRank.get(doc).contains(rc), s"doc $doc cos_rank")
      assert(rrf < prev || (rrf == prev && doc > prevId), "total order")
      prev = rrf; prevId = doc
    }
  }

  test("q228 persisted RRF: scores recompute from the ranks, both " +
    "arms match their maintained-store replays") {
    val rows = TextAnalysis.q228.run(spark, sfDir).collect()
    assert(rows.length == 10)
    // semantic arm replay off an identically-built store
    val qv = Tables(spark, sfDir).embeddings
      .filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("eq"))
    val cosRank = IvfIndex.search(qv, evalStore, topk = 20).collect()
      .map(r => r.getAs[Long]("cid") -> r.getAs[Int]("rn").toLong).toMap
    // keyword arm: the q184 gate's top-15 is the top-20's prefix
    val bmTop = TextAnalysis.q184.run(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).zipWithIndex
      .map { case (d, i) => d -> (i + 1L) }.toMap
    rows.foreach { r =>
      val doc = r.getAs[Long]("doc_id")
      val rb = r.getAs[Long]("bm25_rank")
      val rc = r.getAs[Long]("cos_rank")
      val exp = (if (rb > 0) 1000000000000L / (60 + rb) else 0L) +
        (if (rc > 0) 1000000000000L / (60 + rc) else 0L)
      assert(r.getAs[Long]("rrf") == exp, s"doc $doc rrf")
      if (rc > 0) assert(cosRank.get(doc).contains(rc), s"doc $doc rc")
      if (rb > 0 && rb <= 15)
        assert(bmTop.get(doc).contains(rb), s"doc $doc rb vs q184")
      assert(rb > 0 || rc > 0)
    }
  }

  test("q219 MMR rerank: the greedy selection replays exactly from " +
    "the index candidates (scores, picks, and tie rule)") {
    val out = Similarity.q219.run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("pick"),
        r.getAs[Long]("cid"), r.getAs[Long]("score")))
    val qs = Tables(spark, sfDir).embeddings
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("eq"))
    val cand = IvfIndex.search(qs, evalStore, topk = 16).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSeq }

    cand.foreach { case (qid, cids) =>
      val fq = cids.map(c => c -> fdot(embMap(qid), embMap(c))).toMap
      var selected = Vector.empty[Long]
      val replay = (1 to 5).flatMap { pick =>
        val rem = cids.filterNot(selected.contains)
        if (rem.isEmpty) None
        else {
          val scored = rem.map { c =>
            val pen =
              if (selected.isEmpty) 0L
              else selected.map(s => fdot(embMap(c), embMap(s))).max
            (c, 7L * fq(c) - 3L * pen)
          }
          val (c, sc) = scored.minBy { case (c, sc) => (-sc, c) }
          selected :+= c
          Some((qid, pick, c, sc))
        }
      }
      val got = out.filter(_._1 == qid).sortBy(_._2).toSeq
      assert(got == replay, s"q$qid MMR selection")
    }
    assert(out.map(_._1).distinct.length == cand.size)
  }

  test("q220 k-anonymity audit: class sizes cover the table, risky " +
    "flags bind at k<5, and generalization merges classes exactly") {
    val rows = Profiling.q220.run(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("lvl"), r.getAs[Int]("c_nationkey"),
        r.getAs[String]("c_mktsegment"), r.getAs[Long]("band"),
        r.getAs[Long]("k"), r.getAs[Int]("risky")))
    val nCust = Tables(spark, sfDir).customer.count()
    // domain assumption behind the +10^7 cents shift (Profiling.scala):
    // below -100,000.00 Spark's truncating div and DuckDB's flooring //
    // diverge on the banding, silently desyncing the gate
    val minBal = Tables(spark, sfDir).customer
      .agg(min(col("c_acctbal"))).head().getDouble(0)
    assert(minBal >= -100000.0,
      s"c_acctbal domain left the shifted-div safe range: $minBal")
    Seq(0, 1).foreach { lvl =>
      val l = rows.filter(_._1 == lvl)
      assert(l.map(_._5).sum == nCust, s"level $lvl covers the table")
      assert(l.forall(r => (r._6 == 1) == (r._5 < 5)), "risky = k<5")
    }
    // 1000-band classes are exact unions of their 100-band children
    val coarse = rows.filter(_._1 == 0)
      .groupBy(r => (r._2, r._3, r._4 / 10))
      .map { case (k, rs) => k -> rs.map(_._5).sum }
    val l1 = rows.filter(_._1 == 1)
      .map(r => (r._2, r._3, r._4) -> r._5).toMap
    assert(coarse == l1, "generalization ladder is a pure merge")
    // coarsening can only merge classes: every L1 k >= its children's max
    assert(rows.filter(_._1 == 1).map(_._5).sum ==
      rows.filter(_._1 == 0).map(_._5).sum)
  }

  test("q224 decontamination: the per-source rollup and the kept-set " +
    "witness replay from an independent span-set computation") {
    import graft.llmops.PortableHash
    val out = Dedup.q224.run(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_train"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_kept"), r.getAs[Long]("kept_id_sum")))
      .toMap
    val base = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"),
        PortableHash.splitDraw(col("doc_id")).as("bk"),
        PortableHash.tokens(col("text")).as("ws"))
    val spans = base.filter(size(col("ws")) >= 8)
      .select(col("doc_id"), col("bk"),
        explode(PortableHash.spanHashesWide(
          PortableHash.tokenHashes(col("ws")), 8)).as("gh"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bk"),
        r.getAs[Long]("gh")))
    val testSet = spans.filter(_._2 >= 900).map(_._3).toSet
    val droppedIds = spans
      .filter(s => s._2 < 800 && testSet.contains(s._3))
      .map(_._1).toSet
    assert(droppedIds.nonEmpty, "the fixture must plant cross-split dups")
    val train = base.filter(col("bk") < 800)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    train.groupBy(_._2).foreach { case (src, docs) =>
      val (nTrain, nDropped, nKept, keptSum) = out(src)
      val dropped = docs.count(d => droppedIds.contains(d._1))
      assert(nTrain == docs.length, s"$src n_train")
      assert(nDropped == dropped, s"$src n_dropped")
      assert(nKept == docs.length - dropped)
      assert(keptSum ==
        docs.filterNot(d => droppedIds.contains(d._1))
          .map(_._1 % 1000003L).sum,
        s"$src kept-set witness")
    }
    assert(out.keySet == train.map(_._2).toSet)
  }

  test("q227 decon pipeline: the decontamination stage FIRES (drops " +
    "are non-empty) and the packed doc population is exactly the " +
    "scored decon survivors") {
    import graft.llmops.{Curation, CurationDag, PortableHash}
    val docs = Tables(spark, sfDir).documents
    // stage 1 replay: q41/q45's greedy losers
    val losers = Dedup.q41.run(spark, sfDir).collect()
      .filter(_.getAs[Long]("n_bands") >= 4)
      .map(_.getAs[Long]("doc_b")).toSet
    val surv = docs
      .filter(!col("doc_id").isin(losers.toSeq: _*))
      .select(col("doc_id"), col("source"), col("text"))
    // stage 2: the DOC-LEVEL split q227 runs
    val bk = PortableHash.splitDraw(col("doc_id"))
    val withSplit = surv.withColumn("split",
      when(bk < 800, "train").when(bk < 900, "val").otherwise("test"))
    val testIdx = Dedup.spanIndex(
      withSplit.filter(col("split") === "test")).localCheckpoint()
    val train = withSplit.filter(col("split") === "train")
      .select(col("doc_id"), col("source"), col("text"))
    val keptDecon = Dedup.decontaminateSurvivors(train, testIdx)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val trainIds = train.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    // MEASURED COMPOSITION FACT (pinned, not assumed): stage-1
    // near-dup dedup SUBSUMES the fixture's planted cross-split
    // contamination at this scale — every doc q224 would drop on the
    // raw corpus is already a minhash loser, so the composed decon
    // stage correctly no-ops here (and catches exactly the
    // shares-a-span-but-not-near-dup tail at sf0.1: 1 doc). A change
    // to the dedup threshold or the split rule that re-opens the leak
    // flips this assert.
    assert(keptDecon == trainIds,
      "post-dedup sf0.001 survivors have no cross-split span sharing")
    // stage 3: classifier keeps over the survivor corpus
    val keeps = Curation.classifierScores(surv)
      .filter(col("keep")).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val expectedPacked = keptDecon.intersect(keeps)
    val packedDocs = CurationDag.q227.run(spark, sfDir).collect()
      .map(_.getAs[Long]("n_docs")).sum
    assert(packedDocs == expectedPacked.size,
      "the packed population must be the scored decon survivors")

    // the FIRE case, proven on a crafted corpus through the SAME
    // composed helpers: a train doc sharing one 8-token span with a
    // test doc — but NOT a near-dup of it — must drop, while a
    // span-free sibling survives
    import spark.implicits._
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val crafted = Seq(
      // doc_id 1 -> splitDraw 747 (train); shares the span
      (1L, s"$span completely different trailing content words " +
        "one two three four five six seven eight nine ten"),
      // doc_id 3 -> splitDraw 234 (train); no shared span
      (3L, "unrelated filler text with plenty of its own words " +
        "and no overlap at all beyond tiny bits"),
      // doc_id 4 -> splitDraw 974 (test); the benchmark doc
      (4L, s"benchmark question preamble $span benchmark answer tail")
    ).toDF("doc_id", "text")
    val cbk = PortableHash.splitDraw(col("doc_id"))
    val cIdx = Dedup.spanIndex(crafted.filter(cbk >= 900))
    val cKept = Dedup.decontaminateSurvivors(
      crafted.filter(cbk < 800), cIdx)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(cKept == Set(3L),
      "the span-sharing train doc drops; the clean one survives")
  }

  test("q225 l-diversity: classes aggregate q220's level-1 cells " +
    "exactly (same QI ladder), l bounds hold, homogeneity binds") {
    val l1 = Profiling.q220.run(spark, sfDir).collect()
      .filter(_.getAs[Int]("lvl") == 1)
      .map(r => (r.getAs[Int]("c_nationkey"), r.getAs[Long]("band"),
        r.getAs[String]("c_mktsegment"), r.getAs[Long]("k")))
    val byClass = l1.groupBy(r => (r._1, r._2))
    val out = Profiling.q225.run(spark, sfDir).collect()
    assert(out.length == byClass.size)
    out.foreach { r =>
      val key = (r.getAs[Int]("c_nationkey"), r.getAs[Long]("band"))
      val k = r.getAs[Long]("k")
      val l = r.getAs[Long]("l")
      val cells = byClass(key)
      assert(k == cells.map(_._4).sum, s"$key k aggregates q220 cells")
      assert(l == cells.map(_._3).distinct.length, s"$key l")
      assert(l >= 1 && l <= 5 && l <= k)
      assert((r.getAs[Int]("homogeneous") == 1) == (l < 2))
    }
    assert(out.map(_.getAs[Long]("k")).sum ==
      Tables(spark, sfDir).customer.count())
  }

  test("q221 waterfill: allocation is feasible, exhausts the budget, " +
    "is max-min fair, and the +1 remainder goes to the largest caps") {
    val rows = Sampling.q221.run(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("tok"),
        r.getAs[Long]("cap"), r.getAs[Long]("alloc"),
        r.getAs[Int]("saturated")))
    val b = rows.map(_._2).sum
    assert(rows.map(_._4).sum == b, "allocation exhausts the budget")
    rows.foreach { case (src, _, cap, alloc, sat) =>
      assert(alloc <= cap, s"$src within cap")
      assert((sat == 1) == (alloc == cap), s"$src saturated flag")
    }
    val unsat = rows.filter(_._5 == 0)
    assert(unsat.nonEmpty, "2-epoch caps over a 1-epoch budget must " +
      "leave unsaturated sources")
    val t = unsat.map(_._4).min
    assert(unsat.map(_._4).max <= t + 1, "water level within 1 token")
    // saturated sources sit at or below the water level
    rows.filter(_._5 == 1).foreach { case (src, _, cap, _, _) =>
      assert(cap <= t, s"$src saturated cap below the level")
    }
    // the +1 bonus lands on the r largest-cap unsaturated sources
    val r = unsat.count(_._4 == t + 1)
    val expected = unsat.sortBy { case (src, _, cap, _, _) => (-cap, src) }
      .take(r).map(_._1).toSet
    assert(unsat.filter(_._4 == t + 1).map(_._1).toSet == expected,
      "deterministic remainder assignment")
  }
}
