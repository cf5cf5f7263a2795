package graft.llmops

import org.apache.spark.sql.functions._

import graft.ops.{EngineQuery, SessionScratch, Tables}

/** The COMPOSED curation pipeline (SURVEY.md §2.4 [ext]; north star
  * BASELINE.json): the stages the registry proves individually —
  * near-dup dedup (q41/q45), group-holdout splitting (q172), and
  * quality-classifier scoring (q168) — chained as ONE DAG, the way a
  * production corpus-curation run executes them. The gate exists to
  * prove the operators COMPOSE without re-scans: each stage boundary
  * is one materialized checkpoint, and every downstream stage reads
  * the boundary, never the raw corpus again.
  *
  * Scale shape (100 TB): the documents table is read exactly twice in
  * total, both inside stage 1 (the signature pipeline's shingle scan +
  * the survivor fetch — the same two reads q45 itself performs); the
  * survivor set is checkpointed ONCE and feeds BOTH stage-2 split
  * assignment and stage-3 feature explode, so the executed gate plan
  * contains zero parquet scans (PLANS.md asserts it). Scoring keeps
  * q168's shape: 4096-row weight broadcast, one feature explode,
  * map-side-combined per-doc rollup.
  */
object CurationDag {

  val q178 = EngineQuery(
    "q178_curation_pipeline",
    (s, dir) => {
      val t = Tables(s, dir)
      // STAGE 1 — dedup (q45's greedy resolution: for every strong
      // candidate pair the higher doc_id drops). The surviving corpus
      // is the stage boundary: materialized once, never recomputed.
      val losers = Dedup.minhashPairs(s, dir)
        .filter(col("n_bands") >= 4)
        .select(col("doc_b").as("doc_id"))
        .distinct()
      val survivors = SessionScratch.transientCheckpoint(
        t.documents.join(losers, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("source"), col("text")))
      // STAGE 2 — split assignment: a pure projection over the
      // boundary (the q172 source-hash rule; no shuffle of its own)
      val split = survivors.select(col("doc_id"),
        Sampling.groupSplit(col("source")).as("split"))
      // STAGE 3 — quality scoring (q168's exact inference) over the
      // SAME boundary checkpoint: the corpus is not re-read
      val scored = Curation.classifierScores(survivors)
      // rollup: per split, corpus size, teacher-keep count, and the
      // exact integer score mass. Docs too short to featurize (<2
      // tokens) have no score row — LEFT join keeps them in n_docs
      // and counts them as not-kept (CASE over a NULL w_sum).
      split.join(scored, Seq("doc_id"), "left")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
          sum(coalesce(col("w_sum"), lit(0L))).as("w_sum_total"))
        .orderBy(col("split"))
    },
    Some {
      val B = Curation.ClfBuckets
      val bucket = PortableHash.splitDrawSql(
        PortableHash.charHashSql("source"))
      Dedup.minhashPairsCtes + s"""
         , losers AS (
             SELECT DISTINCT doc_b AS doc_id FROM pairs WHERE n_bands >= 4
           ), surv AS MATERIALIZED (
             SELECT d.doc_id, d.source, d.text
             FROM documents d ANTI JOIN losers l ON d.doc_id = l.doc_id
           ), spl AS (
             SELECT doc_id,
               CASE WHEN bkt < 800 THEN 'train'
                    WHEN bkt < 900 THEN 'val'
                    ELSE 'test' END AS split
             FROM (SELECT doc_id, $bucket AS bkt FROM surv)
           ), w AS (
             SELECT p AS b,
               ((p+1)*2654435761 % 1000000007) % 2001 - 1000 AS wt
             FROM (SELECT UNNEST(range(0, $B)) p)
           ), stoks AS (
             SELECT doc_id, string_split(trim(text), ' ') ws FROM surv
           ), sth AS (
             SELECT doc_id,
               [coalesce(list_sum([(ascii(w[i])
                   * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                   % 1000000007
                   for i in range(1, length(w)+1)]) % 1000000007, 0)
                for w in ws] AS ths
             FROM stoks WHERE len(ws) >= 2
           ), sfeats AS (
             SELECT doc_id, UNNEST(list_concat(
               [t % $B for t in ths],
               [(${PortableHash.spanHashSql("ths", 2)}) % $B
                for i in range(1, len(ths))])) AS b
             FROM sth
           ), sscored AS (
             SELECT f.doc_id, CAST(SUM(w.wt) AS BIGINT) AS w_sum
             FROM sfeats f JOIN w ON f.b = w.b
             GROUP BY f.doc_id
           )
           SELECT s.split, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN sc.w_sum >= 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_keep,
             CAST(SUM(COALESCE(sc.w_sum, 0)) AS BIGINT) AS w_sum_total
           FROM spl s LEFT JOIN sscored sc ON s.doc_id = sc.doc_id
           GROUP BY s.split ORDER BY s.split"""
    })

  val all: Seq[EngineQuery] = Seq(q178)
}
