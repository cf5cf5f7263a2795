package graft.streaming

import org.apache.spark.sql.functions._

import graft.ops.{EngineQuery, Tables}

/** Batch-mode gate entries for the two stateful streaming operators
  * whose correctness was previously asserted only in StreamingSpec
  * (SURVEY.md §2.9: cross-batch per-source quota, stream-static
  * incremental dedup). Spark executes `flatMapGroupsWithState` and the
  * stream-static anti-join identically over a batch Dataset (state
  * starts empty, the whole input is one "micro-batch"), so running the
  * SAME operator code here chains the StreamingSpec stream==batch
  * equality assertions all the way to a DuckDB oracle: stream output ==
  * batch output (spec) and batch output == SQL semantics (gate).
  */
object StreamingTwins {

  /** Per-source quota, batch mode: over a single batch the quality-
    * ranked admission (n_chars DESC, doc_id ASC — q77's key) selects
    * exactly the windowed top-cap per source, so the oracle is the
    * same ROW_NUMBER rule as q77's, emitting the admitted rows
    * themselves rather than q77's per-source rollup.
    */
  val q154 = EngineQuery(
    "q154_stream_quota_batch_twin",
    (s, dir) => {
      val t = Tables(s, dir)
      StreamingOps.sourceQuota(s,
        t.documents.select(col("doc_id"), col("source"), col("n_chars")),
        cap = 10L)
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, source, n_chars
            FROM (SELECT doc_id, source, n_chars,
                    ROW_NUMBER() OVER (PARTITION BY source
                      ORDER BY n_chars DESC, doc_id) AS rk
                  FROM documents)
            WHERE rk <= 10
            ORDER BY doc_id"""))

  /** Stream-static incremental exact dedup, batch mode: the odd-id half
    * of the corpus plays the arriving crawl, the even-id half the
    * static corpus index — the same split StreamingSpec streams through
    * a file source. The fixture has no cross-parity exact duplicates
    * (a passthrough would prove nothing), so the crawl additionally
    * carries re-crawled copies of the 10 lowest even-id texts under
    * fresh ids — the operator must drop exactly those. Stateless
    * left-anti equi-join on the md5 content key, identical in batch
    * and micro-batch execution.
    */
  val q155 = EngineQuery(
    "q155_stream_dedup_batch_twin",
    (s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents.select(col("doc_id"), col("source"),
        col("text"))
      val existing = docs.filter(col("doc_id") % 2 === 0)
      val recrawled = existing.orderBy(col("doc_id")).limit(10)
        .withColumn("doc_id", col("doc_id") + 10000L)
      StreamingOps.incrementalExactDedup(
        newDocs = docs.filter(col("doc_id") % 2 === 1)
          .unionByName(recrawled),
        existing = existing)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH existing AS (
              SELECT doc_id, source, text FROM documents
              WHERE doc_id % 2 = 0
            ), crawl AS (
              SELECT doc_id, source, text FROM documents
              WHERE doc_id % 2 = 1
              UNION ALL
              SELECT doc_id + 10000 AS doc_id, source, text
              FROM (SELECT doc_id, source, text FROM existing
                    ORDER BY doc_id LIMIT 10)
            )
            SELECT n.doc_id, n.source
            FROM (SELECT doc_id, source, md5(text) AS k FROM crawl) n
            ANTI JOIN (SELECT DISTINCT md5(text) AS k FROM existing) e
              ON n.k = e.k
            ORDER BY n.doc_id"""))

  val all: Seq[EngineQuery] = Seq(q154, q155)
}
