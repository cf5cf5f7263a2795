package graft.llmops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{EngineQuery, Tables}
import PortableHash._

/** Context-window preparation (training-data pipeline [ext]): split
  * documents into overlapping token chunks, then pack sequences into
  * fixed-capacity bins. Both are pure per-row/window plans — no joins,
  * no driver state, nothing quadratic.
  */
object Chunking {

  val ChunkSize = 50
  val Stride = 40 // = ChunkSize - 10 overlap

  /** Fixed-size token chunks with overlap: one `explode` of the chunk
    * starts per document (start positions 1, 1+stride, ... <= n_tokens),
    * chunk text via a bounded slice. Linear in total tokens; the
    * explode factor is n/stride per doc — no shuffle at all (the gate's
    * ORDER BY is presentation only).
    */
  val q68 = EngineQuery(
    "q68_doc_chunking",
    (s, dir) => {
      val t = Tables(s, dir)
      val n = size(col("ws"))
      val end = least(col("start") + (ChunkSize - 1), col("n"))
      t.documents
        .select(col("doc_id"), tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 1)
        .select(col("doc_id"), col("ws"), n.as("n"),
          posexplode(sequence(lit(1), n, lit(Stride)))
            .as(Seq("chunk_idx", "start")))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("start").cast("long").as("start"),
          (end - col("start") + 1).cast("long").as("n_tok"),
          concat_ws(" ",
            slice(col("ws"), col("start"), lit(ChunkSize))).as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some(s"""WITH d AS (
              SELECT doc_id, string_split(trim(text), ' ') ws
              FROM documents
            ), starts AS (
              SELECT doc_id, ws, len(ws) AS n,
                UNNEST(range(1, len(ws) + 1, $Stride)) AS start
              FROM d WHERE len(ws) >= 1
            )
            SELECT doc_id,
              CAST((start - 1) / $Stride AS BIGINT) AS chunk_idx,
              CAST(start AS BIGINT) AS start,
              CAST(LEAST(start + ${ChunkSize - 1}, n) - start + 1 AS BIGINT)
                AS n_tok,
              array_to_string(
                list_slice(ws, start, start + ${ChunkSize - 1}), ' ')
                AS chunk_text
            FROM starts ORDER BY doc_id, chunk_idx"""))

  /** Contiguous sequence packing: documents fill 2048-token bins in
    * doc_id order WITHIN each language partition — a running-sum window
    * assigns each doc to the bin where its tokens start. Packing per
    * stratum (not globally) is deliberate: a single global running sum
    * is one sort partition at 100 TB, while per-stratum windows
    * parallelize across the cluster; cross-stratum bins don't exist in
    * practice (batches are language/domain-homogeneous). Docs longer
    * than the capacity straddle bins by construction (documented
    * contract — a splitter runs q68 first).
    */
  val q69 = EngineQuery(
    "q69_sequence_packing",
    (s, dir) => {
      val t = Tables(s, dir)
      val cap = 2048L
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.documents
        .select(col("doc_id"), col("lang"),
          size(tokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("bin",
          floor((sum(col("n_tok")).over(w) - col("n_tok")) / cap))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"))
        .orderBy(col("lang"), col("bin"))
    },
    Some("""WITH d AS (
              SELECT doc_id, lang,
                CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
              FROM documents
            ), binned AS (
              SELECT lang,
                CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY lang
                  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
                  CURRENT ROW) - n_tok) / 2048.0) AS BIGINT) AS bin,
                n_tok
              FROM d
            )
            SELECT lang, bin, COUNT(*) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS sum_tok
            FROM binned GROUP BY 1, 2
            ORDER BY lang NULLS FIRST, bin"""))

  /** The composed preparation pipeline — quality gate + exact dedup →
    * chunk the SURVIVORS → pack the CHUNKS into 2048-token bins per
    * language. One declarative program: Catalyst fuses the per-row
    * stages; the shuffles are exactly the dedup groupBy (via
    * Curation.survivors — just the id set, NOT the full curate() plan,
    * which pays a second join to re-attach stats q72 would throw
    * away), the survivor join, and the per-stratum pack window —
    * nothing else. The oracle's gate CTEs are Curation.gateCtesSql,
    * the SAME string q64 verifies — by-construction agreement is
    * structural, not copy-paste.
    */
  val q72 = EngineQuery(
    "q72_prep_pipeline",
    (s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents.join(Curation.survivors(t.documents), "doc_id")
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 1)
      val n = size(col("ws"))
      val chunks = docs
        .select(col("doc_id"), col("lang"), n.as("n"),
          explode(sequence(lit(1), n, lit(Stride))).as("start"))
        .select(col("doc_id"), col("lang"), col("start"),
          (least(col("start") + (ChunkSize - 1), col("n"))
            - col("start") + 1).cast("long").as("n_tok"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("doc_id"), col("start"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      chunks
        .withColumn("bin",
          floor((sum(col("n_tok")).over(w) - col("n_tok")) / lit(2048L)))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_chunks"), sum(col("n_tok")).as("sum_tok"))
        .orderBy(col("lang"), col("bin"))
    },
    Some(s"""WITH ${Curation.gateCtesSql}, survivors AS (
              SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY fp
            ), docs AS (
              SELECT d.doc_id, d.lang, string_split(trim(d.text), ' ') ws
              FROM documents d JOIN survivors s USING (doc_id)
            ), chunks AS (
              SELECT doc_id, lang, start,
                CAST(LEAST(start + ${ChunkSize - 1}, len(ws)) - start + 1
                  AS BIGINT) AS n_tok
              FROM (
                SELECT doc_id, lang, ws,
                  UNNEST(range(1, len(ws) + 1, $Stride)) AS start
                FROM docs WHERE len(ws) >= 1)
            ), binned AS (
              SELECT lang,
                CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY lang
                  ORDER BY doc_id, start ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) - n_tok) / 2048.0) AS BIGINT) AS bin,
                n_tok
              FROM chunks
            )
            SELECT lang, bin, COUNT(*) AS n_chunks,
              CAST(SUM(n_tok) AS BIGINT) AS sum_tok
            FROM binned GROUP BY 1, 2
            ORDER BY lang NULLS FIRST, bin"""))

  val all: Seq[EngineQuery] = Seq(q68, q69, q72)
}
