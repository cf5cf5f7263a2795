package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.ops.{EngineQuery, Tables}

/** End-to-end training-data curation pipeline (north star): the composed
  * form of the individual llmops operators —
  *
  *   surface stats → quality gate → exact dedup (canonical doc per
  *   normalized fingerprint) → language scoring → token accounting
  *
  * One declarative plan: Catalyst fuses the per-row stages into the scan
  * projection, and the only shuffle is the dedup groupBy on the
  * fingerprint. At 100 TB this runs as scan → map → one exchange → map.
  */
object Curation {

  val MinWords = 5
  val MaxPunctRatio = 0.10

  /** Quality-gated rows with stats + fingerprint — the shared first
    * stage of [[curate]] and [[survivors]]. Stats come from the shared
    * [[TextStats]] expressions, so the gate agrees with the reported
    * q61/q63 statistics by construction.
    */
  def gated(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("text"),
      TextStats.nWords(col("text")).as("n_words"),
      TextStats.punctRatio(col("text")).as("punct_ratio"),
      TextStats.fingerprintMd5(col("text")).as("fp"))
      .filter(col("n_words") >= MinWords && col("punct_ratio") <= MaxPunctRatio)

  /** Just the surviving doc ids (canonical doc per fingerprint): ONE
    * hash aggregation — no join back, no sort. Downstream consumers
    * (q72) that only need the id set must use this, not [[curate]],
    * which pays a second exchange to re-attach the per-doc stats.
    */
  def survivors(docs: DataFrame): DataFrame =
    gated(docs).groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))

  /** The full curation plan over a `documents`-shaped frame. */
  def curate(docs: DataFrame): DataFrame = {
    val g = gated(docs)

    // exact dedup: canonical row = min doc_id per fingerprint
    val canonical = g
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))

    canonical
      .join(g, Seq("fp", "doc_id"))
      .select(col("doc_id"), col("fp"), col("lang"), col("n_words"),
        col("punct_ratio"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** The staged+gated CTE text shared by the q64 and q72 oracles — ONE
    * definition, so the SQL replica of the gate cannot silently diverge
    * between the queries that claim to share it.
    */
  val gateCtesSql: String =
    s"""staged AS (
         SELECT doc_id, lang, text,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE length(trim(text))
                     - length(regexp_replace(trim(text), ' ', '', 'g')) + 1
           END AS n_words,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST(length(text)
                     - length(regexp_replace(text, '[.,!?]', '', 'g'))
                     AS DOUBLE) / length(text)
           END AS punct_ratio,
           md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp
         FROM documents
       ), gated AS (
         SELECT * FROM staged
         WHERE n_words >= $MinWords AND punct_ratio <= $MaxPunctRatio
       )"""

  /** Driver-gate query: the whole pipeline, oracle-checked. */
  val q64 = EngineQuery(
    "q64_curation_pipeline",
    (s, dir) => curate(Tables(s, dir).documents),
    Some(s"""WITH $gateCtesSql, canonical AS (
              SELECT fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
              FROM gated GROUP BY fp
            )
            SELECT g.doc_id, g.fp, g.lang, g.n_words, g.punct_ratio,
              c.n_copies
            FROM canonical c JOIN gated g
              ON g.fp = c.fp AND g.doc_id = c.doc_id
            ORDER BY g.doc_id"""))

  /** Per-source RELATIVE quality pruning — drop each source's shortest
    * 30% by word count. Absolute gates ([[gated]]'s MinWords) mis-prune
    * when source length distributions differ (a floor tuned for web
    * text deletes half a short-form source or keeps all of a noisy
    * one); the percentile prune adapts per source.
    *
    * Scale design: aggregate-then-broadcast, NOT a per-source window —
    * the exact per-source threshold is one map-side-combined
    * percentile aggregate (|sources| rows out) broadcast back as a
    * filter. A `percent_rank` window would total-sort every source's
    * rows on one partition each; the threshold join touches each row
    * once in the scan projection. Same decorrelation shape as the
    * TPC-H Q17/Q22 composites.
    */
  val q59 = EngineQuery(
    "q59_quality_percentile_prune",
    (s, dir) => {
      val scored = Tables(s, dir).documents
        .select(col("doc_id"), col("source"),
          TextStats.nWords(col("text")).as("n_words"))
      val thresholds = scored.groupBy(col("source"))
        .agg(expr("percentile(n_words, 0.3)").as("thresh"))
      scored.join(broadcast(thresholds), Seq("source"))
        .filter(col("n_words") >= col("thresh"))
        .select(col("doc_id"), col("source"), col("n_words"),
          col("thresh"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH scored AS (
              SELECT doc_id, source,
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE length(trim(text))
                          - length(regexp_replace(trim(text), ' ', '', 'g'))
                          + 1
                END AS n_words
              FROM documents
            ), th AS (
              SELECT source, quantile_cont(n_words, 0.3) AS thresh
              FROM scored GROUP BY source
            )
            SELECT s.doc_id, s.source, s.n_words, t.thresh
            FROM scored s JOIN th t USING (source)
            WHERE s.n_words >= t.thresh
            ORDER BY s.doc_id"""))

  val all: Seq[EngineQuery] = Seq(q59, q64)
}
