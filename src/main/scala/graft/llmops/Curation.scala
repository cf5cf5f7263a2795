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

  /** The curation plan over a `documents`-shaped frame. Stats come from
    * the shared [[TextStats]] expressions, so the gate agrees with the
    * reported q61/q63 statistics by construction.
    */
  def curate(docs: DataFrame): DataFrame = {
    val staged = docs.select(col("doc_id"), col("lang"), col("text"),
      TextStats.nWords(col("text")).as("n_words"),
      TextStats.punctRatio(col("text")).as("punct_ratio"),
      TextStats.fingerprintMd5(col("text")).as("fp"))

    val gated = staged
      .filter(col("n_words") >= MinWords && col("punct_ratio") <= MaxPunctRatio)

    // exact dedup: canonical row = min doc_id per fingerprint
    val canonical = gated
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))

    canonical
      .join(gated, Seq("fp", "doc_id"))
      .select(col("doc_id"), col("fp"), col("lang"), col("n_words"),
        col("punct_ratio"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** Driver-gate query: the whole pipeline, oracle-checked. */
  val q64 = EngineQuery(
    "q64_curation_pipeline",
    (s, dir) => curate(Tables(s, dir).documents),
    Some("""WITH staged AS (
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
              WHERE n_words >= 5 AND punct_ratio <= 0.10
            ), canonical AS (
              SELECT fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
              FROM gated GROUP BY fp
            )
            SELECT g.doc_id, g.fp, g.lang, g.n_words, g.punct_ratio,
              c.n_copies
            FROM canonical c JOIN gated g
              ON g.fp = c.fp AND g.doc_id = c.doc_id
            ORDER BY g.doc_id"""))

  val all: Seq[EngineQuery] = Seq(q64)
}
