package graft.ops

import org.apache.spark.sql.functions._

/** Single-pass data profiling (training-pipeline intake step): per
  * column — row count, null count, exact distinct count, min/max —
  * computed in ONE aggregation over ONE scan. The 100 TB shape: all
  * per-column aggregates ride the same scan; the multi-column
  * COUNT(DISTINCT) plans as Catalyst's expand+aggregate (row expansion
  * factor = #distinct-columns, still one pass, map-side partials); at
  * larger cardinalities each exact distinct swaps for
  * approx_count_distinct without touching the query shape (q08b
  * pattern). Min/max cast to strings AFTER aggregating, so numerics
  * keep numeric ordering; long text values are truncated at the
  * serialization boundary only.
  */
object Profiling {

  private val profiled = Seq("doc_id", "text", "lang", "source", "n_chars")

  val q99 = EngineQuery(
    "q99_profile_documents",
    (s, dir) => {
      val t = Tables(s, dir)
      val aggs = count(lit(1)).as("n_rows") +: profiled.flatMap { c =>
        Seq(
          (count(lit(1)) - count(col(c))).as(s"${c}__nnull"),
          countDistinct(col(c)).as(s"${c}__ndist"),
          substring(min(col(c)).cast("string"), 1, 16).as(s"${c}__min"),
          substring(max(col(c)).cast("string"), 1, 16).as(s"${c}__max"))
      }
      val stackArgs = profiled.map(c =>
        s"'$c', ${c}__nnull, ${c}__ndist, ${c}__min, ${c}__max")
        .mkString(", ")
      t.documents
        .agg(aggs.head, aggs.tail: _*)
        .select(col("n_rows"), expr(
          s"stack(${profiled.size}, $stackArgs) AS " +
            "(column_name, n_null, n_distinct, min_val, max_val)"))
        .select(col("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
        .orderBy(col("column_name"))
    },
    Some {
      val perCol = profiled
        .map { c =>
          s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
                COUNT(*) - COUNT($c) AS n_null,
                COUNT(DISTINCT $c) AS n_distinct,
                substr(CAST(MIN($c) AS VARCHAR), 1, 16) AS min_val,
                substr(CAST(MAX($c) AS VARCHAR), 1, 16) AS max_val
              FROM documents"""
        }
        .mkString(" UNION ALL ")
      s"SELECT * FROM ($perCol) ORDER BY column_name"
    })

  /** Equal-width feature histogram — the distribution profile behind
    * binning/outlier checks: 20 bins over [min, max] of o_totalprice,
    * computed in two passes over one column (global min/max, then a
    * per-row bin projection + one hash-agg). Bin id arithmetic is the
    * SAME IEEE expression on both sides — `(v-mn)/(mx-mn)` then `*20`,
    * floor (tie-free), top edge clamped into the last bin — so
    * assignments hash-match. Per-bin min/max are raw values (no
    * arithmetic); the count is the histogram. At 100 TB the min/max
    * pass is a map-side-combined scalar agg the bin pass broadcasts.
    */
  val q108 = EngineQuery(
    "q108_feature_histogram",
    (s, dir) => {
      val t = Tables(s, dir)
      val stats = t.orders.agg(min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"))
      val bin = least(
        floor((col("o_totalprice") - col("mn")) / (col("mx") - col("mn"))
          * 20.0).cast("int"),
        lit(19)).as("bin")
      t.orders.crossJoin(broadcast(stats))
        .select(bin, col("o_totalprice"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("bin"))
    },
    Some("""WITH stats AS (
              SELECT MIN(o_totalprice) mn, MAX(o_totalprice) mx FROM orders
            )
            SELECT LEAST(CAST(FLOOR((o_totalprice - mn) / (mx - mn) * 20.0)
                AS INT), 19) AS bin,
              COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
            FROM orders, stats
            GROUP BY 1 ORDER BY bin"""))

  val all: Seq[EngineQuery] = Seq(q99, q108)
}
