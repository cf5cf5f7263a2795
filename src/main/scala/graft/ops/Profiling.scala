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

  val all: Seq[EngineQuery] = Seq(q99)
}
