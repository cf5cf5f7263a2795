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

  /** k-anonymity / quasi-identifier re-identification risk audit
    * (Sweeney 2002) — the governance check a training corpus with
    * person-derived rows runs before release (the q206 datasheet's
    * privacy column): group rows by their quasi-identifier tuple
    * (nation, market segment, account-balance band) and report each
    * equivalence class's size k; a class with k < 5 re-identifies its
    * members. Emitted at TWO generalization levels (100-currency
    * bands, then 1000-currency bands) so the audit shows the
    * generalization ladder: coarsening the band merges classes and
    * lifts k — the standard k-anonymity remediation, measured rather
    * than assumed.
    *
    * Exactness: the band is integer arithmetic on exact cents
    * (double→DECIMAL(18,2)→×100, the Det.dec2 money rule), shifted
    * positive before the integer division so Spark's `div` (truncate)
    * and DuckDB's `//` (floor) agree. DOMAIN ASSUMPTION: the +10^7
    * shift covers c_acctbal ≥ -100,000.00 (TPC-H generates
    * [-999.99, 9999.99]); below that the shifted cents go negative
    * and truncating vs flooring division diverge — EvalOpsSpec's q220
    * test asserts the fixture domain so a fixture change surfaces as
    * a test failure, not a silent gate desync. k and the risky flag
    * are integers — the whole audit sheet hash-gates.
    *
    * Scale shape: one hash-agg per level over one scan each (pure
    * map-side-combined GROUP BY — no window, no join); the class
    * table is |QI-space|-bounded, never |rows|. At 100 TB the audit
    * is exactly as parallel as a grouped count.
    */
  val q220 = EngineQuery(
    "q220_kanon_risk_audit",
    (s, dir) => {
      val t = Tables(s, dir)
      def level(lvl: Int, width: Long) =
        t.customer
          .select(col("c_nationkey"), col("c_mktsegment"),
            (Det.dec2(col("c_acctbal")) * 100).cast("long").as("cents"))
          .select(col("c_nationkey"), col("c_mktsegment"),
            expr(s"(cents + 10000000) div $width").as("band"))
          .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
          .agg(count(lit(1)).as("k"))
          .select(lit(lvl).as("lvl"), col("c_nationkey"),
            col("c_mktsegment"), col("band"), col("k"),
            when(col("k") < 5, lit(1)).otherwise(lit(0)).as("risky"))
      level(0, 10000L).unionByName(level(1, 100000L))
        .orderBy(col("lvl"), col("c_nationkey"), col("c_mktsegment"),
          col("band"))
    },
    Some("""WITH cents AS (
              SELECT c_nationkey, c_mktsegment,
                CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS cents
              FROM customer
            ), l0 AS (
              SELECT 0 AS lvl, c_nationkey, c_mktsegment,
                CAST((cents + 10000000) // 10000 AS BIGINT) AS band,
                COUNT(*) AS k
              FROM cents GROUP BY 2, 3, 4
            ), l1 AS (
              SELECT 1 AS lvl, c_nationkey, c_mktsegment,
                CAST((cents + 10000000) // 100000 AS BIGINT) AS band,
                COUNT(*) AS k
              FROM cents GROUP BY 2, 3, 4
            )
            SELECT lvl, c_nationkey, c_mktsegment, band, k,
              CASE WHEN k < 5 THEN 1 ELSE 0 END AS risky
            FROM (SELECT * FROM l0 UNION ALL SELECT * FROM l1) u
            ORDER BY lvl, c_nationkey, c_mktsegment, band"""))

  /** l-diversity audit (Machanavalli et al. 2007) — k-anonymity's
    * blind spot made measurable: a class can satisfy k ≥ 5 yet still
    * disclose its members' sensitive attribute when every member
    * SHARES it (homogeneity attack). Quasi-identifiers here are
    * (nation, 1000-unit balance band) — q220's level-1 ladder rung —
    * and the sensitive attribute is the market segment: per class,
    * k (size), l (distinct segments), and a homogeneous flag (l < 2).
    * The band shares q220's +10^7 shift and its DOMAIN ASSUMPTION
    * (c_acctbal ≥ -100,000.00 — asserted in EvalOpsSpec).
    *
    * Scale shape: ONE hash-agg over one scan — the distinct count
    * plans as Catalyst's expand+aggregate (q99's discipline), still
    * map-side partial, no join, no window.
    */
  val q225 = EngineQuery(
    "q225_ldiversity_audit",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .select(col("c_nationkey"),
          (Det.dec2(col("c_acctbal")) * 100).cast("long").as("cents"),
          col("c_mktsegment"))
        .select(col("c_nationkey"),
          expr("(cents + 10000000) div 100000").as("band"),
          col("c_mktsegment"))
        .groupBy(col("c_nationkey"), col("band"))
        .agg(count(lit(1)).as("k"),
          countDistinct(col("c_mktsegment")).as("l"))
        .select(col("c_nationkey"), col("band"), col("k"), col("l"),
          when(col("l") < 2, lit(1)).otherwise(lit(0))
            .as("homogeneous"))
        .orderBy(col("c_nationkey"), col("band"))
    },
    Some("""WITH cents AS (
              SELECT c_nationkey, c_mktsegment,
                CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS cents
              FROM customer
            )
            SELECT c_nationkey,
              CAST((cents + 10000000) // 100000 AS BIGINT) AS band,
              COUNT(*) AS k,
              COUNT(DISTINCT c_mktsegment) AS l,
              CASE WHEN COUNT(DISTINCT c_mktsegment) < 2
                THEN 1 ELSE 0 END AS homogeneous
            FROM cents
            GROUP BY 1, 2 ORDER BY c_nationkey, band"""))

  val all: Seq[EngineQuery] = Seq(q99, q108, q220, q225)
}
