package graft.ops

import org.apache.spark.sql.functions._

import Det._

/** Third TPC-H-shaped set — Q1/Q2/Q6/Q8/Q9/Q20, the six public shapes
  * the first two suites (TpchSuite: Q3/Q4/Q5/Q10/Q12/Q14/Q18/Q19,
  * TpchSuite2: Q7/Q11/Q13/Q15/Q16/Q17/Q21/Q22) left uncovered. With
  * these the engine carries all 22 TPC-H query shapes, adapted where
  * the fixture schema lacks a column (no partsupp: the part↔supplier
  * relation is the DISTINCT lineitem pair set; no ps_supplycost:
  * p_retailprice prices the cost side of the Q9 profit decomposition).
  *
  * Shape inventory here:
  *  - Q1: the wide pricing-summary scan — many exact-decimal aggregates
  *    in ONE pass, averages as end-boundary double divisions
  *  - Q2: argmin join-back (min-per-group then equality join)
  *  - Q6: pure pushed-down-filter scalar aggregate, no join at all
  *  - Q8: market share — conditional share of a multi-dim join rollup
  *  - Q9: profit decomposition — arithmetic over two money columns
  *    through a 4-hop join
  *  - Q20: IN against a HAVING-filtered aggregate — semi join on the
  *    aggregated key set
  */
object TpchSuite3 {

  private def revenue = (dec2(col("l_extendedprice")) *
    (lit(1).cast(D2) - dec2(col("l_discount")))).cast(D4)

  private val revenueSql =
    """CAST(CAST(l_extendedprice AS DECIMAL(18,2))
       * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"""

  /** TPC-H Q1 shape: pricing summary — 8 aggregates over the whole fact
    * in one scan, grouped by the 6 (returnflag, linestatus) cells.
    * Averages are sum/count with the division at the DOUBLE boundary:
    * both engines divide identical exact-decimal sums by identical
    * counts — one IEEE op each, bit-reproducible; an in-decimal AVG
    * would hit the engines' differing quotient-scale rules.
    *
    * Scale shape: the canonical map-side-combined aggregation — 6
    * groups means partials reduce ~everything before the exchange;
    * the scan reads exactly the 7 needed columns. This is the query
    * whole-stage codegen exists for.
    */
  val q146 = EngineQuery(
    "q146_tpch_q1_pricing_summary",
    (s, dir) => {
      val t = Tables(s, dir)
      val disc  = revenue
      val charge = (disc * (lit(1).cast(D2) + dec2(col("l_tax")))).cast(D6)
      t.lineitem
        .filter(col("l_shipdate") <= lit("2001-06-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          toDouble(sum(dec2(col("l_quantity")))).as("sum_qty"),
          toDouble(sum(dec2(col("l_extendedprice")))).as("sum_base_price"),
          toDouble(sum(disc)).as("sum_disc_price"),
          toDouble(sum(charge)).as("sum_charge"),
          (toDouble(sum(dec2(col("l_quantity")))) / count(lit(1)))
            .as("avg_qty"),
          (toDouble(sum(dec2(col("l_extendedprice")))) / count(lit(1)))
            .as("avg_price"),
          (toDouble(sum(dec2(col("l_discount")))) / count(lit(1)))
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_base_price,
               CAST(SUM($revenueSql) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST($revenueSql
                 * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6)))
                 AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
             FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-06-01'
             GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus"""),
    bench = true)

  /** TPC-H Q2 shape: minimum-cost supplier — for each small part, the
    * ASIA-region supplier(s) with the MINIMUM account balance among
    * suppliers that ever shipped it (the fixture's stand-in for the
    * partsupp min-supplycost correlation). The correlated `= (SELECT
    * MIN ... WHERE same part)` decorrelates to a per-part min plus an
    * exact-decimal equality join-back — the argmin pattern.
    *
    * Scale shape: the candidate set reduces lineitem to DISTINCT
    * (part, supplier) pairs first (map-side combine), then everything
    * is dim-bounded: part/supplier/nation/region broadcast (the part
    * filter applied BEFORE the min — per-part argmin is unaffected by
    * dropping whole parts), and the per-part min is a window over one
    * partkey exchange. Ties (two suppliers at the same min balance)
    * are all reported — the documented Q2 semantics — so the pick is
    * a value comparison, not a row_number cut.
    */
  val q147 = EngineQuery(
    "q147_tpch_q2_min_cost_supplier",
    (s, dir) => {
      val t = Tables(s, dir)
      val pairs = t.lineitem
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      // Optimization r15 (guide §2.3/§2.4): (1) the p_size filter is a
      // broadcast join applied BEFORE the per-part min — the min is
      // per-part, so dropping whole parts early cannot change it, and
      // the argmin stage sees only qualifying parts' rows; (2) the
      // min itself is a window over ONE partkey exchange instead of an
      // aggregate joined back (agg exchange + join exchange). Tie
      // semantics unchanged: every supplier at the exact-decimal min
      // is reported. Oracle unchanged, hash-green.
      val cand = pairs
        .join(broadcast(t.part.filter(col("p_size") <= 5)),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          col("s_suppkey"), col("s_name"), col("n_name"),
          dec2(col("s_acctbal")).as("bal"))
      cand
        .withColumn("min_bal",
          min(col("bal")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("p_partkey"))))
        .filter(col("bal") === col("min_bal"))
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          col("s_suppkey"), col("s_name"), col("n_name"),
          toDouble(col("bal")).as("s_acctbal"))
        .orderBy(col("p_partkey"), col("s_suppkey"))
    },
    Some("""WITH pairs AS (
              SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
            cand AS (
              SELECT l_partkey AS partkey, s_suppkey, s_name, n_name,
                CAST(s_acctbal AS DECIMAL(18,2)) AS bal
              FROM pairs JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'),
            mins AS (
              SELECT partkey, MIN(bal) AS min_bal
              FROM cand GROUP BY partkey)
            SELECT p_partkey, p_brand, p_size, s_suppkey, s_name, n_name,
              CAST(bal AS DOUBLE) AS s_acctbal
            FROM cand JOIN mins USING (partkey)
            JOIN part ON partkey = p_partkey
            WHERE bal = min_bal AND p_size <= 5
            ORDER BY p_partkey, s_suppkey"""),
    bench = true)

  /** TPC-H Q6 shape: forecast revenue change — a no-join scalar
    * aggregate over a fully selective predicate. The determinism
    * discipline (exact-decimal comparisons) would by itself BLOCK
    * parquet pushdown of the band predicates — `cast(col) >= x` is
    * not a source filter — so the query also carries raw-double
    * SUPERSET prefilters (bounds widened past the decimal rounding
    * boundary: dec2 rounds half-up, so dec2(x) ∈ [0.05, 0.07] implies
    * x ∈ [0.045, 0.075)) that DO push to the scan, with the exact
    * decimal predicate refining the survivors. Scan-prunable AND
    * engine-exact — the pattern every decimal-disciplined filter in a
    * 100 TB deployment needs.
    */
  val q148 = EngineQuery(
    "q148_tpch_q6_forecast_revenue",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
          // pushdown-friendly superset bounds on the raw doubles
          col("l_discount") >= 0.0449999 && col("l_discount") <= 0.0750001 &&
          col("l_quantity") <= 23.9950001 &&
          // exact decimal semantics (the oracle's predicate)
          dec2(col("l_discount")).between(
            lit("0.05").cast(D2), lit("0.07").cast(D2)) &&
          dec2(col("l_quantity")) < lit(24).cast(D2))
        .agg(count(lit(1)).as("n_items"),
          toDouble(sum((dec2(col("l_extendedprice")) *
            dec2(col("l_discount"))).cast(D4))).as("revenue_delta"))
    },
    Some("""SELECT COUNT(*) AS n_items,
              CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue_delta
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1998-01-01'
              AND l_shipdate < TIMESTAMP '1999-01-01'
              AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
              AND CAST(l_quantity AS DECIMAL(18,2)) < 24"""),
    bench = true)

  /** TPC-H Q8 shape: national market share — NATION_3's fraction of
    * ASIA-customer order volume per year. The share is conditional-sum
    * over total-sum INSIDE one rollup (one pass), divided at the
    * double boundary.
    *
    * Scale shape: same broadcast-dim composition as Q5/Q7; the rollup
    * is |years| groups; no second pass for the denominator.
    */
  val q149 = EngineQuery(
    "q149_tpch_q8_market_share",
    (s, dir) => {
      val t = Tables(s, dir)
      val n1 = t.nation
        .select(col("n_nationkey").as("s_nkey"),
          col("n_name").as("supp_nation"))
      val n2 = t.nation
        .select(col("n_nationkey").as("c_nkey"),
          col("n_regionkey").as("c_rkey"))
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("c_rkey") === col("r_regionkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          (toDouble(sum(when(col("supp_nation") === "NATION_3", revenue)
            .otherwise(lit(0).cast(D4)))) / toDouble(sum(revenue)))
            .as("mkt_share"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_year"))
    },
    Some(s"""WITH vol AS (
               SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                 n1.n_name AS supp_nation, $revenueSql AS v
               FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
               JOIN supplier ON l_suppkey = s_suppkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation n1 ON s_nationkey = n1.n_nationkey
               JOIN nation n2 ON c_nationkey = n2.n_nationkey
               JOIN region ON n2.n_regionkey = r_regionkey
               WHERE r_name = 'ASIA')
             SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(v) AS DOUBLE) AS mkt_share,
               COUNT(*) AS n_items
             FROM vol GROUP BY o_year ORDER BY o_year"""),
    bench = true)

  /** TPC-H Q9 shape: product-type profit — revenue minus cost
    * (p_retailprice × quantity pricing the fixture's missing
    * ps_supplycost) per supplier nation and order year, over PROMO
    * parts. Exercises signed arithmetic between two money columns
    * carried exactly through a 4-hop join.
    *
    * Scale shape: part (filtered) and supplier/nation broadcast; the
    * fact⋈orders join is the one real shuffle; profit subtraction is
    * per-row exact D4 math inside codegen; rollup is |nations|·|years|
    * groups.
    */
  val q150 = EngineQuery(
    "q150_tpch_q9_product_profit",
    (s, dir) => {
      val t = Tables(s, dir)
      val cost = (dec2(col("p_retailprice")) *
        dec2(col("l_quantity"))).cast(D4)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.part.filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(toDouble(sum((revenue - cost).cast(D4))).as("profit"),
          count(lit(1)).as("n_items"))
        .orderBy(col("nation"), col("o_year"))
    },
    Some(s"""SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(SUM(CAST($revenueSql
                 - CAST(CAST(p_retailprice AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))
                 AS DECIMAL(18,4))) AS DOUBLE) AS profit,
               COUNT(*) AS n_items
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN part ON l_partkey = p_partkey
             JOIN nation ON s_nationkey = n_nationkey
             WHERE p_type = 'PROMO'
             GROUP BY n_name, o_year ORDER BY nation, o_year"""),
    bench = true)

  /** TPC-H Q20 shape: promotion-capable suppliers — suppliers whose
    * shipped volume of some single PROMO part in one year exceeds a
    * threshold (the fixture's stand-in for the availqty > ½·shipped
    * correlation). The `IN (SELECT ... GROUP BY ... HAVING)` becomes a
    * semi join against the HAVING-filtered aggregate's key set.
    *
    * Scale shape: the aggregate runs fact-side first and emits only
    * qualifying (supplier, part) groups, of which only the supplier
    * key survives; that rare set drives a broadcast semi join against
    * the supplier dim — the fact never joins the dim directly.
    */
  val q151 = EngineQuery(
    "q151_tpch_q20_promo_suppliers",
    (s, dir) => {
      val t = Tables(s, dir)
      val qualified = t.lineitem
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .join(broadcast(t.part.filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(dec2(col("l_quantity"))).as("qty"))
        .filter(col("qty") > lit(50).cast(D2))
        .select(col("l_suppkey"))
      t.supplier
        .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy(col("s_suppkey"))
    },
    Some("""SELECT s_suppkey, s_name, n_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE s_suppkey IN (
              SELECT l_suppkey
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_type = 'PROMO'
                AND l_shipdate >= TIMESTAMP '1998-01-01'
                AND l_shipdate < TIMESTAMP '1999-01-01'
              GROUP BY l_suppkey, l_partkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)
            ORDER BY s_suppkey"""),
    bench = true)

  val all: Seq[EngineQuery] =
    Seq(q146, q147, q148, q149, q150, q151)
}
