package graft.ops

import org.apache.spark.sql.functions._

import Det._

/** Composite analytical workloads shaped after the public TPC-H queries
  * Q3/Q5/Q10 (the schema subset the fixtures carry), exercising the
  * operators together the way a real report does: multi-way join paths
  * with mixed dim/fact sides, selective date straddles, decimal revenue
  * math, and top-k over an aggregate. These stress the planner's
  * composition — join order, broadcast choice, partial aggregation —
  * where the per-operator gate queries stress semantics.
  *
  * Scale shape shared by all three: every dim hop (customer at 0.1% of
  * lineitem, nation, region) broadcasts; the only shuffles are the
  * fact aggregations; top-k is TakeOrderedAndProject, never a global
  * sort. Revenue math follows the q06 decimal discipline (exact D2/D4
  * sums, double only at the boundary).
  */
object TpchSuite {

  private def revenue = (dec2(col("l_extendedprice")) *
    (lit(1).cast(D2) - dec2(col("l_discount")))).cast(D4)

  private val revenueSql =
    """CAST(CAST(l_extendedprice AS DECIMAL(18,2))
       * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"""

  /** TPC-H Q3 shape: shipping-priority report — unshipped BUILDING
    * orders placed before the cut whose lineitems shipped after it,
    * top 10 order keys by discounted revenue.
    */
  val q130 = EngineQuery(
    "q130_tpch_q3_shipping_priority",
    (s, dir) => {
      val t = Tables(s, dir)
      val cut = lit("1999-06-01").cast("timestamp")
      t.lineitem.filter(col("l_shipdate") > cut)
        .join(t.orders.filter(col("o_orderdate") < cut),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer.filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(toDouble(sum(revenue)).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM($revenueSql) AS DOUBLE) AS revenue
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             WHERE c_mktsegment = 'BUILDING'
               AND o_orderdate < TIMESTAMP '1999-06-01'
               AND l_shipdate > TIMESTAMP '1999-06-01'
             GROUP BY l_orderkey, o_orderdate, o_orderpriority
             ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
    bench = true)

  /** TPC-H Q5 shape: local-supplier volume — revenue from lineitems
    * where the supplier sits in the same nation as the customer,
    * rolled up per nation for one region and year.
    */
  val q131 = EngineQuery(
    "q131_tpch_q5_local_supplier",
    (s, dir) => {
      val t = Tables(s, dir)
      val lo = lit("1998-01-01").cast("timestamp")
      val hi = lit("1999-01-01").cast("timestamp")
      t.lineitem
        .join(t.orders.filter(col("o_orderdate") >= lo &&
          col("o_orderdate") < hi), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.supplier),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(toDouble(sum(revenue)).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some(s"""SELECT n_name,
               CAST(SUM($revenueSql) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN supplier ON l_suppkey = s_suppkey
               AND c_nationkey = s_nationkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             WHERE r_name = 'ASIA'
               AND o_orderdate >= TIMESTAMP '1998-01-01'
               AND o_orderdate < TIMESTAMP '1999-01-01'
             GROUP BY n_name ORDER BY revenue DESC, n_name"""),
    bench = true)

  /** TPC-H Q10 shape: returned-item losses — top 20 customers by
    * revenue on RETURNED lineitems for one quarter of orders, with
    * nation context.
    */
  val q132 = EngineQuery(
    "q132_tpch_q10_returned_items",
    (s, dir) => {
      val t = Tables(s, dir)
      val lo = lit("1998-01-01").cast("timestamp")
      val hi = lit("1998-04-01").cast("timestamp")
      t.lineitem.filter(col("l_returnflag") === "R")
        .join(t.orders.filter(col("o_orderdate") >= lo &&
          col("o_orderdate") < hi), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(toDouble(sum(revenue)).as("revenue"),
          count(lit(1)).as("n_returned"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name, n_name,
               CAST(SUM($revenueSql) AS DOUBLE) AS revenue,
               COUNT(*) AS n_returned
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             WHERE l_returnflag = 'R'
               AND o_orderdate >= TIMESTAMP '1998-01-01'
               AND o_orderdate < TIMESTAMP '1998-04-01'
             GROUP BY c_custkey, c_name, n_name
             ORDER BY revenue DESC, c_custkey LIMIT 20"""),
    bench = true)

  /** TPC-H Q18 shape: large-volume customers — orders whose total
    * quantity exceeds a threshold, with customer context, top 20 by
    * order value. Exercises aggregate-then-semi-join composition: the
    * HAVING aggregate runs fact-side first and only qualifying order
    * keys flow into the join path.
    *
    * Scale shape: the quantity rollup is one map-side-combined hash-agg
    * on l_orderkey; the qualifying-keys set (rare by construction)
    * broadcasts back against lineitem and orders, so the big side never
    * shuffles twice; top-k is TakeOrderedAndProject.
    */
  val q133 = EngineQuery(
    "q133_tpch_q18_large_orders",
    (s, dir) => {
      val t = Tables(s, dir)
      val big = t.lineitem.groupBy(col("l_orderkey"))
        .agg(sum(dec2(col("l_quantity"))).as("total_qty"))
        .filter(col("total_qty") > lit(95).cast(D2))
      t.orders
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), dec2(col("o_totalprice")).as("o_total"),
          col("total_qty"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), toDouble(col("o_total")).as("o_total"),
          toDouble(col("total_qty")).as("total_qty"))
        .orderBy(col("o_total").desc, col("o_orderkey"))
        .limit(20)
    },
    Some("""WITH big AS (
              SELECT l_orderkey,
                SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 95
            )
            SELECT c_custkey, c_name, o_orderkey, o_orderdate,
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_total,
              CAST(total_qty AS DOUBLE) AS total_qty
            FROM orders
            JOIN big ON o_orderkey = l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_total DESC, o_orderkey LIMIT 20"""),
    bench = true)

  /** TPC-H Q4 shape: order-priority checking — orders in one quarter
    * that have at least one "late" lineitem (shipped after the order
    * quarter ended), counted per priority. Exercises the EXISTS →
    * left-semi-join path over the fact table.
    *
    * Scale shape: the semi-join shuffles each side once on the order
    * key and keeps only key columns on the probe side; the final agg
    * is a 5-group rollup. No date-straddle subquery runs per row.
    */
  val q134 = EngineQuery(
    "q134_tpch_q4_priority_check",
    (s, dir) => {
      val t = Tables(s, dir)
      val lo = lit("1998-07-01").cast("timestamp")
      val hi = lit("1998-10-01").cast("timestamp")
      val late = t.lineitem.filter(col("l_shipdate") >= hi)
        .select(col("l_orderkey"))
      t.orders
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1998-07-01'
              AND o_orderdate < TIMESTAMP '1998-10-01'
              AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate >= TIMESTAMP '1998-10-01')
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    bench = true)

  /** TPC-H Q14 shape: promotion-revenue share — the fraction of one
    * quarter's discounted revenue earned by PROMO-type parts.
    * Exercises conditional aggregation over a fact⋈dim join: one CASE
    * inside the SUM, no second pass.
    *
    * Scale shape: part broadcasts (dim); lineitem scans once with the
    * date filter pushed down; the whole answer is one map-side-combined
    * aggregate — no GROUP BY shuffle at all (scalar agg). The share is
    * a ratio of two exact decimal sums, cast to double only at the end.
    */
  val q135 = EngineQuery(
    "q135_tpch_q14_promo_revenue",
    (s, dir) => {
      val t = Tables(s, dir)
      val lo = lit("1998-01-01").cast("timestamp")
      val hi = lit("1998-04-01").cast("timestamp")
      t.lineitem
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", revenue)
            .otherwise(lit(0).cast(D4))).as("promo"),
          sum(revenue).as("total"))
        .select(toDouble(col("promo")).as("promo_revenue"),
          toDouble(col("total")).as("total_revenue"),
          (toDouble(col("promo")) * lit(100.0) / toDouble(col("total")))
            .as("promo_share_pct"))
    },
    Some(s"""SELECT
               CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revenueSql
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 AS promo_revenue,
               CAST(SUM($revenueSql) AS DOUBLE) AS total_revenue,
               CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revenueSql
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 * 100.0
                 / CAST(SUM($revenueSql) AS DOUBLE) AS promo_share_pct
             FROM lineitem
             JOIN part ON l_partkey = p_partkey
             WHERE l_shipdate >= TIMESTAMP '1998-01-01'
               AND l_shipdate < TIMESTAMP '1998-04-01'"""),
    bench = true)

  /** TPC-H Q12 shape (adapted to the fixture's columns): late-shipment
    * share per order priority — lineitems shipped more than 90 days
    * after their order date, as a count and share of each priority
    * class. Exercises fact⋈fact join + conditional aggregation with an
    * interval predicate.
    *
    * Scale shape: one shuffle each side on the order key (or zero with
    * q88's bucketed layout); the conditional rollup is 5 groups with
    * map-side partials; interval comparison is a per-row predicate, no
    * date table.
    */
  val q136 = EngineQuery(
    "q136_tpch_q12_late_share",
    (s, dir) => {
      val t = Tables(s, dir)
      val late = col("l_shipdate") >=
        col("o_orderdate") + expr("INTERVAL 90 DAYS")
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(when(late, 1L).otherwise(0L)).as("n_late"))
        .select(col("o_orderpriority"), col("n_items"), col("n_late"),
          (col("n_late").cast("double") / col("n_items").cast("double"))
            .as("late_share"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_items,
              CAST(SUM(CASE WHEN l_shipdate >= o_orderdate
                              + INTERVAL 90 DAY THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late,
              CAST(SUM(CASE WHEN l_shipdate >= o_orderdate
                              + INTERVAL 90 DAY THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS late_share
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    bench = true)

  /** TPC-H Q19 shape: disjunctive discounted revenue — an OR of three
    * (brand, size-range, quantity-range) conjunctions across the
    * lineitem⋈part join. Exercises predicate handling Catalyst can't
    * fully push (the disjunction straddles both sides): the dim-only
    * parts of the OR prune part rows before the join, the fact-only
    * parts evaluate post-join, and the join itself stays a broadcast
    * hash join — never a filter-as-join-condition nested loop.
    */
  val q137 = EngineQuery(
    "q137_tpch_q19_disjunctive",
    (s, dir) => {
      val t = Tables(s, dir)
      def qty(lo: Int, hi: Int) =
        dec2(col("l_quantity")).between(lit(lo).cast(D2), lit(hi).cast(D2))
      val cond =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          qty(1, 20)) ||
        (col("p_brand") === "Brand#7" && col("p_size").between(1, 25) &&
          qty(10, 35)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 40) &&
          qty(20, 50))
      t.lineitem
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .filter(cond)
        .agg(count(lit(1)).as("n_items"),
          toDouble(sum(revenue)).as("revenue"))
    },
    Some(s"""SELECT COUNT(*) AS n_items,
               CAST(SUM($revenueSql) AS DOUBLE) AS revenue
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                    AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 1 AND 20)
                OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 25
                    AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 10 AND 35)
                OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 40
                    AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 20 AND 50)"""),
    bench = true)

  val all: Seq[EngineQuery] =
    Seq(q130, q131, q132, q133, q134, q135, q136, q137)
}
