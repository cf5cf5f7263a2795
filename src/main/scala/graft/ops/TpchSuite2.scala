package graft.ops

import org.apache.spark.sql.functions._

import Det._

/** Second TPC-H-shaped composite set: the SUBQUERY-heavy public shapes
  * (Q7/Q11/Q13/Q15/Q16/Q17/Q21/Q22) the first suite (TpchSuite, joins +
  * conditional rollups) does not cover. Each exercises a decorrelation
  * pattern the reference's SQL surface implies (sql_generator.py emits
  * free-form SELECTs; PostgreSQL decorrelates them) re-expressed as the
  * explicit aggregate-then-join plan Catalyst would have to derive:
  *
  *  - correlated scalar AVG per group        → pre-agg + broadcast join
  *  - scalar MAX over an aggregated view     → scalar agg + broadcast
  *  - scalar subquery in HAVING (share of Σ) → scalar agg + broadcast
  *  - NOT IN (subquery)                      → null-aware anti join
  *  - EXISTS / NOT EXISTS double correlation → semi join + anti join
  *  - COUNT distribution over an outer join  → two-level aggregation
  *
  * Determinism discipline is the suite-wide one (Det): comparisons
  * against an average avoid decimal DIVISION entirely (engines disagree
  * on quotient scale) by cross-multiplying — `x * cnt > sum` IS
  * `x > sum/cnt` in exact arithmetic; money sums are exact decimals,
  * doubles only at the output boundary.
  *
  * The fixture has no partsupp/l_receiptdate/c_phone columns
  * (TESTDATA.md), so Q11/Q16 block on the lineitem (part,supp) pairs
  * and Q21/Q22 correlate on shipdate lateness / recent-order absence —
  * same plan shapes, fixture-expressible semantics.
  */
object TpchSuite2 {

  private def revenue = (dec2(col("l_extendedprice")) *
    (lit(1).cast(D2) - dec2(col("l_discount")))).cast(D4)

  private val revenueSql =
    """CAST(CAST(l_extendedprice AS DECIMAL(18,2))
       * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"""

  /** TPC-H Q17 shape: small-quantity-order revenue — lineitems of one
    * brand whose quantity is below 20% of that part's average quantity.
    * The correlated scalar subquery (`AVG(l_quantity) WHERE l_partkey =
    * outer.l_partkey`) decorrelates to a per-part aggregate joined back
    * to the fact — computed ONCE for all parts, not once per row.
    *
    * Scale shape: the per-part (sum, count) rollup is one map-side-
    * combined hash-agg on l_partkey; its output is |parts| rows, which
    * broadcasts back against the brand-filtered fact side. The 0.2×avg
    * comparison cross-multiplies (5·qty·cnt < Σqty) so both engines
    * compare exact decimals — no quotient scale to disagree on.
    */
  val q138 = EngineQuery(
    "q138_tpch_q17_small_qty",
    (s, dir) => {
      val t = Tables(s, dir)
      val perPart = t.lineitem.groupBy(col("l_partkey"))
        .agg(sum(dec2(col("l_quantity"))).as("sum_qty"),
          count(lit(1)).as("cnt"))
      t.lineitem
        .join(broadcast(t.part.filter(col("p_brand") === "Brand#3")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(perPart), Seq("l_partkey"))
        .filter(dec2(col("l_quantity")) * lit(5) * col("cnt") <
          col("sum_qty"))
        .agg(count(lit(1)).as("n_items"),
          (toDouble(sum(dec2(col("l_extendedprice")))) / lit(7.0))
            .as("avg_yearly"))
    },
    Some("""WITH agg AS (
              SELECT l_partkey,
                SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                COUNT(*) AS cnt
              FROM lineitem GROUP BY l_partkey)
            SELECT COUNT(*) AS n_items,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS avg_yearly
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN agg USING (l_partkey)
            WHERE p_brand = 'Brand#3'
              AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty"""),
    bench = true)

  /** TPC-H Q13 shape: customer order-count distribution — how many
    * customers placed k non-urgent orders, INCLUDING k = 0 (the outer
    * join is the point: an inner join silently erases the zero bucket).
    *
    * Scale shape: two aggregations — the first shuffles on c_custkey
    * (|customers| groups), the second on c_count (≤ max orders per
    * customer groups, i.e. tiny). The join-condition filter
    * (priority <> urgent) lives IN the outer join, not after it —
    * filtering after a left join would turn unmatched rows into
    * dropped rows, not zero-count rows.
    */
  val q139 = EngineQuery(
    "q139_tpch_q13_cust_distribution",
    (s, dir) => {
      val t = Tables(s, dir)
      val perCust = t.customer.join(t.orders,
          col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""WITH c_orders AS (
              SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
                AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey)
            SELECT c_count, COUNT(*) AS custdist
            FROM c_orders GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC"""),
    bench = true)

  /** TPC-H Q15 shape: top supplier — the supplier(s) whose one-quarter
    * revenue equals the maximum over all suppliers. The scalar subquery
    * (`= (SELECT MAX(...))`) becomes a 1-row scalar aggregate cross-
    * joined (broadcast) against the per-supplier rollup; exact decimal
    * revenue makes the equality safe — the double round-trip that makes
    * `WHERE x = MAX` notorious never happens.
    *
    * Scale shape: one hash-agg on l_suppkey (|suppliers| rows out),
    * the max is a scalar agg over that small output, and the equality
    * filter is a broadcast nested-loop over ONE row. The supplier dim
    * joins broadcast. Nothing scales with |lineitem| except the first
    * pushed-down scan.
    */
  val q140 = EngineQuery(
    "q140_tpch_q15_top_supplier",
    (s, dir) => {
      val t = Tables(s, dir)
      val lo = lit("1998-01-01").cast("timestamp")
      val hi = lit("1998-04-01").cast("timestamp")
      val rev = t.lineitem
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .groupBy(col("l_suppkey"))
        .agg(sum(revenue).as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("max_rev"))
      rev.join(broadcast(mx), col("total_rev") === col("max_rev"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          toDouble(col("total_rev")).as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    Some(s"""WITH rev AS (
               SELECT l_suppkey, SUM($revenueSql) AS total_rev
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                 AND l_shipdate < TIMESTAMP '1998-04-01'
               GROUP BY l_suppkey)
             SELECT s_suppkey, s_name,
               CAST(total_rev AS DOUBLE) AS total_revenue
             FROM supplier JOIN rev ON s_suppkey = l_suppkey
             WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
             ORDER BY s_suppkey"""),
    bench = true)

  /** TPC-H Q22 shape: dormant high-balance customers — customers whose
    * balance beats the positive-balance average and who placed no
    * RECENT order (the fixture has no phone column; "recent absence"
    * replaces the country-code IN-list, keeping both correlations: a
    * scalar AVG subquery and a NOT EXISTS anti join).
    *
    * Scale shape: the average is a (count, sum) scalar agg broadcast to
    * every row (cross-multiplied comparison — no division); the NOT
    * EXISTS is a left-anti join against the date-filtered orders
    * projection, one shuffle on custkey. Final rollup is |nations|
    * groups.
    */
  val q141 = EngineQuery(
    "q141_tpch_q22_dormant_rich",
    (s, dir) => {
      val t = Tables(s, dir)
      val pos = t.customer.filter(col("c_acctbal") > 0.0)
        .agg(count(lit(1)).as("cnt"),
          sum(dec2(col("c_acctbal"))).as("total"))
      val recent = t.orders
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      t.customer
        .join(broadcast(pos))
        .filter(dec2(col("c_acctbal")) * col("cnt") > col("total"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          toDouble(sum(dec2(col("c_acctbal")))).as("total_bal"))
        .orderBy(col("c_nationkey"))
    },
    Some("""WITH pos AS (
              SELECT COUNT(*) AS cnt,
                SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total
              FROM customer WHERE c_acctbal > 0.0)
            SELECT c_nationkey, COUNT(*) AS n_cust,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                AS total_bal
            FROM customer, pos
            WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > total
              AND NOT EXISTS (
                SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2001-01-01')
            GROUP BY c_nationkey ORDER BY c_nationkey"""),
    bench = true)

  /** TPC-H Q11 shape: important parts — parts carrying more than 1.5×
    * the AVERAGE part's discounted lineitem value (the fixture has no
    * partsupp; lineitem value plays supplycost·availqty). The HAVING's
    * scalar subquery (`> fraction × SUM over everything`) is the
    * per-group rollup cross-joined with its own re-aggregated total —
    * the total is derived FROM the group rollup (one fact scan, not
    * two). The threshold is SCALE-FREE (relative to the average, like
    * TPC-H's own `0.0001 / SF` scaling): a fixed share-of-total would
    * stop binding as |parts| grows — degenerate at 10× the fixture.
    *
    * Scale shape: one hash-agg on l_partkey; the grand (total, count)
    * re-aggregates those |parts| rows (no second lineitem pass); the
    * share test broadcasts one row. Cross-multiplied (2·value·cnt >
    * 3·total ⇔ value > 1.5·avg) — exact decimals, no division.
    */
  val q142 = EngineQuery(
    "q142_tpch_q11_important_parts",
    (s, dir) => {
      val t = Tables(s, dir)
      val perPart = t.lineitem.groupBy(col("l_partkey"))
        .agg(sum(revenue).as("value"))
      val total = perPart
        .agg(sum(col("value")).as("total"), count(lit(1)).as("cnt"))
      perPart.join(broadcast(total))
        .filter(col("value") * lit(2) * col("cnt") >
          col("total") * lit(3))
        .select(col("l_partkey"), toDouble(col("value")).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },
    Some(s"""WITH pv AS (
               SELECT l_partkey, SUM($revenueSql) AS value
               FROM lineitem GROUP BY l_partkey),
             tot AS (SELECT SUM(value) AS total, COUNT(*) AS cnt FROM pv)
             SELECT l_partkey, CAST(value AS DOUBLE) AS value
             FROM pv, tot WHERE value * 2 * cnt > total * 3
             ORDER BY value DESC, l_partkey"""),
    bench = true)

  /** TPC-H Q7 shape: volume shipping between two nations — revenue per
    * (supplier nation, customer nation, ship year) where the two
    * nations are a designated unordered pair. The disjunctive pair
    * predicate spans two dimension hops on opposite sides of the fact.
    *
    * Scale shape: both nation hops broadcast (they are |nations| rows);
    * customer and supplier broadcast; the only shuffle is the final
    * (nation, nation, year) rollup — 2·|years| groups. The pair
    * disjunction cannot push below the joins (it straddles both), but
    * each nation's half (`n_name IN (A,B)`) does — asserted in
    * ExplainAudit.
    */
  val q143 = EngineQuery(
    "q143_tpch_q7_nation_volume",
    (s, dir) => {
      val t = Tables(s, dir)
      val names = Seq("NATION_1", "NATION_2")
      val n1 = t.nation.filter(col("n_name").isin(names: _*))
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = t.nation.filter(col("n_name").isin(names: _*))
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(count(lit(1)).as("n_items"),
          toDouble(sum(revenue)).as("volume"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               COUNT(*) AS n_items,
               CAST(SUM($revenueSql) AS DOUBLE) AS volume
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
             WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
             GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),
    bench = true)

  /** TPC-H Q16 shape: supplier diversity per part signature — distinct
    * suppliers per (brand, type, size) over the lineitem (part, supp)
    * pairs, EXCLUDING a supplier set via `NOT IN (subquery)`. Expressed
    * through spark.sql because NOT IN is the point: its three-valued
    * semantics differ from `left_anti` whenever either side can be
    * NULL, and Catalyst must choose — a null-aware anti join (condition
    * `key = k OR isnull(key = k)`, broadcast-only by construction) when
    * nullability demands it, or a plain anti equi-join when it can
    * PROVE both key sides non-null. On this fixture's required columns
    * it proves it: the plan is a plain broadcast LeftAnti with no
    * residual condition — the cheap variant, chosen not assumed.
    *
    * Scale shape: the excluded-supplier subquery is a dim scan that
    * broadcasts; part broadcasts into the fact scan; the distinct
    * count shuffles once on the (brand, type, size) signature.
    */
  val q144 = EngineQuery(
    "q144_tpch_q16_supplier_diversity",
    (s, dir) => {
      Tables(s, dir).registerAll()
      s.sql("""
        SELECT p_brand, p_type, p_size,
          COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
    },
    Some("""SELECT p_brand, p_type, p_size,
              COUNT(DISTINCT l_suppkey) AS supplier_cnt
            FROM part JOIN lineitem ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#1'
              AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
              AND l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""),
    bench = true)

  /** TPC-H Q21 shape: suppliers who kept orders waiting — for finished
    * orders, suppliers with a LATE lineitem (shipped > 60 days after
    * the order date; the fixture has no receipt/commit dates) on a
    * multi-supplier order where NO OTHER supplier was late. The double
    * correlation (EXISTS another supplier, NOT EXISTS another late
    * supplier) becomes a semi join plus an anti join over the same
    * keyed pair sets — each correlation evaluated once as a set
    * operation, never per row.
    *
    * Scale shape: the late-pair and all-pair projections reduce the
    * fact to distinct (order, supplier) pairs FIRST (map-side-combined
    * distinct), so the semi/anti joins move pair sets, not lineitems;
    * all three shuffles key on l_orderkey and AQE coalesces them; the
    * supplier name join broadcasts; top-k is TakeOrderedAndProject.
    */
  val q145 = EngineQuery(
    "q145_tpch_q21_waiting_supplier",
    (s, dir) => {
      val t = Tables(s, dir)
      val fOrders = t.orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val late = t.lineitem
        .join(fOrders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey").as("orderkey"),
          col("l_suppkey").as("suppkey"))
        .distinct()
      val pairs = t.lineitem
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      // Optimization r15 (guide §2.3, aggregate before you shuffle):
      // the two correlations reduce to per-ORDER counts over the
      // already-distinct pair sets. late ⊆ pairs, so
      //   EXISTS other supplier        ⇔ n_supp(order) ≥ 2
      //   NOT EXISTS other late suppl. ⇔ n_late(order) = 1
      // — the semi/anti joins against PAIR-cardinality sets (with
      // non-equi residual conditions) become two semi joins against
      // ORDER-cardinality aggregates: strictly fewer shuffled bytes
      // at any scale, same rows out (oracle unchanged, hash-green).
      val lateCnt = late.groupBy(col("orderkey"))
        .agg(count(lit(1)).as("n_late"))
      val nSupp = pairs.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"))
      late
        .join(nSupp.filter(col("n_supp") >= 2)
          .select(col("l_orderkey").as("orderkey")), Seq("orderkey"),
          "left_semi")
        .join(lateCnt.filter(col("n_late") === 1)
          .select(col("orderkey")), Seq("orderkey"), "left_semi")
        .join(broadcast(Tables(s, dir).supplier),
          col("suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(25)
    },
    Some("""WITH f AS (
              SELECT o_orderkey, o_orderdate FROM orders
              WHERE o_orderstatus = 'F'),
            late AS (
              SELECT DISTINCT l_orderkey AS orderkey,
                l_suppkey AS suppkey
              FROM lineitem JOIN f ON l_orderkey = o_orderkey
              WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
            pairs AS (
              SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
            SELECT s_name, COUNT(*) AS numwait
            FROM late w JOIN supplier ON w.suppkey = s_suppkey
            WHERE EXISTS (SELECT 1 FROM pairs p
                          WHERE p.l_orderkey = w.orderkey
                            AND p.l_suppkey <> w.suppkey)
              AND NOT EXISTS (SELECT 1 FROM late x
                              WHERE x.orderkey = w.orderkey
                                AND x.suppkey <> w.suppkey)
            GROUP BY s_name
            ORDER BY numwait DESC, s_name LIMIT 25"""),
    bench = true)

  val all: Seq[EngineQuery] =
    Seq(q138, q139, q140, q141, q142, q143, q144, q145)
}
