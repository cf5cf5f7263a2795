package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import Det._

/** Core relational operator surface (SURVEY.md §2.1-§2.7).
  *
  * Each query is the Spark-first expression of one operator row from the
  * survey inventory: declarative DataFrame plans so Catalyst gets
  * pushdown/pruning/join-selection; dimension tables explicitly
  * `broadcast()` so the 100 TB fact side never shuffles for a small join.
  * Evidence citations are to /root/reference (see SURVEY.md).
  */
object Relational {

  /** Scan + projection (reference demo planner projects a column subset,
    * sql_generator.py:274-279). Column pruning must reach the parquet scan.
    */
  val q01 = EngineQuery(
    "q01_scan_project",
    (s, dir) => {
      val t = Tables(s, dir)
      // (l_orderkey, l_linenumber) is NOT unique in this synthetic data;
      // the ORDER BY must cover every output column so any remaining
      // ties are identical rows (deterministic either way)
      t.lineitem
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice"""),
    bench = true)

  /** Predicate surface: =, !=, <, BETWEEN, IN, LIKE, AND/OR/NOT
    * (SURVEY.md §2.2; granted by sql_generator.py:37). All predicates are
    * Catalyst built-ins and push down to the parquet scan.
    */
  val q02 = EngineQuery(
    "q02_filter_predicates",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .filter(col("o_orderstatus").isin("F", "P")
          && col("o_totalprice").between(1000.0, 200000.0)
          && (col("o_orderpriority").like("3%") || col("o_orderpriority").like("1%"))
          && !(col("o_custkey") < 10)
          && col("o_orderdate").isNotNull)
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT * FROM orders
            WHERE o_orderstatus IN ('F','P')
              AND o_totalprice BETWEEN 1000.0 AND 200000.0
              AND (o_orderpriority LIKE '3%' OR o_orderpriority LIKE '1%')
              AND NOT (o_custkey < 10)
              AND o_orderdate IS NOT NULL
            ORDER BY o_orderkey"""))

  /** Auto-LIMIT injection — the reference's one genuine rewrite
    * (db_connector.py:218-222): SELECT without LIMIT gets the default cap
    * appended. Ours is plan-level (CollectLimitExec), not a substring hack.
    */
  val q03 = EngineQuery(
    "q03_limit_inject",
    (s, dir) => {
      val t = Tables(s, dir)
      val q = t.orders.orderBy(col("o_orderkey"))
      graft.compile.ResultLimiter(q, 10)
    },
    Some("SELECT * FROM orders ORDER BY o_orderkey LIMIT 10"))

  /** Top-k: "5 most recent orders" (sample question, sql_generator.py:211)
    * → TakeOrderedAndProject, never a global sort.
    */
  val q04 = EngineQuery(
    "q04_topk_recent",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
        .limit(5)
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
            FROM orders ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 5"""))

  /** Global multi-key sort (range-partitioned exchange at scale). */
  val q05 = EngineQuery(
    "q05_sort_multi",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer.orderBy(col("c_mktsegment").asc, col("c_acctbal").desc,
        col("c_custkey").asc)
    },
    Some("""SELECT * FROM customer
            ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC"""))

  /** Grouped aggregation (TPC-H Q1 shape): SUM/AVG/COUNT over money
    * columns (SURVEY.md §2.4). Partial (map-side) aggregation is free from
    * Catalyst; exact decimal arithmetic keeps the hash-compare stable.
    */
  val q06 = EngineQuery(
    "q06_agg_group",
    (s, dir) => {
      val t = Tables(s, dir)
      val discPrice =
        (dec2(col("l_extendedprice")) * (lit(1).cast(D2) - dec2(col("l_discount"))))
          .cast(D4)
      val charge = (discPrice * (lit(1).cast(D2) + dec2(col("l_tax")))).cast(D6)
      t.lineitem
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          toDouble(sum(dec2(col("l_quantity")))).as("sum_qty"),
          toDouble(sum(dec2(col("l_extendedprice")))).as("sum_base_price"),
          toDouble(sum(discPrice)).as("sum_disc_price"),
          toDouble(sum(charge)).as("sum_charge"),
          (toDouble(sum(dec2(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
              COUNT(*) AS n_rows
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""),
    bench = true)

  /** GROUP BY + HAVING (SURVEY.md §2.4). */
  val q07 = EngineQuery(
    "q07_agg_having",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          toDouble(sum(dec2(col("o_totalprice")))).as("total_spent"))
        .filter(col("n_orders") >= 3)
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
            FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
            ORDER BY o_custkey"""))

  /** COUNT(DISTINCT) — exact (SURVEY.md §2.4). The approximate HLL variant
    * is a separate rows-only query (scale path).
    */
  val q08 = EngineQuery(
    "q08_count_distinct",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
              COUNT(DISTINCT l_orderkey) AS n_orders,
              COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** approx_count_distinct (HLL++) — the 100 TB-scale twin of q08: one
    * pass, fixed memory, no per-key exact state. HLL estimates differ
    * across engines by design → rows-only check (no oracle).
    */
  val q08b = EngineQuery(
    "q08b_approx_count_distinct",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
        .orderBy(col("l_returnflag"))
    },
    None)

  /** ROLLUP (SURVEY.md §2.4 GROUPING SETS family). */
  val q09 = EngineQuery(
    "q09_rollup",
    (s, dir) => {
      val t = Tables(s, dir)
      val joined = t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      joined
        .rollup(col("r_name"), col("n_name"))
        .agg(grouping(col("r_name")).cast(IntegerType).as("g_region"),
          grouping(col("n_name")).cast(IntegerType).as("g_nation"),
          count(lit(1)).as("n_customers"),
          toDouble(sum(dec2(col("c_acctbal")))).as("sum_acctbal"))
        .select(col("g_region"), col("g_nation"),
          col("r_name"), col("n_name"), col("n_customers"), col("sum_acctbal"))
        .orderBy(col("g_region"), col("g_nation"),
          col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },
    Some("""SELECT CAST(GROUPING(r_name) AS INT) AS g_region,
              CAST(GROUPING(n_name) AS INT) AS g_nation,
              r_name, n_name, COUNT(*) AS n_customers,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
            ORDER BY g_region, g_nation, r_name NULLS FIRST, n_name NULLS FIRST"""))

  /** CUBE (SURVEY.md §2.4). */
  val q10 = EngineQuery(
    "q10_cube",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).cast(IntegerType).as("g_status"),
          grouping(col("o_orderpriority")).cast(IntegerType).as("g_prio"),
          count(lit(1)).as("n_orders"),
          toDouble(sum(dec2(col("o_totalprice")))).as("sum_price"))
        .select(col("g_status"), col("g_prio"),
          col("o_orderstatus"), col("o_orderpriority"), col("n_orders"),
          col("sum_price"))
        .orderBy(col("g_status"), col("g_prio"),
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },
    Some("""SELECT CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
              CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
              o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
            ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
              o_orderpriority NULLS FIRST"""))

  /** Multi-way FK join along the join graph (SURVEY.md §2.3): fact table
    * joined through customer→nation→region. The dims are broadcast — at
    * 100 TB the orders side never moves for these joins.
    */
  val q11 = EngineQuery(
    "q11_join_inner",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          toDouble(sum(dec2(col("o_totalprice")))).as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name, COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name ORDER BY r_name, n_name"""),
    bench = true)

  /** Left outer join preserving unmatched rows (SURVEY.md §2.3). */
  val q12 = EngineQuery(
    "q12_join_left",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey ORDER BY c_custkey"""))

  /** Left-semi join = EXISTS (SURVEY.md §2.3). */
  val q13 = EngineQuery(
    "q13_join_semi",
    (s, dir) => {
      val t = Tables(s, dir)
      val bigOrders = t.orders.filter(col("o_totalprice") > 300000.0)
      t.customer
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT * FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
            ORDER BY c_custkey"""))

  /** Left-anti join = NOT EXISTS (SURVEY.md §2.3). */
  val q14 = EngineQuery(
    "q14_join_anti",
    (s, dir) => {
      val t = Tables(s, dir)
      val bigOrders = t.orders.filter(col("o_totalprice") > 400000.0)
      t.customer
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT * FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
            ORDER BY c_custkey"""))

  /** Self-join (reference schemas have self-FKs: categories.parent_id,
    * employees.manager_id — sample_metadata.py:41, 99). Here: nation pairs
    * within a region.
    */
  val q15 = EngineQuery(
    "q15_self_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val a = t.nation.select(col("n_nationkey").as("a_key"),
        col("n_name").as("a_name"), col("n_regionkey").as("a_region"))
      val b = t.nation.select(col("n_nationkey").as("b_key"),
        col("n_name").as("b_name"), col("n_regionkey").as("b_region"))
      a.join(b, col("a_region") === col("b_region") && col("a_key") < col("b_key"))
        .select(col("a_region").as("regionkey"), col("a_name"), col("b_name"))
        .orderBy(col("regionkey"), col("a_name"), col("b_name"))
    },
    Some("""SELECT a.n_regionkey AS regionkey, a.n_name AS a_name,
              b.n_name AS b_name
            FROM nation a JOIN nation b
              ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
            ORDER BY regionkey, a_name, b_name"""))

  /** Cross join (SURVEY.md §2.3) — only ever dim × dim. */
  val q16 = EngineQuery(
    "q16_cross_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val segs = t.customer.select(col("c_mktsegment")).distinct()
      t.region.crossJoin(segs)
        .select(col("r_name"), col("c_mktsegment"))
        .orderBy(col("r_name"), col("c_mktsegment"))
    },
    Some("""SELECT r_name, c_mktsegment
            FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer)
            ORDER BY r_name, c_mktsegment"""))

  /** Theta (non-equi) join (SURVEY.md §2.3) — kept dim × dim; at scale a
    * non-equi join must never touch the fact table unbucketed.
    */
  val q17 = EngineQuery(
    "q17_theta_join",
    (s, dir) => {
      val t = Tables(s, dir)
      t.supplier
        .join(t.part, col("p_retailprice") < col("s_acctbal"))
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_cheaper_parts"),
          toDouble(sum(dec2(col("p_retailprice")))).as("sum_price"))
        .orderBy(col("s_suppkey"))
    },
    Some("""SELECT s_suppkey, COUNT(*) AS n_cheaper_parts,
              CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
            FROM supplier JOIN part ON p_retailprice < s_acctbal
            GROUP BY s_suppkey ORDER BY s_suppkey"""))

  /** UNION ALL (SURVEY.md §2.7). */
  val q18 = EngineQuery(
    "q18_union_all",
    (s, dir) => {
      val t = Tables(s, dir)
      val c = t.customer.select(col("c_custkey").as("id"),
        lit("customer").as("kind"))
      val u = t.supplier.select(col("s_suppkey").as("id"),
        lit("supplier").as("kind"))
      c.union(u).orderBy(col("kind"), col("id"))
    },
    Some("""SELECT c_custkey AS id, 'customer' AS kind FROM customer
            UNION ALL
            SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier
            ORDER BY kind, id"""))

  /** INTERSECT (distinct semantics on both engines, SURVEY.md §2.7). */
  val q19 = EngineQuery(
    "q19_intersect",
    (s, dir) => {
      val t = Tables(s, dir)
      val cn = t.customer.select(col("c_nationkey").cast("int").as("nationkey"))
      val sn = t.supplier.select(col("s_nationkey").cast("int").as("nationkey"))
      cn.intersect(sn).orderBy(col("nationkey"))
    },
    Some("""SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
            INTERSECT
            SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
            ORDER BY nationkey"""))

  /** EXCEPT (distinct semantics on both engines, SURVEY.md §2.7). */
  val q20 = EngineQuery(
    "q20_except",
    (s, dir) => {
      val t = Tables(s, dir)
      val allCust = t.orders.select(col("o_custkey").as("custkey"))
      val fCust = t.orders.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      allCust.except(fCust).orderBy(col("custkey"))
    },
    Some("""SELECT o_custkey AS custkey FROM orders
            EXCEPT
            SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
            ORDER BY custkey"""))

  val all: Seq[EngineQuery] = Seq(q01, q02, q03, q04, q05, q06, q07, q08,
    q08b, q09, q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q20)
}
