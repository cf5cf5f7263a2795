package graft.ops

import org.apache.spark.sql.functions._

import graft.compile.{DemoPlanner, SpecCompiler}
import graft.etl.EtlRunner
import graft.model._
import Det._

/** Driver-gate queries that exercise the engine's own machinery — the
  * spec compiler, mandatory-filter injection, demo planner, and ETL
  * runner — end-to-end through the same DuckDB oracle as plain operators.
  */
object PipelineQueries {

  /** Fixture catalog for the parquet tables, with an engine-level
    * mandatory filter on orders — the analog of the reference's
    * soft-delete constraint ("is_deleted = false",
    * sample_metadata.py:76-80) over this schema.
    */
  def parquetCatalog: CatalogModel = CatalogModel(
    dbType = "parquet",
    tables = Seq(
      TableModel("orders", "customer orders", Seq(
        ColumnModel("o_orderkey", "BIGINT", primaryKey = true),
        ColumnModel("o_custkey", "BIGINT",
          foreignKey = Some("customer.c_custkey")),
        ColumnModel("o_orderstatus", "VARCHAR(1)"),
        ColumnModel("o_totalprice", "DOUBLE"),
        ColumnModel("o_orderdate", "TIMESTAMP"),
        ColumnModel("o_orderpriority", "VARCHAR(20)"))),
      TableModel("customer", "customers", Seq(
        ColumnModel("c_custkey", "BIGINT", primaryKey = true),
        ColumnModel("c_name", "VARCHAR(25)"),
        ColumnModel("c_nationkey", "INTEGER",
          foreignKey = Some("nation.n_nationkey")),
        ColumnModel("c_acctbal", "DOUBLE"),
        ColumnModel("c_mktsegment", "VARCHAR(10)")))),
    relationships = Seq(
      Relationship("orders", "o_custkey", "customer", "c_custkey"),
      Relationship("customer", "c_nationkey", "nation", "n_nationkey")),
    constraints = Constraints(
      softDeleteRule = Some("o_orderstatus != 'F'"),
      validStatusValues = Map("o_orderstatus" -> Seq("F", "O", "P")),
      mandatoryFilters = Seq("o_orderstatus != 'F'")))

  /** Demo-planner golden path through the driver gate: plan "orders"
    * preview → compile → execute. Observable contract of the reference
    * demo mode (sql_generator.py:274-281): first-5-column projection,
    * catalog mandatory filter, LIMIT 10.
    */
  val q81 = EngineQuery(
    "q81_demo_planner",
    (s, dir) => {
      val catalog = parquetCatalog
      val compiler = SpecCompiler.forParquetDir(s, dir, catalog)
      val spec = DemoPlanner.toSpec(catalog.table("orders").get, catalog)
      compiler.compile(spec)
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
              o_orderdate
            FROM orders WHERE o_orderstatus != 'F'
            ORDER BY o_orderkey LIMIT 10"""))

  /** SpecCompiler breadth: join + group + having + sort through the
    * declarative QuerySpec IR (mandatory filter injected on the orders
    * scan by the compiler, not written in the spec).
    */
  val q82 = EngineQuery(
    "q82_spec_compiler_join",
    (s, dir) => {
      val compiler = SpecCompiler.forParquetDir(s, dir, parquetCatalog)
      compiler.compile(QuerySpec(
        table = "orders",
        joins = Seq(JoinSpec("customer", "o_custkey = c_custkey")),
        groupBy = Seq("c_mktsegment"),
        aggregates = Seq(
          AggSpec("count(1)", "n_orders"),
          AggSpec(
            "cast(sum(cast(o_totalprice as decimal(18,2))) as double)",
            "revenue")),
        having = Some("n_orders > 10"),
        orderBy = Seq(OrderSpec("c_mktsegment"))))
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_orderstatus != 'F'
            GROUP BY c_mktsegment HAVING COUNT(*) > 10
            ORDER BY c_mktsegment"""))

  /** ETL pipeline through the driver gate: extract orders → null-default
    * priority → standardize the order date → validate/derive → overwrite-
    * load → re-read the sink. Mirrors the reference demo pipeline's steps
    * (sql_generator.py:296-311).
    */
  val q80 = EngineQuery(
    "q80_etl_pipeline",
    (s, dir) => {
      // unique per invocation: a fixed path would let two concurrent
      // runs (e.g. Verify + Bench) overwrite each other's sink mid-read
      val warehouse = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_warehouse_${java.util.UUID.randomUUID().toString.take(8)}"
      val runner = new EtlRunner(s,
        name => Tables(s, dir).table(name), warehouse)
      val spec = EtlSpec(
        extract = ExtractSpec(Seq("orders"),
          conditions = Seq("o_orderdate IS NOT NULL")),
        transform = Seq(
          TransformStep.NullDefault(Map("o_orderpriority" -> "'UNKNOWN'")),
          TransformStep.DateStandardize("o_orderdate", "yyyy-MM-dd"),
          TransformStep.TypeValidate("o_totalprice", "double"),
          TransformStep.Derive("net_price",
            "cast(cast(o_totalprice as decimal(18,2)) * 0.9 as double)"),
          TransformStep.FilterRows("o_totalprice > 0")),
        load = LoadSpec("processed_orders", "overwrite"))
      runner.run(spec).orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
              o_orderdate, coalesce(o_orderpriority, 'UNKNOWN') AS o_orderpriority,
              strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_std,
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 0.9 AS DOUBLE)
                AS net_price
            FROM orders
            WHERE o_orderdate IS NOT NULL AND o_totalprice > 0
            ORDER BY o_orderkey"""))

  /** SQL-text execution path (the reference's /api/db/execute): temp
    * views + `spark.sql` + safety gate + plan-level auto-LIMIT.
    */
  val q83 = EngineQuery(
    "q83_sql_text_exec",
    (s, dir) => {
      Tables(s, dir).registerAll()
      new graft.compile.QueryExecutor(s).execute(
        """SELECT o_orderstatus, count(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;""")
    },
    Some("""SELECT o_orderstatus, count(*) AS n,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM orders GROUP BY o_orderstatus
            ORDER BY o_orderstatus NULLS FIRST LIMIT 10"""))

  /** Explicit GROUPING SETS through the SQL surface (SURVEY.md §2.4 —
    * the rollup/cube family's general form).
    */
  val q84 = EngineQuery(
    "q84_grouping_sets_sql",
    (s, dir) => {
      Tables(s, dir).registerAll()
      new graft.compile.QueryExecutor(s).execute(
        """SELECT CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
             CAST(GROUPING(c_nationkey) AS INT) AS g_nat,
             c_mktsegment, c_nationkey, count(*) AS n
           FROM customer
           GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
           ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST,
             c_nationkey NULLS FIRST""",
        limit = 1000000)
    },
    Some("""SELECT CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
              CAST(GROUPING(c_nationkey) AS INT) AS g_nat,
              c_mktsegment, c_nationkey, count(*) AS n
            FROM customer
            GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
            ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST,
              c_nationkey NULLS FIRST"""))

  /** Catalog/metadata scan as rows (SURVEY.md §2.1): the reference's
    * metadata JSON shape flattened. O(tables) — parquet footers only.
    * Type names are emitted in a canonical spelling (NTZ timestamps as
    * plain TIMESTAMP) so the oracle can map DuckDB's catalog spellings
    * onto the same vocabulary; PK/FK come from the fixture contract
    * (FIXTURES.md §B), which the oracle replays as VALUES.
    */
  val q85 = EngineQuery(
    "q85_catalog_scan",
    (s, dir) => {
      import s.implicits._
      val cat = graft.catalog.MetadataExtractor.fromParquetDir(s, dir)
      cat.tables.flatMap { t =>
        t.columns.map(c => (t.name, c.name,
          if (c.dataType == "TIMESTAMP_NTZ") "TIMESTAMP" else c.dataType,
          c.nullable, c.primaryKey, c.foreignKey.getOrElse("")))
      }.toDF("table_name", "column_name", "data_type", "nullable",
        "primary_key", "foreign_key")
        .orderBy(col("table_name"), col("column_name"))
    },
    Some("""WITH pk(table_name, column_name) AS (
              VALUES ('region','r_regionkey'), ('nation','n_nationkey'),
                ('customer','c_custkey'), ('supplier','s_suppkey'),
                ('part','p_partkey'), ('orders','o_orderkey'),
                ('events','event_id'), ('documents','doc_id'),
                ('embeddings','vec_id')
            ), fk(table_name, column_name, ref) AS (
              VALUES ('lineitem','l_orderkey','orders.o_orderkey'),
                ('lineitem','l_partkey','part.p_partkey'),
                ('lineitem','l_suppkey','supplier.s_suppkey'),
                ('orders','o_custkey','customer.c_custkey'),
                ('customer','c_nationkey','nation.n_nationkey'),
                ('nation','n_regionkey','region.r_regionkey'),
                ('supplier','s_nationkey','nation.n_nationkey'),
                ('events','user_id','customer.c_custkey')
            )
            SELECT c.table_name, c.column_name,
              CASE c.data_type
                WHEN 'VARCHAR' THEN 'STRING'
                WHEN 'INTEGER' THEN 'INT'
                WHEN 'FLOAT[]' THEN 'ARRAY<FLOAT>'
                WHEN 'TIMESTAMP_NS' THEN 'TIMESTAMP'
                WHEN 'BLOB' THEN 'BINARY'
                ELSE c.data_type END AS data_type,
              c.is_nullable = 'YES' AS nullable,
              pk.column_name IS NOT NULL AS primary_key,
              COALESCE(fk.ref, '') AS foreign_key
            FROM information_schema.columns c
            LEFT JOIN pk ON pk.table_name = c.table_name
              AND pk.column_name = c.column_name
            LEFT JOIN fk ON fk.table_name = c.table_name
              AND fk.column_name = c.column_name
            ORDER BY c.table_name, c.column_name"""))

  /** FK join-graph navigation (SURVEY.md §2.3): shortest path
    * lineitem→region resolved by BFS (via supplier→nation, 3 hops) and
    * compiled to chained broadcast equi-joins — the engine-side
    * replacement for the join-path hints the reference hands its LLM.
    */
  val q86 = EngineQuery(
    "q86_join_graph_path",
    (s, dir) => {
      val cat = graft.catalog.MetadataExtractor.fromParquetDir(s, dir)
      val graph = new graft.compile.JoinGraph(cat)
      graph.join(name => Tables(s, dir).table(name), "lineitem", "region")
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_items"),
          toDouble(sum(dec2(col("l_extendedprice")))).as("revenue"))
        .orderBy(col("r_name"))
    },
    Some("""SELECT r_name, COUNT(*) AS n_items,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name"""))

  /** Custom typed aggregate (SURVEY.md §2.10): per-segment top-3 orders
    * via the TopKAggregator UDAF — bounded k-element state with map-side
    * pruning; oracle is the window row_number formulation.
    */
  val q87 = EngineQuery(
    "q87_topk_udaf",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(graft.functions.TopK.topK(3)(col("o_totalprice"),
          col("o_orderkey")).as("top"))
        .select(col("c_mktsegment"), posexplode(col("top")))
        .select(col("c_mktsegment"), (col("pos") + 1).cast("int").as("rn"),
          col("col.id").as("o_orderkey"), col("col.score").as("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("rn"))
    },
    Some("""SELECT c_mktsegment, CAST(rn AS INT) AS rn, o_orderkey,
              o_totalprice
            FROM (
              SELECT c_mktsegment, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY c_mktsegment
                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders JOIN customer ON o_custkey = c_custkey) t
            WHERE rn <= 3 ORDER BY c_mktsegment, rn"""))

  /** SampleSuggester surface end-to-end (SURVEY.md §3.3; reference
    * sql_generator.py:195-247): a suggestion PICKED FROM the generated
    * list (not hand-built) — the deterministic "count of orders per
    * customer" FK pattern — compiled by SpecCompiler (which injects the
    * catalog's mandatory filter) and executed through the gate. The
    * recency suggestion is deliberately not the gate row: its ORDER BY
    * is a bare timestamp, not a total order.
    */
  val q97 = EngineQuery(
    "q97_suggested_group_count",
    (s, dir) => {
      val catalog = parquetCatalog
      val sug = graft.suggest.SampleSuggester.suggest(catalog)
        .find(_.title == "count of orders per customer")
        .getOrElse(sys.error("suggester no longer emits the FK pattern"))
      SpecCompiler.forParquetDir(s, dir, catalog).compile(sug.spec)
    },
    Some("""SELECT o_custkey, count(1) AS n
            FROM orders WHERE o_orderstatus != 'F'
            GROUP BY o_custkey ORDER BY o_custkey NULLS FIRST"""))

  /** Analyzer-rule mandatory-filter path as a GATE query (r6 verdict
    * #7): the same governed-orders contract q81 enforces at spec-compile
    * time, here enforced by [[graft.plans.MandatoryFilterRule]] running
    * session-wide inside the analyzer — the row-level-security
    * deployment shape. The rule needs a session built WITH
    * GraftExtensions, so the query routes through the memoized governed
    * sibling session; the bare `.as("orders")` alias is the ONLY thing
    * naming the governed table — the Filter in the plan comes from the
    * rule, not this code.
    */
  val q164 = EngineQuery(
    "q164_mandatory_filter_rule",
    (s, dir) => {
      val g = graft.plans.MandatoryFilterRule.governedSibling(s)
      graft.plans.MandatoryFilterRule.install(g, parquetCatalog)
      g.read.parquet(s"$dir/orders.parquet").as("orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderstatus != 'F'
            ORDER BY o_orderkey"""))

  val all: Seq[EngineQuery] =
    Seq(q80, q81, q82, q83, q84, q85, q86, q87, q97, q164)
}
