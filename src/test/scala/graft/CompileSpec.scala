package graft

import org.apache.spark.sql.functions._

import graft.catalog.SampleCatalogs
import graft.compile._
import graft.model._
import graft.ops.Tables

class CompileSpec extends SparkTestBase {

  test("ResultLimiter injects the default cap only when no limit exists") {
    val t = Tables(spark, sfDir)
    val limited = ResultLimiter(t.orders, 7)
    assert(limited.count() == 7)
    // idempotence: an existing limit suppresses injection
    val already = t.orders.limit(3)
    assert(ResultLimiter(already, 7).count() == 3)
  }

  test("ResultLimiter is plan-level: a column named 'limit' doesn't fool it") {
    // the reference's substring check misfires here (db_connector.py:218);
    // ours must still inject
    val t = Tables(spark, sfDir)
    val df = t.orders.withColumn("limit", lit(1))
    assert(ResultLimiter(df, 5).count() == 5)
  }

  test("ResultLimiter: a LIMIT inside a subquery does not suppress the outer cap") {
    val t = Tables(spark, sfDir)
    val inner = t.orders.limit(5).select(col("o_orderkey"))
    val joined = t.lineitem.join(inner, col("l_orderkey") === col("o_orderkey"))
    // inner limit must NOT count as the outer query's limit
    assert(ResultLimiter(joined, 3).count() <= 3)
    // but a real outer limit still suppresses injection
    assert(ResultLimiter(joined.limit(2), 7).count() == 2)
  }

  test("SafetyValidator blocks destructive SQL commands, allows reads") {
    assert(SafetyValidator.validateSql("SELECT * FROM t").isRight)
    assert(SafetyValidator.validateSql("  WITH x AS (SELECT 1) SELECT * FROM x").isRight)
    assert(SafetyValidator.validateSql("DROP TABLE t").isLeft)
    assert(SafetyValidator.validateSql("delete from t").isLeft)
    // a SELECT mentioning 'update' in a string literal is fine (plan-level,
    // not substring)
    assert(SafetyValidator.validateSql("SELECT 'update me' FROM t").isRight)
  }

  test("SafetyValidator blocks destructive NL requests incl. Korean keywords") {
    // mirrors sql_generator.py:253-266
    assert(SafetyValidator.validateRequest("show me all users").isRight)
    assert(SafetyValidator.validateRequest("please DROP the users table").isLeft)
    assert(SafetyValidator.validateRequest("사용자 테이블 삭제해줘").isLeft)
    // whole-word matching: mentioning created_at/updated columns is benign
    assert(SafetyValidator.validateRequest("show customers created this month").isRight)
    assert(SafetyValidator.validateRequest("latest updated orders").isRight)
  }

  test("SafetyValidator catches writes hidden behind comments and CTEs") {
    assert(SafetyValidator.validateSql("-- preview\nDROP TABLE orders").isLeft)
    assert(SafetyValidator.validateSql("/* x */ TRUNCATE TABLE t").isLeft)
    val parser = spark.sessionState.sqlParser
    // CTE-wrapped INSERT parses to a non-Command root; the plan gate
    // must still find the InsertIntoStatement
    val cte = parser.parsePlan(
      "WITH t AS (SELECT 1 AS a) INSERT INTO sink SELECT * FROM t")
    assert(SafetyValidator.validatePlan(cte).isLeft)
    assert(SafetyValidator.validatePlan(
      parser.parsePlan("SELECT * FROM orders")).isRight)
    assert(SafetyValidator.validatePlan(
      parser.parsePlan("DROP TABLE orders")).isLeft)
  }

  test("MandatoryFilters applies catalog constraints to matching tables only") {
    val t = Tables(spark, sfDir)
    val cat = graft.ops.PipelineQueries.parquetCatalog
    val filtered = MandatoryFilters(t.orders, "orders", cat)
    assert(filtered.filter(col("o_orderstatus") === "F").count() == 0)
    // customer has no o_orderstatus column -> constraint not applied
    assert(MandatoryFilters.filtersFor("customer", cat).isEmpty)
    // a table UNKNOWN to the catalog gets no filters (we can't know its
    // columns -- applying one would fail with UNRESOLVED_COLUMN)
    assert(MandatoryFilters.filtersFor("nation", cat).isEmpty)
    val compiler = SpecCompiler.forParquetDir(spark, sfDir, cat)
    assert(compiler.compile(QuerySpec(table = "nation")).count() == 25)
  }

  test("MandatoryFilters resolves function calls and qualified refs") {
    val base = graft.ops.PipelineQueries.parquetCatalog
    def withFilters(fs: String*) = base.copy(
      constraints = base.constraints.copy(mandatoryFilters = fs))

    // function names are not column refs: the filter attaches to any
    // table carrying the ARGUMENT columns
    val fn = withFilters("year(o_orderdate) > 1990",
      "coalesce(o_orderstatus, 'O') != 'F'")
    assert(MandatoryFilters.filtersFor("orders", fn).size == 2)
    assert(MandatoryFilters.filtersFor("customer", fn).isEmpty)
    assert(MandatoryFilters.unapplicable(fn).isEmpty)

    // qualified refs attach only to the table they name — and resolve
    // when executed (the scan is aliased to its table name)
    val qual = withFilters("orders.o_orderstatus != 'F'")
    assert(MandatoryFilters.filtersFor("orders", qual).size == 1)
    assert(MandatoryFilters.filtersFor("customer", qual).isEmpty)
    assert(SpecCompiler.forParquetDir(spark, sfDir, qual)
      .compile(QuerySpec(table = "orders"))
      .filter(col("o_orderstatus") === "F").count() == 0)

    // a qualifier naming ANOTHER table never leaks in
    val wrong = withFilters("customer.o_orderstatus != 'F'")
    assert(MandatoryFilters.filtersFor("orders", wrong).isEmpty)
    assert(MandatoryFilters.unapplicable(wrong).size == 1)

    // a literal-only filter ('1 = 1') references no columns: dropping
    // it cannot change results, so it must NOT fail the compiler
    val noop = withFilters("1 = 1")
    assert(MandatoryFilters.unapplicable(noop).isEmpty)
    SpecCompiler.forParquetDir(spark, sfDir, noop)

    // scientific-notation literals: the exponent ("e6") must not parse
    // as a column reference, which would resolve on no table and fail
    // construction for an otherwise-valid filter
    val sci = withFilters("o_totalprice > 1e6", "o_totalprice < 2.5E+8")
    assert(MandatoryFilters.filtersFor("orders", sci).size == 2)
    assert(MandatoryFilters.unapplicable(sci).isEmpty)
    SpecCompiler.forParquetDir(spark, sfDir, sci)

    // a policy filter attaching to no table is a loud construction
    // failure, not a silently-dropped constraint
    val dead = withFilters("is_deleted = false")
    assert(MandatoryFilters.unapplicable(dead) == Seq("is_deleted = false"))
    val ex = intercept[IllegalArgumentException] {
      SpecCompiler.forParquetDir(spark, sfDir, dead)
    }
    assert(ex.getMessage.contains("is_deleted"))
  }

  test("MandatoryFilterRule: analyzer-rule path equals the spec-level path " +
      "and pushes down") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import graft.plans.MandatoryFilterRule

    val cat = graft.ops.PipelineQueries.parquetCatalog
    val orig = spark // force shared-session init before we swap it out
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // extensions only apply at session CONSTRUCTION — build a sibling
    // session on the same SparkContext with GraftExtensions active
    val governed = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      assert(governed ne orig)
      MandatoryFilterRule.install(governed, cat)

      def orders = governed.read.parquet(s"$sfDir/orders.parquet")

      // before install on THIS df / after uninstall: measured below.
      // aliased scan → policy injected by the analyzer, equal to the
      // spec-level MandatoryFilters result
      val ruled = orders.as("orders")
      val specLevel = MandatoryFilters(orig.read
        .parquet(s"$sfDir/orders.parquet").as("orders"), "orders", cat)
      assert(ruled.count() == specLevel.count())
      assert(ruled.filter(col("o_orderstatus") === "F").count() == 0)
      assert(ruled.count() < orders.count()) // it actually filtered

      // session-wide: spark.sql over a temp view is governed too — the
      // coverage the spec-level path cannot give
      orders.createOrReplaceTempView("orders")
      val viaSql = governed.sql("SELECT count(*) AS n FROM orders")
        .head().getLong(0)
      assert(viaSql == specLevel.count())

      // idempotence: composing the already-analyzed scan into a larger
      // query injects NO duplicate — exactly one policy Filter in the plan
      val composed = ruled.filter(col("o_totalprice") > 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val policyFilters = composed.queryExecution.analyzed.collect {
        case f: LFilter if f.condition.sql.contains("o_orderstatus") => f
      }
      assert(policyFilters.size == 1,
        s"expected exactly 1 injected filter, got ${policyFilters.size}")

      // the injected predicate reaches the parquet scan like any user
      // filter (analysis-time injection → normal optimizer pushdown)
      val plan = ruled.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("o_orderstatus"), s"no pushdown visible in:\n$plan")

      // un-governed sessions are untouched; uninstall restores raw reads
      assert(orig.read.parquet(s"$sfDir/orders.parquet").as("orders")
        .filter(col("o_orderstatus") === "F").count() > 0)
      MandatoryFilterRule.uninstall(governed)
      assert(orders.as("orders").count() == orders.count())
    } finally {
      MandatoryFilterRule.uninstall(governed)
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("DemoPlanner golden contract: postgres e-commerce sample") {
    // observable contract of sql_generator.py:274-281: first 5 columns,
    // dialect mandatory filter, LIMIT 10
    val res = DemoPlanner.plan("사용자 목록 보여줘 users", SampleCatalogs.postgresEcommerce)
    assert(!res.isBlocked)
    assert(res.sql ==
      "SELECT id, email, username, created_at, status FROM users" +
        " WHERE is_deleted = false ORDER BY id LIMIT 10")
    assert(res.tablesUsed == Seq("users"))
  }

  test("DemoPlanner golden contract: mysql HR sample") {
    val res = DemoPlanner.plan("직원 현황 employees", SampleCatalogs.mysqlHr)
    assert(res.sql ==
      "SELECT id, name, email, department_id, position FROM employees" +
        " WHERE status != 'resigned' ORDER BY id LIMIT 10")
  }

  test("DemoPlanner blocks destructive requests with is_blocked") {
    val res = DemoPlanner.plan("drop all users", SampleCatalogs.postgresEcommerce)
    assert(res.isBlocked)
    assert(res.sql.isEmpty)
    assert(res.blockReason.nonEmpty)
  }

  test("SpecCompiler compiles scan+filter+join+agg+sort+limit") {
    val compiler = SpecCompiler.forParquetDir(spark, sfDir)
    val df = compiler.compile(QuerySpec(
      table = "orders",
      joins = Seq(JoinSpec("customer", "o_custkey = c_custkey")),
      filters = Seq("o_totalprice > 100000"),
      groupBy = Seq("c_mktsegment"),
      aggregates = Seq(AggSpec("count(1)", "n")),
      orderBy = Seq(OrderSpec("n", ascending = false)),
      limit = Some(3)))
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("SampleSuggester specs ALL compile and execute (no truncation hiding)") {
    val cat = graft.catalog.MetadataExtractor.fromParquetDir(spark, sfDir)
    // default cap
    assert(graft.suggest.SampleSuggester.suggest(cat).size <= 10)
    // uncapped: every pattern (incl. qualified join conditions) must
    // compile -- truncation must not hide broken specs
    val all = graft.suggest.SampleSuggester.suggest(cat, max = 100)
    val compiler = SpecCompiler.forParquetDir(spark, sfDir, cat)
    all.foreach { sg =>
      val n = compiler.compile(sg.spec).count()
      assert(n >= 0, sg.title)
    }
    assert(all.exists(_.spec.joins.nonEmpty))
  }

  test("ValidationOps enforces ENUM valid_status_values from the catalog") {
    import spark.implicits._
    // mirrors employees.status ENUM('active','resigned','on_leave')
    val cat = graft.catalog.SampleCatalogs.mysqlHr
    val df = Seq((1L, "active"), (2L, "resigned"), (3L, "fired"),
      (4L, null.asInstanceOf[String])).toDF("id", "status")
    val bad = ValidationOps.violations(df, "employees", cat).collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("invalid_column") == "status")
    assert(bad.head.getAs[String]("invalid_value") == "fired")
    val kept = ValidationOps.enforce(df, "employees", cat)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 2L, 4L)) // null passes, 'fired' dropped
    // a table with no constraints validates trivially
    assert(ValidationOps.violations(df, "departments", cat).count() == 0)
  }

  test("ResultSet renders the reference JSON field names") {
    val rs = graft.model.ResultSet(
      columns = Seq("id", "name"),
      data = Seq(Map("id" -> "1", "name" -> "a\"b"), Map("id" -> "2", "name" -> null)),
      rowCount = 2)
    val json = rs.toJsonString
    assert(json.contains("\"row_count\": 2"))
    assert(json.contains("\"columns\": [\"id\",\"name\"]"))
    assert(json.contains("\"name\": \"a\\\"b\""))
    assert(json.contains("\"name\": null"))
  }

  test("MetadataExtractor produces the reference catalog shape") {
    val cat = graft.catalog.MetadataExtractor.fromParquetDir(spark, sfDir)
    assert(cat.tables.map(_.name).contains("lineitem"))
    val orders = cat.table("orders").get
    assert(orders.columns.find(_.name == "o_custkey").get.foreignKey
      .contains("customer.c_custkey"))
    assert(orders.pkColumns == Seq("o_orderkey"))
    assert(cat.relationships.exists(_.render ==
      "lineitem.l_orderkey -> orders.o_orderkey"))
  }
}
