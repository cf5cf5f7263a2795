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
  }

  test("MandatoryFilters applies catalog constraints to matching tables only") {
    val t = Tables(spark, sfDir)
    val cat = graft.ops.PipelineQueries.parquetCatalog
    val filtered = MandatoryFilters(t.orders, "orders", cat)
    assert(filtered.filter(col("o_orderstatus") === "F").count() == 0)
    // customer has no o_orderstatus column -> constraint not applied
    assert(MandatoryFilters.filtersFor("customer", cat).isEmpty)
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

  test("SampleSuggester emits <=10 compilable specs covering the pattern mix") {
    val cat = graft.catalog.MetadataExtractor.fromParquetDir(spark, sfDir)
    val suggestions = graft.suggest.SampleSuggester.suggest(cat)
    assert(suggestions.nonEmpty && suggestions.size <= 10)
    val compiler = SpecCompiler.forParquetDir(spark, sfDir, cat)
    // every suggested spec must compile and execute
    suggestions.foreach { sg =>
      val n = compiler.compile(sg.spec).count()
      assert(n >= 0, sg.title)
    }
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
