package graft

import graft.compile.{QueryExecutor, ResultSink}
import graft.sources.Connectors
import graft.ops.Tables

class ExecutorSpec extends SparkTestBase {

  test("QueryExecutor strips ';', injects auto-limit, blocks writes") {
    Tables(spark, sfDir).registerAll()
    val ex = new QueryExecutor(spark)
    assert(ex.execute("SELECT * FROM orders;").count() == 10) // auto-limit
    assert(ex.execute("SELECT * FROM orders LIMIT 3").count() == 3)
    intercept[IllegalArgumentException] {
      ex.execute("DROP TABLE orders")
    }
    // writes hidden behind comments or CTEs are caught by the plan gate
    intercept[IllegalArgumentException] {
      ex.execute("-- just a preview\nDROP TABLE orders")
    }
    intercept[IllegalArgumentException] {
      ex.execute("WITH t AS (SELECT 1 AS a) INSERT INTO orders SELECT * FROM t")
    }
    // a subquery LIMIT does not suppress the outer auto-cap
    val sub = ex.execute(
      """SELECT * FROM lineitem l
         JOIN (SELECT o_orderkey FROM orders LIMIT 5) o
           ON l.l_orderkey = o.o_orderkey""")
    assert(sub.count() <= 10)
  }

  test("ResultSink serializes to the reference result-set shape") {
    Tables(spark, sfDir).registerAll()
    val rs = new QueryExecutor(spark).executeToResultSet(
      "SELECT o_orderkey, o_orderdate, o_totalprice FROM orders ORDER BY o_orderkey",
      limit = 2)
    assert(rs.rowCount == 2)
    assert(rs.columns == Seq("o_orderkey", "o_orderdate", "o_totalprice"))
    assert(rs.data.head("o_orderkey") == "0")
    // timestamps serialize ISO-8601 (mirrors datetime.isoformat; NTZ here)
    assert(rs.data.head("o_orderdate").startsWith("1997-01-15T00:00"))
  }

  test("ResultSink keeps duplicate names apart even when a real column " +
      "matches the positional suffix") {
    // (c, c, c_2): the naive suffix would emit (c, c_2, c_2), silently
    // collapsing two different values under one JSON key
    val df = spark.sql("SELECT 1 AS c, 2 AS c, 3 AS c_2")
    val rs = ResultSink.toResultSet(df)
    assert(rs.columns == Seq("c", "c_3", "c_2"))
    assert(rs.columns.distinct.size == 3)
    assert(rs.data.head("c") == "1" && rs.data.head("c_3") == "2" &&
      rs.data.head("c_2") == "3")
    // and duplicated already-suffixed names still uniquify
    val rs2 = ResultSink.toResultSet(spark.sql("SELECT 1 AS c_2, 2 AS c_2"))
    assert(rs2.columns == Seq("c_2", "c_2_2"))
  }

  test("JDBC connector builds the reference URL templates") {
    val pg = Connectors.JdbcConf("postgresql", "db.example", 5432, "shop",
      "u", "p")
    assert(Connectors.jdbcUrl(pg) == "jdbc:postgresql://db.example:5432/shop")
    val my = pg.copy(dbType = "mysql", port = 3306)
    assert(Connectors.jdbcUrl(my) == "jdbc:mysql://db.example:3306/shop")
    intercept[IllegalArgumentException] {
      Connectors.jdbcUrl(pg.copy(dbType = "oracle"))
    }
    // reader is configured but unexecuted (no live DB in this env)
    val reader = Connectors.jdbc(spark, pg)
    assert(reader != null)
  }
}
