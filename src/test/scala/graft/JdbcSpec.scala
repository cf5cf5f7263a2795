package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.sources.Connectors

/** LIVE end-to-end JDBC integration against an embedded Derby database
  * (ships with Spark for the Hive metastore — in-process, zero
  * network, so it runs in the egress-free sandbox). This closes the
  * loop the URL-template unit tests can't: a real driver, a real
  * connection, real rows through `spark.read.format("jdbc")` — plus
  * the two behaviors that matter at 100 TB extract scale: filter
  * pushdown into the database and the range-partitioned parallel read.
  */
class JdbcSpec extends SparkTestBase {

  private lazy val dbUrl: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby")
    val url = s"jdbc:derby:$dir/db"
    val conn = DriverManager.getConnection(s"$url;create=true")
    val st = conn.createStatement()
    st.executeUpdate(
      "CREATE TABLE accounts (id INT NOT NULL PRIMARY KEY, " +
        "name VARCHAR(32), balance DOUBLE)")
    st.executeUpdate(
      "CREATE TABLE purchases (pid INT NOT NULL PRIMARY KEY, " +
        "account_id INT REFERENCES accounts (id), amount DOUBLE)")
    val ins = conn.prepareStatement("INSERT INTO accounts VALUES (?, ?, ?)")
    (0 until 100).foreach { i =>
      ins.setInt(1, i)
      ins.setString(2, s"acct_$i")
      ins.setDouble(3, i * 1.5)
      ins.executeUpdate()
    }
    ins.close(); st.close(); conn.close()
    url
  }

  test("live JDBC read returns the inserted rows") {
    val df = Connectors.jdbc(spark, dbUrl, "", "")
      .option("dbtable", "accounts").load()
    assert(df.count() == 100)
    assert(df.columns.map(_.toLowerCase).sorted.toSeq ==
      Seq("balance", "id", "name"))
    val r = df.filter(col("ID") === 42).head()
    assert(r.getAs[String]("NAME") == "acct_42")
    assert(r.getAs[Double]("BALANCE") == 63.0)
  }

  test("JDBC filter pushes down into the database scan") {
    val df = Connectors.jdbc(spark, dbUrl, "", "")
      .option("dbtable", "accounts").load()
      .filter(col("ID") >= 90)
    assert(df.count() == 10)
    // the relation's pushed-filter list must carry the predicate —
    // rows are filtered IN the database, not after a full extract
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ID"),
      s"no pushdown visible in:\n$plan")
  }

  test("range-partitioned parallel extract splits into N JDBC partitions") {
    val df = Connectors.jdbc(spark, dbUrl, "", "")
      .option("dbtable", "accounts")
      .option("partitionColumn", "id")
      .option("lowerBound", "0")
      .option("upperBound", "100")
      .option("numPartitions", "4")
      .load()
    assert(df.rdd.getNumPartitions == 4)
    // every partition draws a disjoint range; union is lossless
    assert(df.count() == 100)
    assert(df.agg(sum(col("ID"))).head().getLong(0) == (0 until 100).sum)
  }

  test("fromJdbc walks the live system catalog: PK, FK, edges, types") {
    // the db_connector.py:90-176 inspector loop over a REAL catalog:
    // a two-table FK schema read back through DatabaseMetaData
    val conn = DriverManager.getConnection(dbUrl)
    try {
      val cat = graft.catalog.MetadataExtractor.fromJdbc(conn, "APP")
      assert(cat.dbType.contains("derby"))
      assert(cat.tables.map(_.name).toSet == Set("accounts", "purchases"))

      val acc = cat.table("accounts").get
      assert(acc.pkColumns == Seq("id"))
      val id = acc.columns.find(_.name == "id").get
      assert(!id.nullable && id.dataType.nonEmpty)
      assert(acc.columns.find(_.name == "name").get.nullable)

      val pur = cat.table("purchases").get
      assert(pur.pkColumns == Seq("pid"))
      assert(pur.columns.find(_.name == "account_id").get.foreignKey
        .contains("accounts.id"))

      // relationship edges render in the reference's arrow form
      assert(cat.relationships ==
        Seq(graft.model.Relationship("purchases", "account_id",
          "accounts", "id")))
      assert(cat.relationships.head.render == "purchases.account_id -> accounts.id")

      // the walked catalog drives the join graph like any other source
      val graph = new graft.compile.JoinGraph(cat)
      assert(graph.path("purchases", "accounts").isDefined)
    } finally conn.close()
  }

  test("JDBC sink round-trip: write back, append, and re-read") {
    import spark.implicits._
    // the write-back half of the extract contract: publish a computed
    // result into the live database and read it back identically
    val summary = Connectors.jdbc(spark, dbUrl, "", "")
      .option("dbtable", "accounts").load()
      .groupBy((col("id") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("balance")).as("total"))
    summary.write.format("jdbc")
      .option("url", dbUrl).option("dbtable", "account_summary")
      .mode("overwrite").save()
    val back = Connectors.jdbc(spark, dbUrl, "", "")
      .option("dbtable", "account_summary").load()
    assert(back.count() == 10)
    // Derby narrows the bucket column to INT on the round-trip; compare
    // through canonical casts
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("cast(bucket as bigint) bucket", "cast(n as bigint) n",
        "cast(total as double) total")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(canon(back) == canon(summary))
    // append mode accumulates rather than replacing
    Seq((99L, 1L, 0.0)).toDF("bucket", "n", "total")
      .write.format("jdbc")
      .option("url", dbUrl).option("dbtable", "account_summary")
      .mode("append").save()
    assert(Connectors.jdbc(spark, dbUrl, "", "")
      .option("dbtable", "account_summary").load().count() == 11)
  }

  test("reference-contract conf path builds the same reader (URL check)") {
    // the conf overload is the reference's {db_type, host, port, ...}
    // contract; it routes through the SAME reader as the live tests
    val pg = Connectors.JdbcConf("postgresql", "db.example", 5432,
      "shop", "u", "p")
    assert(Connectors.jdbcUrl(pg) == "jdbc:postgresql://db.example:5432/shop")
  }
}
