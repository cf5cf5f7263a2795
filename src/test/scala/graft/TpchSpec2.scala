package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.{Tables, TpchSuite2}

/** Semantic cross-checks for the subquery-shaped composites: each
  * decorrelated plan is re-derived through a DIFFERENT formulation
  * (window instead of agg-join, aggregate counts instead of semi/anti
  * joins, DataFrame anti instead of SQL NOT IN) so a refactor of either
  * side can't silently change the semantics and still pass.
  */
class TpchSpec2 extends SparkTestBase {

  test("Q17 shape: agg-join decorrelation equals a window-based recompute") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite2.q138.run(spark, sfDir).head()
    // independent formulation: per-part average via a window function,
    // plain double math (5*qty*cnt < sum  <=>  qty < 0.2*avg exactly in
    // integers-scaled-by-cents; doubles here are exact for these sums)
    val w = Window.partitionBy(col("l_partkey"))
    val flagged = t.lineitem
      .join(t.part.filter(col("p_brand") === "Brand#3"),
        col("l_partkey") === col("p_partkey"))
      .withColumn("sum_qty", sum(col("l_quantity")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("l_quantity") * 5 * col("cnt") < col("sum_qty"))
    assert(out.getLong(0) == flagged.count())
    assert(out.getLong(0) > 0, "fixture must exercise the filter")
  }

  test("Q13 shape: distribution masses re-add to customers and orders") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite2.q139.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // sum of bucket populations = every customer exactly once
    assert(out.map(_._2).sum == t.customer.count())
    // sum of count*population = every non-urgent order of a known
    // customer exactly once
    val nonUrgent = t.orders.filter(col("o_orderpriority") =!= "1-URGENT")
      .join(t.customer, col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    assert(out.map { case (c, d) => c * d }.sum == nonUrgent)
  }

  test("Q15 shape: the reported supplier(s) hold the collected maximum") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite2.q140.run(spark, sfDir).collect()
    assert(out.nonEmpty)
    val revByKey = t.lineitem
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mx = revByKey.values.max
    // every reported supplier is within float-noise of the true max,
    // and every true-max supplier is reported
    out.foreach { r =>
      assert(math.abs(revByKey(r.getLong(0)) - mx) < 1e-4,
        s"supplier ${r.getLong(0)} not maximal")
    }
    val winners = revByKey.filter { case (_, v) =>
      math.abs(v - mx) < 1e-4 }.keySet
    assert(out.map(_.getLong(0)).toSet == winners)
  }

  test("Q22 shape: selected customers beat the avg and lack recent orders") {
    val t = Tables(spark, sfDir)
    val nSelected = TpchSuite2.q141.run(spark, sfDir)
      .agg(sum(col("n_cust"))).head().getLong(0)
    val avg = t.customer.filter(col("c_acctbal") > 0.0)
      .agg(org.apache.spark.sql.functions.avg(col("c_acctbal")))
      .head().getDouble(0)
    val recentCusts = t.orders
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val direct = t.customer
      .filter(col("c_acctbal") > avg + 1e-9)
      .collect().count(r => !recentCusts.contains(r.getLong(0)))
    assert(nSelected == direct)
    assert(nSelected > 0, "fixture must select someone")
  }

  test("Q11 shape: share threshold binds against the collected total") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite2.q142.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val perPart = t.lineitem.groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val total = perPart.values.sum
    val cnt = perPart.size
    val want = perPart.filter { case (_, v) =>
      v * 2 * cnt > total * 3 + 1e-4 }
    // double recompute can disagree with the exact-decimal engine only
    // inside float noise of the threshold — assert set equality after
    // excluding a noise band around it
    val band = total * 1e-9
    val sure = perPart.filter { case (_, v) =>
      math.abs(v * 2 * cnt - total * 3) > band }
    sure.foreach { case (k, v) =>
      assert(out.contains(k) == (v * 2 * cnt > total * 3), s"part $k") }
    assert(want.nonEmpty && out.nonEmpty)
  }

  test("Q16 shape: SQL NOT IN equals the DataFrame anti join here") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite2.q144.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        r.getLong(3)).toMap
    // with provably non-null keys NOT IN degenerates to anti-join
    // semantics; this pins that equivalence (and would catch a regression
    // if the fixture ever gained nullable supplier keys silently)
    val bad = t.supplier.filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val want = t.part
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      .join(t.lineitem, col("p_partkey") === col("l_partkey"))
      .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        r.getLong(3)).toMap
    assert(out == want)
    assert(out.nonEmpty)
  }

  test("NOT IN three-valued semantics: a NULL in the subquery empties " +
      "the result while left_anti keeps rows") {
    // the semantics q144's doc note rests on: NOT IN over a subquery
    // containing NULL is never TRUE (x <> NULL is UNKNOWN), so Spark
    // must plan the null-aware variant when it can't prove
    // non-nullability — and that variant returns ZERO rows here,
    // while the anti join (absence-of-match semantics) returns 2
    import spark.implicits._
    Seq(Some(1L), Some(2L), Some(3L)).toDF("k")
      .createOrReplaceTempView("probe_naaj")
    Seq(Some(1L), None).toDF("k").createOrReplaceTempView("build_naaj")
    val notIn = spark.sql(
      "SELECT k FROM probe_naaj WHERE k NOT IN (SELECT k FROM build_naaj)")
    assert(notIn.count() == 0, "NOT IN with a NULL build row is never TRUE")
    // physical shape: BroadcastHashJoin's trailing isNullAwareAntiJoin
    // flag is `true` (Spark 4 encodes null-awareness as the flag, not
    // a residual condition) — not a plain anti equi-join
    val plan = notIn.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"expected null-aware anti join, got:\n$plan")
    val anti = spark.table("probe_naaj").join(spark.table("build_naaj"),
      Seq("k"), "left_anti")
    assert(anti.count() == 2, "left_anti ignores the NULL build row")
  }

  test("Q21 shape: semi/anti joins equal an aggregate-count reformulation") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite2.q145.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent formulation: per order, count distinct suppliers and
    // distinct LATE suppliers; a waiting supplier is the late one on an
    // order with >=2 suppliers and exactly 1 late supplier
    val f = t.orders.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = t.lineitem.join(f, col("l_orderkey") === col("o_orderkey"))
    val perOrder = li.groupBy(col("l_orderkey").as("okey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          col("l_suppkey"))).as("n_late"))
    val latePairs = li.filter(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val want = latePairs
      .join(perOrder, col("l_orderkey") === col("okey"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(25)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == want)
    assert(out.nonEmpty)
  }
}
