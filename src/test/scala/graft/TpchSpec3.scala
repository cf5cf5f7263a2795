package graft

import org.apache.spark.sql.functions._

import graft.ops.{Tables, TpchSuite3}

/** Semantic cross-checks for the Q1/Q2/Q6/Q8/Q9/Q20 shapes — plain
  * double-arithmetic recomputes (tolerance-based) against the engine's
  * exact-decimal results, plus structural identities the shapes must
  * satisfy regardless of data.
  */
class TpchSpec3 extends SparkTestBase {

  test("Q1 shape: the wide aggregate equals a plain-double recompute") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite3.q146.run(spark, sfDir).collect()
    assert(out.nonEmpty)
    val want = t.lineitem
      .filter(col("l_shipdate") <= lit("2001-06-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sq"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sd"),
        avg(col("l_quantity")).as("aq"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
      .toMap
    out.foreach { r =>
      val (sq, sd, aq, n) = want((r.getString(0), r.getString(1)))
      assert(math.abs(r.getDouble(2) - sq) / sq < 1e-9, "sum_qty")
      assert(math.abs(r.getDouble(4) - sd) / sd < 1e-9, "sum_disc_price")
      assert(math.abs(r.getDouble(6) - aq) / aq < 1e-9, "avg_qty")
      assert(r.getLong(9) == n, "count_order")
    }
  }

  test("Q2 shape: every reported supplier holds its part's minimum balance") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite3.q147.run(spark, sfDir).collect()
    assert(out.nonEmpty)
    // independent recompute of the candidate minimum per part
    val asiaSupp = t.supplier
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .join(t.region.filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey").as("sk"), col("s_acctbal").as("bal"))
    val minByPart = t.lineitem
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(asiaSupp, col("l_suppkey") === col("sk"))
      .groupBy(col("l_partkey")).agg(min(col("bal")).as("mn"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      val (pk, bal) = (r.getLong(0), r.getDouble(6))
      assert(math.abs(bal - minByPart(pk)) < 1e-9,
        s"part $pk reported $bal, true min ${minByPart(pk)}")
      assert(r.getInt(2) <= 5, "size filter")
    }
  }

  test("Q6 shape: superset prefilter never changes the exact-decimal count") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite3.q148.run(spark, sfDir).head()
    // the exact predicate WITHOUT the raw-double pushdown bounds — if
    // the widened bounds ever clipped a row the decimal predicate
    // accepts, these counts would differ
    val exact = t.lineitem
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
        col("l_discount").cast("decimal(18,2)")
          .between(lit("0.05").cast("decimal(18,2)"),
            lit("0.07").cast("decimal(18,2)")) &&
        col("l_quantity").cast("decimal(18,2)") <
          lit(24).cast("decimal(18,2)"))
      .count()
    assert(out.getLong(0) == exact)
    assert(exact > 0, "fixture must exercise the band")
  }

  test("Q8 shape: market share is bounded and matches a two-pass recompute") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite3.q149.run(spark, sfDir).collect()
    assert(out.nonEmpty)
    val vol = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.nation.select(col("n_nationkey").as("snk"),
        col("n_name").as("sname")), col("s_nationkey") === col("snk"))
      .join(t.nation.select(col("n_nationkey").as("cnk"),
        col("n_regionkey").as("crk")), col("c_nationkey") === col("cnk"))
      .join(t.region.filter(col("r_name") === "ASIA"),
        col("crk") === col("r_regionkey"))
      .select(year(col("o_orderdate")).as("y"), col("sname"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("v"))
    val byYear = vol.groupBy(col("y"))
      .agg(sum(when(col("sname") === "NATION_3", col("v"))
        .otherwise(0.0)).as("num"), sum(col("v")).as("den"))
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(1) / r.getDouble(2))).toMap
    out.foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0)
      assert(math.abs(share - byYear(r.getInt(0))) < 1e-9)
    }
  }

  test("Q9 shape: profit equals revenue minus cost recomputed in doubles") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite3.q150.run(spark, sfDir).collect()
    assert(out.nonEmpty)
    val want = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.part.filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("y"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        - col("p_retailprice") * col("l_quantity")).as("p"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    out.foreach { r =>
      val w = want((r.getString(0), r.getInt(1)))
      assert(math.abs(r.getDouble(2) - w) < math.max(1e-6, math.abs(w) * 1e-9))
    }
  }

  test("Q20 shape: the semi join reports exactly the HAVING key set") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite3.q151.run(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val want = t.lineitem
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .join(t.part.filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).as("q"))
      .filter(col("q") > 50.0)
      .select(col("l_suppkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(out == want)
    assert(out.nonEmpty)
  }
}
