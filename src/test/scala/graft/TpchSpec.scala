package graft

import org.apache.spark.sql.functions._

import graft.ops.{Tables, TpchSuite}

/** Semantic cross-checks for the TPC-H-shaped composite workloads —
  * each result is re-derived through an independent formulation (the
  * oracle gate checks DuckDB equivalence; these pin Spark-side semantics
  * at test sf so a refactor can't silently change the query's meaning).
  */
class TpchSpec extends SparkTestBase {

  test("Q18 shape: every reported order really exceeds the quantity threshold") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite.q133.run(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 20)
    val qtyByOrder = t.lineitem.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      val okey = r.getLong(2)
      assert(qtyByOrder(okey) > 95.0, s"order $okey qty ${qtyByOrder(okey)}")
      assert(math.abs(r.getDouble(5) - qtyByOrder(okey)) < 1e-6)
    }
    // descending by order value
    val vals = out.map(_.getDouble(4)).toSeq
    assert(vals == vals.sorted.reverse)
  }

  test("Q4 shape: priority counts equal an independent EXISTS recomputation") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite.q134.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val lo = lit("1998-07-01").cast("timestamp")
    val hi = lit("1998-10-01").cast("timestamp")
    val lateKeys = t.lineitem.filter(col("l_shipdate") >= hi)
      .select(col("l_orderkey")).distinct()
    val expected = t.orders
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .join(lateKeys, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == expected)
  }
}
