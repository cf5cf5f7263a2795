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

  test("Q14 shape: promo share equals a two-query recomputation") {
    val t = Tables(spark, sfDir)
    val out = TpchSuite.q135.run(spark, sfDir).head()
    val lo = lit("1998-01-01").cast("timestamp")
    val hi = lit("1998-04-01").cast("timestamp")
    val joined = t.lineitem
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .select(col("p_type"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("rev"))
    val total = joined.agg(sum(col("rev"))).head().getDouble(0)
    val promo = joined.filter(col("p_type") === "PROMO")
      .agg(sum(col("rev"))).head().getDouble(0)
    assert(math.abs(out.getDouble(0) - promo) / promo < 1e-6)
    assert(math.abs(out.getDouble(1) - total) / total < 1e-6)
    assert(math.abs(out.getDouble(2) - promo * 100.0 / total) < 1e-3)
  }

  test("Q12/Q19 shapes: conditional rollups match independent filters") {
    val t = Tables(spark, sfDir)
    val joined = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
    // q136: per-priority late counts == direct filter counts
    val out136 = TpchSuite.q136.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val late = col("l_shipdate") >=
      col("o_orderdate") + expr("INTERVAL 90 DAYS")
    val want = joined.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("all"),
        sum(when(late, 1L).otherwise(0L)).as("late")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out136 == want)
    // q137: the disjunctive count equals the sum of disjoint branch
    // counts (brands differ, so the three conjunctions are disjoint)
    val out137 = TpchSuite.q137.run(spark, sfDir).head().getLong(0)
    val withPart = t.lineitem
      .join(t.part, col("l_partkey") === col("p_partkey"))
    def branch(brand: String, szHi: Int, qLo: Int, qHi: Int) =
      withPart.filter(col("p_brand") === brand &&
        col("p_size").between(1, szHi) &&
        col("l_quantity").between(qLo, qHi)).count()
    val parts = branch("Brand#1", 15, 1, 20) +
      branch("Brand#7", 25, 10, 35) + branch("Brand#13", 40, 20, 50)
    assert(out137 == parts)
  }

  test("q123: stall onset, deep-stall silence, and resume burst semantics") {
    import spark.implicits._
    // 10 busy days (20 events), a 6-day TOTAL stall, then a 10x resume
    // burst: onset and early-stall days flag against the live median,
    // deep-stall days (dead median, still silent) do NOT re-flag, and
    // the resume burst flags against the dead median
    val dir = java.nio.file.Files
      .createTempDirectory("graft-q123").toString
    // UTC-pinned instants (the session TZ is UTC; JVM default TZ must
    // not leak into either the fixture or the assertions)
    val base = java.time.Instant.parse("2025-03-01T12:00:00Z")
    def at(day: Int, k: Int) =
      base.plusSeconds(day * 86400L + k).toEpochMilli * 1000L
    val rows =
      (0 until 10).flatMap { d =>
        (0 until 20).map(k => (d.toLong * 100 + k, at(d, k))) } ++
      (0 until 200).map(k => (2000L + k, at(16, k)))
    rows.toDF("event_id", "us")
      .select(col("event_id"), (col("us") * 1000L).as("ts"),
        (col("event_id") % 5).as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.ops.EventOps.q123.run(spark, dir).collect()
      .map(r => r.getTimestamp(0).toInstant.toString.take(10) ->
        (r.getLong(1), r.getBoolean(5))).toMap
    assert(out.size == 17, "spine covers every calendar day incl. stalls")
    assert(out("2025-03-01") == (20L -> false), "first day: no baseline")
    assert(out("2025-03-05") == (20L -> false), "steady day unflagged")
    assert(out("2025-03-11") == (0L -> true), "stall onset flagged")
    assert(out("2025-03-13") == (0L -> true), "early stall still flagged")
    assert(out("2025-03-15") == (0L -> false),
      "deep stall (dead median, still silent): no NEW deviation")
    assert(out("2025-03-17") == (200L -> true),
      "resume burst against a dead median is flagged")
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
