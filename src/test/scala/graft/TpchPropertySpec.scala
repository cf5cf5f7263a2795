package graft

import org.apache.spark.sql.functions._

import graft.ops.{TpchSuite2, TpchSuite3}

/** Randomized properties for the subtlest composite semantics — the
  * PRODUCTION query code (TpchSuite2/3) runs unmodified over random
  * parquet tables in a temp dir, so the guarantees are
  * fixture-independent: a semantics bug that happens to cancel out on
  * the driver fixture's distributions cannot hide here.
  */
class TpchPropertySpec extends SparkTestBase {

  private val rnd = new scala.util.Random(20260813L)

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft-tpch-prop").toString

  test("Q21 semi/anti double correlation == per-order counting on random data") {
    import spark.implicits._
    val dir = tempDir()
    val nOrders = 400
    val nSupp = 12
    // random F/O orders; each order 1-4 lineitems with random suppliers
    // and ship lags straddling the 60-day lateness boundary
    val base = java.time.Instant.parse("2000-01-01T00:00:00Z")
    val orders = (0 until nOrders).map { o =>
      (o.toLong, if (rnd.nextBoolean()) "F" else "O",
        new java.sql.Timestamp(
          base.plusSeconds(rnd.nextInt(300) * 86400L).toEpochMilli))
    }
    orders.toDF("o_orderkey", "o_orderstatus", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val lines = orders.flatMap { case (o, _, od) =>
      (0 until 1 + rnd.nextInt(4)).map { i =>
        (o, i, rnd.nextInt(nSupp).toLong,
          new java.sql.Timestamp(od.getTime +
            rnd.nextInt(120) * 86400000L))
      }
    }
    lines.toDF("l_orderkey", "l_linenumber", "l_suppkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (0 until nSupp).map(s => (s.toLong, f"S$s%03d"))
      .toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")

    val out = TpchSuite2.q145.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // independent reference: plain Scala over the generated rows
    val fOrders = orders.collect { case (o, "F", od) => o -> od }.toMap
    val latePairs = lines.collect {
      case (o, _, s, sd) if fOrders.contains(o) &&
        sd.getTime > fOrders(o).getTime + 60L * 86400000L => (o, s)
    }.distinct
    val suppsPerOrder = lines.map(l => (l._1, l._3)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lateSuppsPerOrder = latePairs.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val waiting = latePairs.filter { case (o, s) =>
      suppsPerOrder(o).size >= 2 && lateSuppsPerOrder(o) == Set(s) }
    val want = waiting.groupBy { case (_, s) => f"S$s%03d" }.view
      .mapValues(_.size.toLong).toMap
      .toSeq.sortBy { case (n, w) => (-w, n) }.take(25).toMap
    assert(out == want, s"engine=$out reference=$want")
    assert(want.nonEmpty, "generator must produce waiting suppliers")
  }

  test("Q13 distribution preserves total mass on random sparse orders") {
    import spark.implicits._
    val dir = tempDir()
    val nCust = 300
    // ~40% of customers get no orders at all -> the zero bucket MUST
    // appear; priorities random so the join-condition filter bites
    val custs = (0 until nCust).map(_.toLong)
    custs.toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM")
    val orders = custs.filter(_ => rnd.nextDouble() > 0.4).flatMap { c =>
      (0 until rnd.nextInt(5)).map(i =>
        (c * 100 + i, c, prios(rnd.nextInt(prios.length))))
    }
    orders.toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val out = TpchSuite2.q139.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(out.map(_._2).sum == nCust, "every customer in exactly one bucket")
    val nonUrgent = orders.count(_._3 != "1-URGENT").toLong
    assert(out.map { case (c, d) => c * d }.sum == nonUrgent,
      "order mass preserved")
    val zeroBucket = out.toMap.getOrElse(0L, 0L)
    // reference zero-count: customers with no non-urgent order
    val withNonUrgent = orders.filter(_._3 != "1-URGENT").map(_._2).toSet
    assert(zeroBucket == (nCust - withNonUrgent.size).toLong,
      "zero bucket == customers with only-urgent or no orders")
    assert(zeroBucket > 0, "generator must produce orderless customers")
  }

  test("Q15 max-equality join reports all tied maxima on adversarial ties") {
    import spark.implicits._
    val dir = tempDir()
    // construct deliberate exact ties: revenue is k copies of the same
    // (price, discount) pair per supplier, so suppliers 0 and 1 tie at
    // the top — the decimal-equality join must report BOTH
    val rows =
      // suppliers 0,1: identical 3 × (1000.00, 0.10) = 2700.0000 each
      (0 until 3).flatMap(i => Seq(
        (100L + i, 0L, 1000.0, 0.10), (200L + i, 1L, 1000.0, 0.10))) ++
      // supplier 2: lower
      Seq((300L, 2L, 500.0, 0.00))
    rows.toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate",
        lit("1998-02-01").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (0L to 2L).map(s => (s, s"Supp$s")).toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")

    val out = TpchSuite2.q140.run(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L),
      s"both tied maxima must be reported, got ${out.toSeq}")
    out.foreach(r => assert(r.getDouble(2) == 2700.0))
  }

  test("Q6 superset prefilter: boundary values land identically on random cents") {
    import spark.implicits._
    val dir = tempDir()
    // discounts drawn ON the rounding boundaries (0.0449999.., 0.045,
    // 0.0749999.., 0.075) plus random cents; quantities around 23.995
    val boundary = Seq(0.0449998, 0.045, 0.0450001, 0.0749998, 0.075,
      0.0500000001, 0.07, 0.0700001)
    val rows = (0 until 400).map { i =>
      val d = if (i < boundary.length) boundary(i)
        else rnd.nextInt(1200).toDouble / 10000.0
      val q = if (i % 7 == 0) 23.995 else rnd.nextInt(5000) / 100.0
      (i.toLong, d, q, 100.0 + i)
    }
    rows.toDF("l_orderkey", "l_discount", "l_quantity", "l_extendedprice")
      .withColumn("l_shipdate", lit("1998-06-01").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val out = TpchSuite3.q148.run(spark, dir).head()
    // reference: exact decimal predicate via BigDecimal half-up
    def dec2(x: Double): BigDecimal =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val want = rows.count { case (_, d, q, _) =>
      dec2(d) >= BigDecimal("0.05") && dec2(d) <= BigDecimal("0.07") &&
        dec2(q) < BigDecimal(24) }
    assert(out.getLong(0) == want.toLong,
      s"superset prefilter clipped or admitted boundary rows: " +
        s"engine=${out.getLong(0)} reference=$want")
    assert(want > 0)
  }
}
