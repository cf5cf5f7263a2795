package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measured 10× scaling evidence for the RELATIONAL + layout
  * family (the round-8 verdict's remaining gap: the 32×-scale
  * checkpoint covered the documents/embeddings op matrix, but the
  * TPC-H shapes and layout ops had no point above sf0.1 because no sf1
  * fixture exists).
  *
  * Fixture synthesis AMPLIFIES the real sf0.1 tables instead of
  * generating from scratch: the fact tables (orders, lineitem) are
  * replicated `factor`× with the order keys shifted per copy (so PK/FK
  * integrity holds exactly — every copied lineitem row joins its
  * copied order), while the dimension tables are byte-copied
  * unchanged. That is precisely the 100 TB shape — facts grow, dims
  * don't — and it preserves every per-row distribution (dates,
  * statuses, prices, selectivities) of the driver fixture, so a
  * predicate that selects 2% at sf0.1 selects 2% at 10×.
  *
  * Each query runs TWICE per scale point and reports the min: the
  * layout operators (bucketed join, Z-order, zone maps) have memoized
  * ingest halves, and rep 1 carries that build — min-of-2 isolates the
  * steady-state probe the scaling claim is about (rep 1 is also
  * printed, so ingest scaling stays visible).
  *
  * Usage: runMain graft.ScaleTpch [factor]
  * Output: one JSON line per op with both points and the time ratio.
  */
object ScaleTpch {

  private def amplify(spark: SparkSession, base: String, dir: String,
      factor: Int): Unit = {
    val o = spark.read.parquet(s"$base/orders.parquet")
    val l = spark.read.parquet(s"$base/lineitem.parquet")
    val shift = o.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    val copies = spark.range(factor).select(col("id").as("_k"))
    def shifted(df: DataFrame, key: String): DataFrame =
      df.crossJoin(broadcast(copies))
        .select(df.columns.map {
          case `key` => (col(key) + col("_k") * shift).as(key)
          case c     => col(c)
        }.toSeq: _*)
    shifted(o, "o_orderkey").write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    shifted(l, "l_orderkey").write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    // dims byte-copied unchanged; events/documents/embeddings copied
    // too so Tables can resolve every path it may probe eagerly
    Seq("customer", "supplier", "part", "nation", "region",
        "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = "/root/testdata/sf0.1"
    val big = java.nio.file.Files
      .createTempDirectory(s"graft_tpch_${factor}x").toString
    System.err.println(s"[ScaleTpch] amplifying $base ${factor}x -> $big")
    amplify(spark, base, big, factor)

    // fact-dominated TPC-H shapes + the layout/pruning operators — the
    // set whose 100 TB behavior the plan audits claim and this measures
    val tpch: Seq[(String, String => DataFrame)] = Seq(
      "q130_tpch_q3_shipping_priority" ->
        (d => ops.TpchSuite.q130.run(spark, d)),
      "q133_tpch_q18_large_orders" ->
        (d => ops.TpchSuite.q133.run(spark, d)),
      "q134_tpch_q4_priority_check" ->
        (d => ops.TpchSuite.q134.run(spark, d)),
      "q138_tpch_q17_small_qty" ->
        (d => ops.TpchSuite2.q138.run(spark, d)),
      "q144_tpch_q16_supplier_diversity" ->
        (d => ops.TpchSuite2.q144.run(spark, d)),
      "q145_tpch_q21_waiting_supplier" ->
        (d => ops.TpchSuite2.q145.run(spark, d)),
      "q146_tpch_q1_pricing_summary" ->
        (d => ops.TpchSuite3.q146.run(spark, d)),
      "q148_tpch_q6_forecast_revenue" ->
        (d => ops.TpchSuite3.q148.run(spark, d)),
      "q150_tpch_q9_product_profit" ->
        (d => ops.TpchSuite3.q150.run(spark, d)),
      "q151_tpch_q20_promo_suppliers" ->
        (d => ops.TpchSuite3.q151.run(spark, d)),
      "q88_bucketed_colocated_join" ->
        (d => ops.Layout.q88.run(spark, d)),
      "q106_dynamic_partition_pruning" ->
        (d => ops.Layout.q106.run(spark, d)),
      "q120_zonemap_skipping" ->
        (d => ops.Layout.q120.run(spark, d)),
      "q121_bloom_join_pruning" ->
        (d => ops.Layout.q121.run(spark, d)),
      "q162_zorder_2d_skipping" ->
        (d => ops.Layout.q162.run(spark, d)))

    val pts = Seq(1 -> base, factor -> big)
    pts.foreach { case (_, d) =>
      spark.read.parquet(s"$d/lineitem.parquet").count()
      spark.read.parquet(s"$d/orders.parquet").count()
    }
    tpch.foreach { case (name, run) =>
      val res = pts.map { case (f, d) =>
        val samples = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          run(d).count()
          val sec = (System.nanoTime() - t0) / 1e9
          ops.SessionScratch.evictTransients()
          sec
        }
        (f, samples.min, samples.head)
      }
      val (_, t1, i1) = res.head
      val (_, t2, i2) = res.last
      println(f"""{"op":"$name","factor":$factor,"sec_sf01":$t1%.2f,""" +
        f""""sec_big":$t2%.2f,"time_ratio":${t2 / t1}%.2f,""" +
        f""""ingest_sf01":$i1%.2f,"ingest_big":$i2%.2f}""")
    }
    spark.stop()
  }
}
