package graft

import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Demonstrates the SCALING.md claim that bucketing both join sides by
  * the key makes a fact-fact join co-located: with broadcast disabled,
  * the bucketed join plan contains NO shuffle exchange.
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed fact-fact join plans with zero shuffle exchange") {
    val t = Tables(spark, sfDir)
    val wh = java.nio.file.Files.createTempDirectory("buckets").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    t.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    t.lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself reads co-located buckets: no exchange below it
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      val joinSection = plan.split("\n").dropWhile(!_.contains("SortMergeJoin"))
        .takeWhile(l => !l.contains("HashAggregate") || l.contains("SortMergeJoin"))
      assert(!joinSection.exists(_.contains("Exchange")),
        s"bucketed join should not shuffle:\n${joinSection.mkString("\n")}")
      // result still correct
      val n = joined.agg(sum(col("n"))).head().getLong(0)
      assert(n == t.lineitem.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("q88 gate query joins the bucketed facts without a shuffle") {
    val df = graft.ops.Layout.q88.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(500))
    // no exchange between the join and its bucketed scans
    val joinSection = plan.split("\n").dropWhile(!_.contains("SortMergeJoin"))
      .takeWhile(l => !l.contains("HashAggregate") || l.contains("SortMergeJoin"))
    assert(!joinSection.exists(_.contains("Exchange")),
      s"bucketed gate join should not shuffle:\n${joinSection.mkString("\n")}")
    // and the result matches the plain unbucketed join
    val want = Tables(spark, sfDir).lineitem
      .join(Tables(spark, sfDir).orders,
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q106 dynamic partition pruning SKIPS partitions at runtime, " +
      "not just in the plan") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other =>
        (other.children ++ other.subqueries).flatMap(scans)
    }
    val df = graft.ops.Layout.q106.run(spark, sfDir)
    df.collect()
    val fact = scans(df.queryExecution.executedPlan)
      .filter(_.output.exists(_.name == "o_totalprice"))
    assert(fact.nonEmpty, "no fact scan found in executed plan")
    val read = fact.map(_.metrics("numFiles").value).sum
    // odd years only: the fixture spans 7 order years, 4 are odd — a
    // static plan (no DPP) would read every partition's files
    val yearDirs = Tables(spark, sfDir).orders
      .select(year(col("o_orderdate"))).distinct().count()
    val oddYears = Tables(spark, sfDir).orders
      .select(year(col("o_orderdate")).as("y")).distinct()
      .filter(col("y") % 2 === 1).count()
    assert(oddYears < yearDirs, "fixture must have even years to skip")
    // count the ACTUAL files on disk: without pruning the scan would
    // read all of them
    val factPath = fact.head.relation.location.rootPaths.head
    val fsys = factPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Long =
      fsys.listStatus(p).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.startsWith("_")) 0L else 1L
      }.sum
    val totalFiles = walk(factPath)
    assert(read >= oddYears && read < totalFiles,
      s"files read $read should be a strict subset of $totalFiles " +
        s"(pruning to $oddYears of $yearDirs year partitions)")
    // partitions-read metric: present on partitioned scans
    val parts = fact.flatMap(_.metrics.get("numPartitions")).map(_.value).sum
    assert(parts == oddYears,
      s"partitions read $parts != odd-year count $oddYears")
  }

  test("q120 zone-map manifest prunes to a strict subset of the files") {
    // derive a ~10%-of-keyspace range from the fixture so the test holds
    // at any sf (the gate query's fixed range assumes sf0.01 keys)
    val maxKey = Tables(spark, sfDir).orders
      .agg(max(col("o_orderkey"))).head().getLong(0)
    val (lo, hi) = (maxKey / 2, maxKey / 2 + maxKey / 10)
    val (selected, total) = graft.ops.Layout.zoneMapPrune(spark, sfDir, lo, hi)
    assert(selected.nonEmpty, "key range must hit at least one zone")
    assert(selected.size < total,
      s"zone maps should skip files: selected ${selected.size} of $total")
    // the pruned read still covers every matching row
    val pruned = spark.read.parquet(selected: _*)
      .filter(col("o_orderkey").between(lo, hi)).count()
    val full = Tables(spark, sfDir).orders
      .filter(col("o_orderkey").between(lo, hi)).count()
    assert(pruned == full, s"pruned read lost rows: $pruned != $full")
  }

  test("q162 Z-order layout skips files on EITHER dimension alone") {
    import graft.ops.Layout
    // global bounds from the manifest itself (no data scan)
    val (_, total, (cMin, cMax, kMin, kMax)) =
      Layout.zorderPrune(spark, sfDir, None, None)
    // a ~quarter band on each dimension separately: BOTH must prune —
    // the Z-order property. A linear sort by custkey would leave every
    // file's orderkey zone spanning ~the full keyspace (and vice versa).
    val cBand = (cMin + (cMax - cMin) / 2, cMin + (cMax - cMin) * 3 / 4)
    val kBand = (kMin + (kMax - kMin) / 2, kMin + (kMax - kMin) * 3 / 4)
    val (byCust, t1, _) = Layout.zorderPrune(spark, sfDir, Some(cBand), None)
    val (byOrd, t2, _) = Layout.zorderPrune(spark, sfDir, None, Some(kBand))
    assert(t1 == total && t2 == total)
    assert(byCust.nonEmpty && byCust.size < total,
      s"custkey-only prune read ${byCust.size} of $total")
    assert(byOrd.nonEmpty && byOrd.size < total,
      s"orderkey-only prune read ${byOrd.size} of $total")
    // the 2D prune is the intersection's subset and loses no rows
    val (both, _, _) =
      Layout.zorderPrune(spark, sfDir, Some(cBand), Some(kBand))
    assert(both.toSet.subsetOf(byCust.toSet.intersect(byOrd.toSet)))
    val expected = Tables(spark, sfDir).orders
      .filter(col("o_custkey").between(cBand._1, cBand._2) &&
        col("o_orderkey").between(kBand._1, kBand._2)).count()
    val got =
      if (both.isEmpty) 0L
      else spark.read.parquet(both: _*)
        .filter(col("o_custkey").between(cBand._1, cBand._2) &&
          col("o_orderkey").between(kBand._1, kBand._2)).count()
    assert(got == expected, s"2D pruned read lost rows: $got != $expected")
  }

  test("Z-order row-group pruning: strict subset, no row loss, both dims") {
    import graft.ops.Layout
    // the layout under test really is multi-row-group per file —
    // otherwise this would silently degrade to the q162 file-level test
    val (_, all) = Layout.zorderRowGroupManifest(spark, sfDir, None, None)
    val perFile = all.groupBy(_.file).view.mapValues(_.size)
    assert(perFile.values.exists(_ > 1),
      s"fixture layout has one row group per file: $perFile")
    // row spans within each file are contiguous and non-overlapping
    all.groupBy(_.file).foreach { case (_, zs) =>
      val sorted = zs.sortBy(_.rowStart)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.rowStart + a.rows == b.rowStart)
      }
      assert(sorted.head.rowStart == 0L)
    }
    val (cMin, cMax) = (all.map(_.cMin).min, all.map(_.cMax).max)
    val (kMin, kMax) = (all.map(_.kMin).min, all.map(_.kMax).max)
    val cBand = (cMin + (cMax - cMin) / 2, cMin + (cMax - cMin) * 3 / 4)
    val kBand = (kMin + (kMax - kMin) / 2, kMin + (kMax - kMin) * 3 / 4)
    val path = Layout.ensureZorderedOrdersRg(spark, sfDir)
    for ((cust, ord, pred) <- Seq(
        (Some(cBand), None,
          col("o_custkey").between(cBand._1, cBand._2)),
        (None, Some(kBand),
          col("o_orderkey").between(kBand._1, kBand._2)))) {
      val (sel, tot) = Layout.zorderRowGroupManifest(spark, sfDir, cust, ord)
      assert(sel.nonEmpty && sel.size < tot.size,
        s"row-group prune selected ${sel.size} of ${tot.size}")
      // no row loss: every row matching the predicate sits inside a
      // SELECTED row group's (file, row span) — addressed through the
      // public `_metadata.row_index` surface
      val spans = sel.groupBy(_.file).view
        .mapValues(_.map(z => (z.rowStart, z.rowStart + z.rows))).toMap
      val escaped = spark.read.parquet(path)
        .filter(pred)
        .select(col("_metadata.file_path").as("f"),
          col("_metadata.row_index").as("ri"))
        .collect()
        .filterNot { r =>
          val f = new java.net.URI(r.getString(0)).getPath
          val ri = r.getLong(1)
          spans.get(f).exists(_.exists { case (a, b) => ri >= a && ri < b })
        }
      assert(escaped.isEmpty,
        s"${escaped.length} matching rows outside selected row groups, " +
          s"e.g. ${escaped.headOption}")
    }
  }

  test("incremental Z-order maintenance == full rebuild on the q162 probe") {
    import graft.ops.Layout
    val orders = Tables(spark, sfDir).orders
    // the append is interleaved through the keyspace (every 7th order)
    // — the realistic shape where new rows overlap existing Z-ranges,
    // not a clean tail partition
    val base = orders.filter(col("o_orderkey") % 7 =!= 0)
    val delta = orders.filter(col("o_orderkey") % 7 === 0)
    // bounds recorded at initial ingest (the layout's ANALYZE
    // constants); maintenance reads them back from the sidecar —
    // re-deriving per increment would put old and new files on
    // incomparable curves
    val bounds = Layout.zorderBounds(base)
    val incDir = java.nio.file.Files
      .createTempDirectory("graft_zo_inc").toString
    val fullDir = java.nio.file.Files
      .createTempDirectory("graft_zo_full").toString
    Layout.zorderWrite(base, bounds, incDir, files = 12,
      mode = "overwrite")
    assert(Layout.recordedBounds(spark, incDir) == bounds)
    val baseFiles = new java.io.File(incDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    // OPTIMIZE-on-append: cluster ONLY the delta, append its files —
    // the recorded bounds come from the sidecar, not the caller
    Layout.zorderMaintain(delta, incDir, files = 3)
    val afterFiles = new java.io.File(incDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    // base files are untouched — maintenance wrote only new files
    assert(baseFiles.subsetOf(afterFiles))
    assert(afterFiles.size > baseFiles.size)
    // the comparison layout: a full rebuild over base ∪ delta
    Layout.zorderWrite(orders, bounds, fullDir, files = 12,
      mode = "overwrite")
    // q162's probe band from the table bounds
    val (cMin, cMax, kMin, kMax) = bounds
    val cBand = (cMin + (cMax - cMin) / 4, cMin + (cMax - cMin) / 2)
    val kBand = (kMin + (kMax - kMin) / 4, kMin + (kMax - kMin) / 2)
    val pred = col("o_custkey").between(cBand._1, cBand._2) &&
      col("o_orderkey").between(kBand._1, kBand._2)
    def probe(path: String): (Long, Int, Int) = {
      val (sel, total, _) = Layout.zorderManifestAt(spark, path,
        Some(cBand), Some(kBand))
      val n =
        if (sel.isEmpty) 0L
        else spark.read.parquet(sel: _*).filter(pred).count()
      (n, sel.size, total)
    }
    val (nInc, selInc, totInc) = probe(incDir)
    val (nFull, _, _) = probe(fullDir)
    val expected = orders.filter(pred).count()
    // identical answers: incremental == full rebuild == direct scan
    assert(nInc == expected && nFull == expected,
      s"inc=$nInc full=$nFull direct=$expected")
    // and the incremental layout still SKIPS: a strict file subset
    assert(selInc < totInc,
      s"incremental layout read every file ($selInc of $totInc)")
  }

  test("zvalue Morton interleave: bit-exact reference, order locality") {
    import graft.ops.Layout
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 21).map { b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      }.sum
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L),
      (150000L, 1500L), (2097151L, 2097151L))
    val got = pts.toDF("x", "y")
      .select(Layout.zvalue(col("x"), col("y")).as("z")).collect()
      .map(_.getLong(0))
    assert(got.toSeq == pts.map { case (x, y) => ref(x, y) })
    // interleave is a bijection on the 21-bit box: distinct points map
    // to distinct codes
    assert(got.distinct.length == got.length)
  }
}
