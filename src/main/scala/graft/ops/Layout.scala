package graft.ops

import org.apache.spark.sql.functions._

import graft.functions.TimeOfDay
import Det._

/** Physical-layout and type-surface operators:
  *
  *  - q88 proves the 100 TB fact⋈fact layout claim (SCALING.md "Joins"):
  *    bucketing both sides by the join key makes the join co-located —
  *    zero shuffle below the join (asserted by ExplainAudit/BucketingSpec,
  *    result checked by the oracle against the plain unbucketed join).
  *  - q89 closes SURVEY.md §1.2's TIME-type gap through the gate: the
  *    reference's MySQL schema has TIME columns (sample_metadata.py:
  *    120-121), Spark has no TIME type, so the engine carries "HH:mm:ss"
  *    strings + TimeOfDay arithmetic — checked against DuckDB's native
  *    TIME type.
  */
object Layout {

  /** One-time bucketed ingest via [[SessionScratch]]: memoized per
    * (application, sfDir), dir-tagged table names + paths so different
    * sf dirs coexist in one session, appId-scoped path so concurrent
    * JVMs can't race, scratch deleted on JVM exit. The write stands in
    * for the load-time layout decision: production pays it once at
    * ingest, every subsequent fact⋈fact join on the key is
    * exchange-free. Returns the (orders, lineitem) table names.
    */
  private def ensureBucketTables(
      s: org.apache.spark.sql.SparkSession, dir: String): (String, String) = {
    val app = s.sparkContext.applicationId
    val tag = SessionScratch.dirTag(dir)
    val (ot, lt) = (s"gb_orders_$tag", s"gb_lineitem_$tag")
    SessionScratch.once("bucket_tables", app, dir) {
      val wh = SessionScratch.base("bucket_tables", app)
      val t = Tables(s, dir)
      // external path + explicit drop: a managed table's location
      // outlives the in-memory catalog across JVMs, which would make a
      // fresh session's CREATE fail on the leftover directory
      s.sql(s"DROP TABLE IF EXISTS $ot")
      s.sql(s"DROP TABLE IF EXISTS $lt")
      t.orders.select(col("o_orderkey"), col("o_orderstatus"))
        .write.mode("overwrite")
        .bucketBy(16, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/$ot")
        .saveAsTable(ot)
      t.lineitem
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_quantity"))
        .write.mode("overwrite")
        .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/$lt")
        .saveAsTable(lt)
    }
    (ot, lt)
  }

  /** Bucketed co-located fact⋈fact join over the memoized bucket
    * tables — the timed query is the join + agg only. The merge hint
    * pins SortMergeJoin so the plan shape is stable regardless of
    * broadcast thresholds.
    */
  val q88 = EngineQuery(
    "q88_bucketed_colocated_join",
    (s, dir) => {
      val (gbOrders, gbLineitem) = ensureBucketTables(s, dir)
      s.table(gbLineitem)
        .join(s.table(gbOrders).hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
          toDouble(sum(dec2(col("l_extendedprice")))).as("sum_price"),
          toDouble(sum(dec2(col("l_quantity")))).as("sum_qty"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n_items,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                AS sum_price,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                AS sum_qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderstatus ORDER BY o_orderstatus NULLS FIRST"""))

  /** TIME-of-day arithmetic over event timestamps: string round-trip,
    * seconds-since-midnight, and wrap-aware distance to a fixed shift
    * end (17:30) — the check_in/check_out computations the reference's
    * HR schema implies. Oracle exercises DuckDB's native TIME type.
    */
  val q89 = EngineQuery(
    "q89_time_of_day",
    (s, dir) => {
      val t = Tables(s, dir)
      val tstr = date_format(col("ts"), "HH:mm:ss")
      t.events.select(
        col("event_id"),
        tstr.as("t_str"),
        TimeOfDay.toSeconds(tstr).as("secs"),
        TimeOfDay.fromSeconds(TimeOfDay.toSeconds(tstr)).as("t_back"),
        TimeOfDay.diffSeconds(tstr, lit("17:30:00")).as("to_shift_end"))
        .orderBy(col("event_id"))
    },
    Some("""WITH s AS (
              SELECT event_id,
                strftime(ts, '%H:%M:%S') AS t_str,
                CAST(FLOOR(EXTRACT(epoch FROM CAST(ts AS TIME))) AS INT)
                  AS secs
              FROM events
            )
            SELECT event_id, t_str, secs,
              CAST(make_time(secs//3600, (secs%3600)//60, secs%60)
                AS VARCHAR) AS t_back,
              CAST((63000 - secs + 86400) % 86400 AS INT) AS to_shift_end
            FROM s ORDER BY event_id"""))

  /** One-time partition-layout ingest via [[SessionScratch]]: orders
    * re-written partitioned by order year (the load-time layout the
    * reference's date-filtered reports imply), plus a small year-dim
    * parquet carrying an attribute (`parity`) that only exists dim-side
    * — so nothing about the fact scan can be pruned statically.
    */
  private def ensurePartitionedOrders(
      s: org.apache.spark.sql.SparkSession, dir: String): (String, String) = {
    val app = s.sparkContext.applicationId
    val tag = SessionScratch.dirTag(dir)
    val base = SessionScratch.base("dpp_tables", app)
    val (factPath, dimPath) = (s"$base/po_orders_$tag", s"$base/year_dim_$tag")
    SessionScratch.once("dpp_tables", app, dir) {
      val t = Tables(s, dir)
      t.orders.withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(factPath)
      t.orders.select(year(col("o_orderdate")).as("y")).distinct()
        .select(col("y"), (col("y") % 2).as("parity"))
        .write.mode("overwrite").parquet(dimPath)
    }
    (factPath, dimPath)
  }

  /** Dynamic partition pruning — the 100 TB scan-avoidance lever: the
    * fact is laid out partitioned by year, the selective filter lives on
    * the year dim, and Catalyst inserts a runtime pruning subquery so
    * only matching fact PARTITIONS are read (asserted by ExplainAudit:
    * the scan's PartitionFilters carries a dynamicpruning expression).
    * With a static filter this would be ordinary partition pruning; the
    * point here is that the filter is only discoverable through the
    * join. Oracle = the same aggregate over the unpartitioned table.
    */
  val q106 = EngineQuery(
    "q106_dynamic_partition_pruning",
    (s, dir) => {
      val (factPath, dimPath) = ensurePartitionedOrders(s, dir)
      val fact = s.read.parquet(factPath)
      val dim = s.read.parquet(dimPath).filter(col("parity") === 1)
      fact.join(dim, col("o_year") === col("y"))
        .groupBy(col("o_year"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          toDouble(sum(dec2(col("o_totalprice")))).as("revenue"))
        .orderBy(col("o_year"), col("o_orderstatus"))
    },
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderstatus,
              COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                AS revenue
            FROM orders WHERE year(o_orderdate) % 2 = 1
            GROUP BY 1, 2 ORDER BY o_year, o_orderstatus NULLS FIRST"""))

  /** One-time zone-mapped ingest via [[SessionScratch]]: orders
    * range-sorted by o_orderkey into ~12 files, so each file covers a
    * narrow key range — the layout that makes file-level min/max stats
    * (zone maps) selective.
    */
  private def ensureZonedOrders(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val app = s.sparkContext.applicationId
    val tag = SessionScratch.dirTag(dir)
    val path = s"${SessionScratch.base("zonemap_tables", app)}/zm_orders_$tag"
    SessionScratch.once("zonemap_tables", app, dir) {
      Tables(s, dir).orders
        .repartitionByRange(12, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey"))
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Zone-map (min/max manifest) file skipping over the zoned layout:
    * (files selected by the manifest, total files). Exposed for
    * BucketingSpec's skipping assertion.
    */
  private[graft] def zoneMapPrune(s: org.apache.spark.sql.SparkSession,
      dir: String, lo: Long, hi: Long): (Seq[String], Int) = {
    import scala.jdk.CollectionConverters._
    val path = ensureZonedOrders(s, dir)
    // the manifest is one row per FILE (min/max key) — the same bounded
    // metadata a table format (Delta/Iceberg) persists at commit time.
    // Read from the parquet FOOTERS (row-group statistics): O(files)
    // driver-side metadata IO, zero data pages touched.
    val conf = s.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val files = root.getFileSystem(conf).listStatus(root).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
    val manifest = files.flatMap { p =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try {
        val stats = reader.getFooter.getBlocks.asScala.toSeq.map { b =>
          val cs = b.getColumns.asScala
            .find(_.getPath.toDotString == "o_orderkey").get.getStatistics
          (cs.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            cs.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        }
        // a zero-row file has no row groups: no zone, matches nothing
        if (stats.isEmpty) None
        else Some((p.toString, stats.map(_._1).min, stats.map(_._2).max))
      } finally reader.close()
    }
    val selected = manifest
      .filter { case (_, kMin, kMax) => kMax >= lo && kMin <= hi }
      .map(_._1).toSeq
    (selected, manifest.length)
  }

  /** Data skipping via zone maps — the file-granularity twin of q106's
    * partition pruning: a per-file min/max manifest (what Delta/Iceberg
    * persist, rebuilt here from footers) prunes the file list BEFORE the
    * scan, so a selective key-range predicate reads only the files whose
    * zone overlaps. At 100 TB this is the difference between reading
    * ~1/12th of the table and all of it when partitioning doesn't match
    * the predicate column. The predicate is re-applied after the pruned
    * read (zones overlap at boundaries); the oracle is the plain filter.
    */
  val q120 = EngineQuery(
    "q120_zonemap_skipping",
    (s, dir) => {
      val (lo, hi) = (3000L, 4499L)
      val (files, _) = zoneMapPrune(s, dir, lo, hi)
      // zero overlapping zones (possible at tiny sf where the keyspace
      // ends below lo): spark.read.parquet() rejects an empty path list,
      // so fall back to the full layout — the re-applied predicate still
      // makes the result correct (empty)
      val src = if (files.isEmpty) Seq(ensureZonedOrders(s, dir)) else files
      s.read.parquet(src: _*)
        .filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          toDouble(sum(dec2(col("o_totalprice")))).as("revenue"),
          min(col("o_orderkey")).as("k_min"),
          max(col("o_orderkey")).as("k_max"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                AS revenue,
              MIN(o_orderkey) AS k_min, MAX(o_orderkey) AS k_max
            FROM orders WHERE o_orderkey BETWEEN 3000 AND 4499
            GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Morton (Z-order) interleave of two non-negative integer keys,
    * `bits` bits each: bit b of x lands at position 2b, bit b of y at
    * 2b+1. Pure shift/mask arithmetic — codegen'd builtins, and the
    * identical expression is writable in ANSI SQL. 21 bits/dim covers
    * keys to ~2M (orderkey at sf0.1 overflows 16 bits) in a 42-bit
    * code.
    */
  def zvalue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int = 21): org.apache.spark.sql.Column =
    (0 until bits).map { b =>
      (shiftright(x, b) % 2) * lit(1L << (2 * b)) +
        (shiftright(y, b) % 2) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)

  /** One-time Z-ordered ingest: orders clustered by the Morton code of
    * (o_custkey, o_orderkey) into ~12 range-partitioned files. Z-order
    * keeps BOTH dimensions locally dense per file, so per-file min/max
    * stats are selective for predicates on EITHER column — the property
    * a linear sort only gives its leading column. This is what
    * Delta/Iceberg `OPTIMIZE ZORDER BY` does at table-maintenance time.
    *
    * Each dimension is min/max-normalized to 16 bits BEFORE the
    * interleave. Raw interleaving of unequal domains degenerates: with
    * custkey ≤ 2^8 and orderkey ≤ 2^13, every code bit above 16 comes
    * from orderkey alone, the curve turns orderkey-major, and custkey
    * zones span the full range in every file (caught by BucketingSpec
    * on the raw form; production Z-order implementations normalize via
    * per-dimension range partitioning for the same reason). The min/max
    * pass is one tiny agg at layout-maintenance time — the moral
    * equivalent of the ANALYZE a table service runs before OPTIMIZE.
    */
  /** `orders` with its normalized Morton code attached — the shared
    * front half of both Z-ordered writers ([[ensureZorderedOrders]],
    * [[ensureZorderedOrdersRg]]).
    */
  /** The layout's normalization constants: per-dimension min/max of the
    * table at initial ingest — the ANALYZE output a table service
    * records next to the layout. Incremental maintenance MUST reuse the
    * recorded bounds (re-deriving them per increment would put old and
    * new files on incomparable curves, silently destroying cross-file
    * clustering).
    */
  private[graft] def zorderBounds(o: org.apache.spark.sql.DataFrame)
      : (Long, Long, Long, Long) = {
    val r = o.agg(min(col("o_custkey")), max(col("o_custkey")),
      min(col("o_orderkey")), max(col("o_orderkey"))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** Morton code under FIXED bounds. Values outside the recorded box
    * (appends grow keyspaces) saturate at the box edge — clustering
    * quality degrades gracefully at the boundary while correctness is
    * untouched, because pruning reads the REAL per-file column stats
    * from footers, never the code.
    */
  private def zvaluedUnder(o: org.apache.spark.sql.DataFrame,
      b: (Long, Long, Long, Long)): org.apache.spark.sql.DataFrame = {
    def normExpr(c: String, lo: Long, hi: Long): String =
      if (hi > lo)
        s"((least(greatest($c, $lo), $hi) - $lo) * 65535) div ${hi - lo}"
      else "0"
    o.withColumn("zv", zvalue(
      expr(normExpr("o_custkey", b._1, b._2)),
      expr(normExpr("o_orderkey", b._3, b._4)),
      bits = 16))
  }

  /** Cluster `rows` under the layout bounds into `files` Z-range files
    * at `path` — the shared writer of the initial ingest
    * (mode=overwrite) and incremental maintenance (mode=append). The
    * initial ingest RECORDS its bounds in a `_zorder_bounds` sidecar
    * (underscore-prefixed, so data readers treat it as hidden) — the
    * mechanism, not a comment, carries the reuse invariant.
    */
  private[graft] def zorderWrite(rows: org.apache.spark.sql.DataFrame,
      bounds: (Long, Long, Long, Long), path: String, files: Int,
      mode: String): Unit = {
    zvaluedUnder(rows, bounds)
      .repartitionByRange(files, col("zv"))
      .sortWithinPartitions(col("zv"))
      .drop("zv")
      .write.mode(mode).parquet(path)
    if (mode == "overwrite") {
      // the sidecar write is ATOMIC (write-to-temp + rename): a crash
      // between the parquet overwrite and a direct sidecar write would
      // leave a layout zorderMaintain can never maintain — with the
      // rename, the sidecar either exists complete or not at all, and
      // recordedBounds reports the missing-sidecar case descriptively
      val conf = rows.sparkSession.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path, "_zorder_bounds")
      val tmp = new org.apache.hadoop.fs.Path(path,
        s"._zorder_bounds.tmp.${java.util.UUID.randomUUID()}")
      val fs = p.getFileSystem(conf)
      val out = fs.create(tmp, true)
      try out.write(
        s"${bounds._1},${bounds._2},${bounds._3},${bounds._4}"
          .getBytes("UTF-8"))
      finally out.close()
      fs.delete(p, false)
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(
          s"zorderWrite: failed to publish bounds sidecar at $p")
    }
  }

  /** The normalization bounds recorded at the layout's initial ingest. */
  private[graft] def recordedBounds(s: org.apache.spark.sql.SparkSession,
      path: String): (Long, Long, Long, Long) = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path, "_zorder_bounds")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p))
      throw new IllegalStateException(
        s"Z-order layout at $path has no _zorder_bounds sidecar — the " +
          "layout was not created by zorderWrite(overwrite) or its " +
          "initial ingest did not complete. Incremental maintenance " +
          "cannot proceed without the recorded normalization bounds " +
          "(re-deriving them would put old and new files on " +
          "incomparable curves); rebuild the layout from scratch.")
    val in = fs.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val Array(a, b, c, d) = txt.trim.split(",").map(_.toLong)
    (a, b, c, d)
  }

  /** OPTIMIZE-on-append (incremental Z-order maintenance): cluster ONLY
    * the newly-arrived rows under the layout's RECORDED bounds (read
    * back from the sidecar — re-deriving bounds from the grown table
    * would put old and new files on incomparable curves) and append
    * the resulting Z-ranged files — never rewriting the base layout.
    * At 100 TB appends arrive continuously and a full rebuild per
    * maintenance window re-writes the whole table; clustering the
    * delta alone is the lever (Delta/Iceberg's incremental OPTIMIZE
    * ZORDER shape). The manifest needs NO merge step: it is DERIVED
    * from parquet footers at listing time ([[zorderManifestAt]]), so
    * appended files join it on the next prune. BucketingSpec proves
    * base + append + maintain answers the q162 probe identically to a
    * full rebuild, reading a strict file subset, with base files
    * untouched.
    */
  private[graft] def zorderMaintain(newRows: org.apache.spark.sql.DataFrame,
      path: String, files: Int): Unit =
    zorderWrite(newRows,
      recordedBounds(newRows.sparkSession, path), path, files, "append")

  private def zvaluedOrders(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val o = Tables(s, dir).orders
    zvaluedUnder(o, zorderBounds(o))
  }

  private def ensureZorderedOrders(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val app = s.sparkContext.applicationId
    val tag = SessionScratch.dirTag(dir)
    val path = s"${SessionScratch.base("zorder_tables", app)}/zo_orders_$tag"
    SessionScratch.once("zorder_tables", app, dir) {
      val o = Tables(s, dir).orders
      zorderWrite(o, zorderBounds(o), path, files = 12, mode = "overwrite")
    }
    path
  }

  /** Per-file (custkey, orderkey) min/max manifest of the Z-ordered
    * layout + the file subset overlapping the given ranges (None = no
    * bound on that dimension). Footer-stats metadata IO only — the same
    * bounded manifest contract as [[zoneMapPrune]]. Exposed for
    * BucketingSpec's both-dimension skipping assertions.
    */
  private[graft] def zorderPrune(s: org.apache.spark.sql.SparkSession,
      dir: String, cust: Option[(Long, Long)], ord: Option[(Long, Long)])
      : (Seq[String], Int, (Long, Long, Long, Long)) =
    zorderManifestAt(s, ensureZorderedOrders(s, dir), cust, ord)

  /** The file-level manifest + prune over an EXPLICIT layout path —
    * incremental maintenance relies on this being footer-derived: a
    * freshly appended file enters the manifest on the next listing with
    * no merge/compaction bookkeeping.
    */
  private[graft] def zorderManifestAt(s: org.apache.spark.sql.SparkSession,
      path: String, cust: Option[(Long, Long)], ord: Option[(Long, Long)])
      : (Seq[String], Int, (Long, Long, Long, Long)) = {
    import scala.jdk.CollectionConverters._
    val conf = s.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val files = root.getFileSystem(conf).listStatus(root).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
    def colStats(b: org.apache.parquet.hadoop.metadata.BlockMetaData,
        name: String): (Long, Long) = {
      val cs = b.getColumns.asScala
        .find(_.getPath.toDotString == name).get.getStatistics
      (cs.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
        cs.genericGetMax.asInstanceOf[java.lang.Long].longValue())
    }
    val manifest = files.flatMap { p =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        if (blocks.isEmpty) None
        else {
          val c = blocks.map(colStats(_, "o_custkey"))
          val k = blocks.map(colStats(_, "o_orderkey"))
          Some((p.toString, c.map(_._1).min, c.map(_._2).max,
            k.map(_._1).min, k.map(_._2).max))
        }
      } finally reader.close()
    }
    val global = (manifest.map(_._2).min, manifest.map(_._3).max,
      manifest.map(_._4).min, manifest.map(_._5).max)
    val selected = manifest.filter { case (_, cMin, cMax, kMin, kMax) =>
      cust.forall { case (lo, hi) => cMax >= lo && cMin <= hi } &&
        ord.forall { case (lo, hi) => kMax >= lo && kMin <= hi }
    }.map(_._1).toSeq
    (selected, manifest.length, global)
  }

  /** One row group's zone in the row-group-granularity manifest:
    * `rowStart` is the group's first row position within its file (the
    * value `_metadata.row_index` carries for that row), so a (file,
    * rowStart, rows) triple addresses the group through public Spark
    * surface.
    */
  final case class RowGroupZone(file: String, rg: Int, rowStart: Long,
      rows: Long, cMin: Long, cMax: Long, kMin: Long, kMax: Long)

  /** The Z-ordered layout written so each FILE holds several row groups
    * at fixture scale: 2 range partitions with a small parquet block
    * size. At production scale the DEFAULT 128 MB block gives the same
    * multi-group shape for free (a 1 GB file carries ~8 row groups) —
    * the small block here only reproduces that shape on a 60 kB
    * fixture. Same normalize+interleave+sort as [[ensureZorderedOrders]],
    * so row groups are contiguous Z-ranges and their per-column min/max
    * stats are selective on BOTH dimensions.
    */
  private[graft] def ensureZorderedOrdersRg(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val app = s.sparkContext.applicationId
    val tag = SessionScratch.dirTag(dir)
    val path =
      s"${SessionScratch.base("zorder_rg_tables", app)}/zo_orders_rg_$tag"
    SessionScratch.once("zorder_rg_tables", app, dir) {
      zvaluedOrders(s, dir)
        .repartitionByRange(2, col("zv"))
        .sortWithinPartitions(col("zv"))
        .drop("zv")
        .write.mode("overwrite")
        .option("parquet.block.size", 4096)
        .option("parquet.page.size", 1024)
        .parquet(path)
    }
    path
  }

  /** Row-group-granularity Z-order skipping (r6 verdict #6): the q162
    * manifest prunes whole FILES, but parquet footers already carry
    * per-ROW-GROUP min/max — at 100 TB with multi-GB files, row-group
    * skipping inside partially-overlapping files is the lever that
    * matters (an 8-row-group file whose zone brushes the predicate
    * still reads 7/8ths less). Returns (selected, all) row-group zones
    * for the given per-dimension ranges — footer metadata IO only, the
    * same bounded-manifest contract as [[zoneMapPrune]]/[[zorderPrune]].
    * This is exactly what Spark's own parquet reader does with a pushed
    * predicate (filter → row-group stats → skip); the manifest form
    * exposes it to EXTERNAL fetch planning, and BucketingSpec proves the
    * stats math: a strict subset of row groups selected on either
    * dimension alone, with every matching row inside the selection
    * (via `_metadata.row_index` against each group's row span).
    */
  private[graft] def zorderRowGroupManifest(
      s: org.apache.spark.sql.SparkSession, dir: String,
      cust: Option[(Long, Long)], ord: Option[(Long, Long)])
      : (Seq[RowGroupZone], Seq[RowGroupZone]) = {
    import scala.jdk.CollectionConverters._
    val path = ensureZorderedOrdersRg(s, dir)
    val conf = s.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val files = root.getFileSystem(conf).listStatus(root).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
    def colStats(b: org.apache.parquet.hadoop.metadata.BlockMetaData,
        name: String): (Long, Long) = {
      val cs = b.getColumns.asScala
        .find(_.getPath.toDotString == name).get.getStatistics
      (cs.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
        cs.genericGetMax.asInstanceOf[java.lang.Long].longValue())
    }
    val zones = files.toSeq.sortBy(_.toString).flatMap { p =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        var rowStart = 0L
        blocks.zipWithIndex.map { case (b, i) =>
          val (cMin, cMax) = colStats(b, "o_custkey")
          val (kMin, kMax) = colStats(b, "o_orderkey")
          val z = RowGroupZone(p.toUri.getPath, i, rowStart, b.getRowCount,
            cMin, cMax, kMin, kMax)
          rowStart += b.getRowCount
          z
        }
      } finally reader.close()
    }
    val selected = zones.filter { z =>
      cust.forall { case (lo, hi) => z.cMax >= lo && z.cMin <= hi } &&
        ord.forall { case (lo, hi) => z.kMax >= lo && z.kMin <= hi }
    }
    (selected, zones)
  }

  /** Z-order clustering + two-dimensional zone-map skipping: the fourth
    * scan-avoidance lever (after q106 partitions, q120 single-key zones,
    * q121 Bloom rows). The query predicate bounds BOTH o_custkey and
    * o_orderkey; the manifest prunes files on both dimensions at once,
    * which the Z-ordered layout makes selective for each — a
    * single-column sort would give selective zones on its leading
    * column only (BucketingSpec proves each single-dimension prune reads
    * a strict subset). Predicate bounds derive from the manifest's own
    * global min/max (quartile-to-half band per dimension), so the
    * selectivity tracks every sf; the oracle recomputes identical
    * bounds from the table.
    */
  val q162 = EngineQuery(
    "q162_zorder_2d_skipping",
    (s, dir) => {
      val (_, _, (cMin, cMax, kMin, kMax)) =
        zorderPrune(s, dir, None, None)
      val (cLo, cHi) = (cMin + (cMax - cMin) / 4, cMin + (cMax - cMin) / 2)
      val (kLo, kHi) = (kMin + (kMax - kMin) / 4, kMin + (kMax - kMin) / 2)
      val (files, _, _) =
        zorderPrune(s, dir, Some((cLo, cHi)), Some((kLo, kHi)))
      val src =
        if (files.isEmpty) Seq(ensureZorderedOrders(s, dir)) else files
      s.read.parquet(src: _*)
        .filter(col("o_custkey").between(cLo, cHi) &&
          col("o_orderkey").between(kLo, kHi))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          toDouble(sum(dec2(col("o_totalprice")))).as("revenue"),
          min(col("o_custkey")).as("c_min"),
          max(col("o_orderkey")).as("k_max"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH b AS (
              SELECT MIN(o_custkey) cmin, MAX(o_custkey) cmax,
                     MIN(o_orderkey) kmin, MAX(o_orderkey) kmax
              FROM orders
            ), r AS (
              SELECT cmin + (cmax - cmin) // 4 AS clo,
                     cmin + (cmax - cmin) // 2 AS chi,
                     kmin + (kmax - kmin) // 4 AS klo,
                     kmin + (kmax - kmin) // 2 AS khi
              FROM b
            )
            SELECT o_orderstatus, COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                AS revenue,
              MIN(o_custkey) AS c_min, MAX(o_orderkey) AS k_max
            FROM orders, r
            WHERE o_custkey BETWEEN r.clo AND r.chi
              AND o_orderkey BETWEEN r.klo AND r.khi
            GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Runtime Bloom-filter join pruning — the third scan-avoidance lever
    * next to q106 (partition pruning) and q120 (zone maps), covering the
    * case where the selective filter lives on the OTHER join side and
    * the layout offers nothing to prune: Catalyst builds a Bloom filter
    * from the filtered creation side and injects `might_contain(...)`
    * onto the application side's scan, so non-joining fact rows die at
    * the scan instead of riding the shuffle. At 100 TB this turns a
    * full-fact shuffle into a shuffle of the ~matching fraction.
    *
    * Runs in its own `newSession` so the demonstration thresholds
    * (application-side size floor lowered to fire at fixture scale;
    * broadcast disabled so a shuffle join exists to prune) never leak
    * into other gate queries' plans. ASSERTED in ExplainAudit: the
    * lineitem side carries a `might_contain` runtime filter.
    */
  val q121 = EngineQuery(
    "q121_bloom_join_pruning",
    (s, dir) => {
      val bs = s.newSession()
      bs.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      bs.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = Tables(bs, dir)
      t.lineitem
        .join(t.orders.filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
          toDouble(sum(dec2(col("l_extendedprice")))).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n_items,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                AS sum_price
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  val all: Seq[EngineQuery] = Seq(q88, q89, q106, q120, q121, q162)
}
