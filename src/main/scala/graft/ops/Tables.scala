package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's Parquet fixture tables (TESTDATA.md).
  *
  * Mirrors the reference's catalog surface (db_connector.py:90-176 exposes
  * named tables); here the "catalog" is a directory of Parquet files. All
  * reads go through `spark.read.parquet` so Catalyst gets predicate
  * pushdown + column pruning for free — at 100 TB these scans are the
  * dominant cost and must prune at the source.
  *
  * Relation construction is memoized per (application, dir, table) —
  * optimization r15: `spark.read.parquet` performs driver-side file
  * listing + footer schema inference on EVERY call, and every gate
  * builds its tables fresh, so a 236-query bench pass paid that
  * constant ~10-60 ms per table reference (profiled: q84's
  * registerAll-then-aggregate spent 0.67 s of a 0.78 s wall on the
  * driver with 0.05 s of task time). A production engine holds exactly
  * this in its catalog/metastore relation cache. The cached object is
  * the immutable logical relation; fixture dirs are write-once, so the
  * captured file listing cannot go stale.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = {
    // the nanos conf must be in force when the EVENTS relation is
    // first built (schema inference reads the footer then) — with the
    // cache, "first" may be a raw table("events") (Bench's warmup)
    // rather than the converting loader below, so set it here too
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // keyed by SESSION, not application: a Dataset pins the session
    // that created it, so a cross-session cache would silently route
    // a sibling session's queries (and temp views) through the first
    // session's conf — DeterminismSpec's different-shuffle-partitioning
    // sibling caught exactly that. Each session still amortizes its
    // own listing/footer work across every gate it runs.
    Tables.relCache.getOrElseUpdate((spark, dir, name),
      spark.read.parquet(s"$dir/$name.parquet"))
  }

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** `events.ts` varies across driver fixture generations: parquet
    * TIMESTAMP(NANOS) (Spark's vectorized reader rejects it — read
    * nanos as long via the legacy conf and truncate) or
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (inferred TIMESTAMP_NTZ —
    * reinterpret in the UTC session zone). Both normalize to the same
    * micros TimestampType instants DuckDB produces natively, so oracle
    * comparisons agree regardless of which generation is on disk.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        // The NTZ→instant cast reinterprets the naive value in the
        // SESSION zone; oracle agreement with DuckDB's naive read
        // requires that zone to be UTC. Every in-repo entry point sets
        // it — fail loudly (instead of silently shifting every events
        // instant) for a caller that doesn't (r6 advice).
        require(
          spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "Tables.events requires spark.sql.session.timeZone=UTC: the " +
            "TIMESTAMP_NTZ fixture is reinterpreted in the session zone " +
            "and any other zone silently shifts every instant")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Register every fixture table as a temp view for `spark.sql` paths.
    * `events` goes through its converting loader (nanos timestamps).
    * Skipped when this session's views already point at `dir`
    * (optimization r15): Tables.scala is the ONLY view registrar
    * (grep-verified), so re-registration is pure re-work unless the
    * dir changed — a session alternating fixture dirs (the spec suites)
    * still re-registers on every switch.
    */
  def registerAll(): Unit =
    if (!Tables.registered.get(spark).contains(dir)) {
      Tables.names.foreach { n =>
        val df = if (n == "events") events else table(n)
        df.createOrReplaceTempView(n)
      }
      Tables.registered.put(spark, dir)
      ()
    }
}

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** (session, dir, table) → relation. Bounded: |sessions|·|dirs|·
    * |tables| per JVM (a handful of each even across a spec run).
    * SparkSession does not override equals, so the key is session
    * IDENTITY — see the session-pinning note in [[Tables.table]].
    */
  private val relCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]

  /** Which dir each session's temp views currently point at. Keyed by
    * session identity (SparkSession does not override equals); entries
    * live as long as the JVM — sessions per JVM are O(suites), so this
    * cannot grow unboundedly.
    */
  private val registered = scala.collection.concurrent.TrieMap
    .empty[SparkSession, String]
}
