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
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

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
    */
  def registerAll(): Unit = Tables.names.foreach { n =>
    val df = if (n == "events") events else table(n)
    df.createOrReplaceTempView(n)
  }
}

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}
