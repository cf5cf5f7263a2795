package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{EngineQuery, Tables}
import graft.ops.Det._

/** CSV/JSON/ORC file-source surface (SURVEY.md §2.1) proven through
  * the DRIVER GATE, not just unit round-trips: q98 writes the orders
  * table once per session to all three formats, reads each back with
  * an explicit schema (no inference — at 100 TB schema inference is a
  * full extra scan and a correctness roulette), and aggregates the
  * union. The oracle computes the same aggregate from the parquet
  * fixture once per format label — so any loss in any format's
  * round-trip (type drift, timestamp formatting, quoting) breaks the
  * hash match.
  */
object FileFormats {

  /** Read-back schema: timestamps travel as formatted strings and are
    * re-parsed explicitly — CSV/JSON have no native timestamp type.
    */
  private val readSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", StringType),
    StructField("o_orderpriority", StringType)))

  /** One-time export of orders to csv+json+orc via
    * [[graft.ops.SessionScratch]] (per-(app, sfDir) memo, dir-tagged
    * subdirs, delete-on-exit). Returns (csvPath, jsonPath, orcPath).
    */
  private def ensureWritten(
      s: SparkSession, dir: String): (String, String, String) = {
    import graft.ops.SessionScratch
    val app = s.sparkContext.applicationId
    val base = SessionScratch.base("file_formats", app)
    val tag = SessionScratch.dirTag(dir)
    val (csvPath, jsonPath, orcPath) = (s"$base/orders_csv_$tag",
      s"$base/orders_json_$tag", s"$base/orders_orc_$tag")
    SessionScratch.once("file_formats", app, dir) {
      val src = Tables(s, dir).orders.withColumn("o_orderdate",
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
      src.write.mode("overwrite").option("header", "true").csv(csvPath)
      src.write.mode("overwrite").json(jsonPath)
      src.write.mode("overwrite").orc(orcPath)
    }
    (csvPath, jsonPath, orcPath)
  }

  private def normalize(df: DataFrame, srcName: String): DataFrame =
    df.select(
      lit(srcName).as("src"),
      col("o_orderstatus"),
      col("o_orderkey"),
      dec2(col("o_totalprice")).as("price"),
      to_timestamp_ntz(col("o_orderdate"), lit("yyyy-MM-dd HH:mm:ss"))
        .as("o_orderdate"))

  val q98 = EngineQuery(
    "q98_file_source_roundtrip",
    (s, dir) => {
      val (csvPath, jsonPath, orcPath) = ensureWritten(s, dir)
      val csv = s.read.schema(readSchema).option("header", "true")
        .csv(csvPath)
      val json = s.read.schema(readSchema).json(jsonPath)
      val orc = s.read.schema(readSchema).orc(orcPath)
      normalize(csv, "csv").unionAll(normalize(json, "json"))
        .unionAll(normalize(orc, "orc"))
        .groupBy(col("src"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("n_keys"),
          toDouble(sum(col("price"))).as("total"),
          min(col("o_orderdate")).as("first_date"),
          max(col("o_orderdate")).as("last_date"))
        .orderBy(col("src"), col("o_orderstatus"))
    },
    Some("""SELECT f.src, o_orderstatus, COUNT(*) AS n,
              COUNT(DISTINCT o_orderkey) AS n_keys,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                AS total,
              MIN(o_orderdate) AS first_date,
              MAX(o_orderdate) AS last_date
            FROM orders CROSS JOIN
              (SELECT 'csv' AS src UNION ALL SELECT 'json'
               UNION ALL SELECT 'orc') f
            GROUP BY 1, 2 ORDER BY src, o_orderstatus NULLS FIRST"""))

  val all: Seq[EngineQuery] = Seq(q98)
}
