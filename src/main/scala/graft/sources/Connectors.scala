package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Source connectors (SURVEY.md §2.1).
  *
  * JDBC mirrors the reference's connection contract
  * (db_connector.py:15-18, 25-80: `{db_type, host, port, database, user,
  * password}` with PostgreSQL/MySQL URL templates). Spark's JDBC source
  * then gives predicate pushdown + partitioned parallel reads
  * (`partitionColumn`/`numPartitions`) — at scale a JDBC extract is
  * parallelized across executors, never a single-connection drain.
  */
object Connectors {

  final case class JdbcConf(
      dbType: String,
      host: String,
      port: Int,
      database: String,
      user: String,
      password: String)

  /** JDBC URL per db_type — the reference's two templates
    * (db_connector.py:30-39), jdbc-scheme form.
    */
  def jdbcUrl(conf: JdbcConf): String = conf.dbType.toLowerCase match {
    case "postgresql" | "postgres" =>
      s"jdbc:postgresql://${conf.host}:${conf.port}/${conf.database}"
    case "mysql" =>
      s"jdbc:mysql://${conf.host}:${conf.port}/${conf.database}"
    case other =>
      throw new IllegalArgumentException(
        s"unsupported db_type '$other' (reference supports postgresql|mysql)")
  }

  /** Configured JDBC reader; `.option("dbtable", ...)` or a pushdown
    * `query` completes it. Parallel extract: callers add
    * partitionColumn/lowerBound/upperBound/numPartitions for a
    * range-partitioned read.
    */
  def jdbc(spark: SparkSession, conf: JdbcConf): DataFrameReader =
    jdbc(spark, jdbcUrl(conf), conf.user, conf.password)

  /** General form over an explicit JDBC URL — same reader the JdbcConf
    * overload configures, for databases outside the reference's two
    * templates. Integration-tested end-to-end against an embedded Derby
    * database (JdbcSpec): live reads, filter pushdown, and the
    * range-partitioned parallel extract.
    */
  def jdbc(spark: SparkSession, url: String, user: String,
      password: String): DataFrameReader =
    spark.read.format("jdbc")
      .option("url", url)
      .option("user", user)
      .option("password", password)

  /** Parquet directory source — the fixture/warehouse path. */
  def parquetDir(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")
}
