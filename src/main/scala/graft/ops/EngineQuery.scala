package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One engine capability exposed through the driver's correctness gate.
  *
  * @param name   stable query id (keys `SparkEntry.queries`)
  * @param run    (session, sfDir) => result DataFrame
  * @param oracle DuckDB-equivalent ANSI SQL over the same parquet tables;
  *               None for non-SQL-expressible ops (driver then records a
  *               weaker rows-only check)
  * @param bench  include in the headline benchmark set (`graft.Bench`)
  */
final case class EngineQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** Shared determinism helpers.
  *
  * The driver hash-compares our result against DuckDB executing the oracle
  * SQL on the same parquet. Floating-point aggregation is order-dependent,
  * so every money/double aggregate goes through exact DECIMAL arithmetic
  * (identical casts on both sides) and is cast to DOUBLE only at the very
  * end — both engines then produce bit-identical doubles. Every query also
  * carries a total ORDER BY over unique keys.
  */
object Det {
  val D2: DecimalType = DecimalType(18, 2)
  val D4: DecimalType = DecimalType(18, 4)
  val D6: DecimalType = DecimalType(18, 6)

  /** Exact 2-dp decimal view of a stored-as-double money column. */
  def dec2(c: Column): Column = c.cast(D2)

  /** Final boundary cast: exact decimal -> double (deterministic). */
  def toDouble(c: Column): Column = c.cast(DoubleType)
}
