package graft.compile

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.ResultSet

/** SQL-text execution path (SURVEY.md §3.2) — the engine-side equivalent
  * of the reference's `POST /api/db/execute` (main.py:209-217 →
  * db_connector.py:207-257): strip trailing ';', safety-gate, execute,
  * auto-LIMIT, serialize.
  *
  * Differences by design: execution happens on Spark (not a remote DB),
  * the safety gate is command-token-based (not substring), and the LIMIT
  * injection is plan-level (`ResultLimiter`), fixing the reference's
  * substring false-positive on columns named "limit".
  */
final class QueryExecutor(spark: SparkSession) {

  /** Execute SQL text with the reference's guardrails; default result cap
    * 10 rows (main.py:66).
    */
  def execute(sql: String, limit: Int = 10): DataFrame = {
    val cleaned = sql.trim.stripSuffix(";")
    val gate = for {
      _ <- SafetyValidator.validateSql(cleaned)
      parsed = spark.sessionState.sqlParser.parsePlan(cleaned)
      _ <- SafetyValidator.validatePlan(parsed)
    } yield ()
    gate match {
      case Left(reason) => throw new IllegalArgumentException(reason)
      case Right(())    => ResultLimiter(spark.sql(cleaned), limit)
    }
  }

  /** Execute + serialize to the reference's result-set JSON shape. */
  def executeToResultSet(sql: String, limit: Int = 10): ResultSet =
    ResultSink.toResultSet(execute(sql, limit))
}

/** Result sink (SURVEY.md §2.1): rows → `[{col: serialized_value}]` +
  * row_count, mirroring `_serialize_value` (db_connector.py:259-265:
  * datetime→isoformat, Decimal→number-as-string, other non-primitives→
  * str). The boundary collect is always limit-bounded by contract.
  */
object ResultSink {

  def serializeValue(v: Any): String = v match {
    case null                        => null
    case ts: java.sql.Timestamp      => ts.toInstant.toString
    case t: java.time.Instant        => t.toString
    case t: java.time.LocalDateTime  => t.toString // TIMESTAMP_NTZ
    case d: java.sql.Date            => d.toString
    case d: java.time.LocalDate      => d.toString
    case b: Array[Byte]              => java.util.Base64.getEncoder.encodeToString(b)
    case bd: java.math.BigDecimal    => bd.toPlainString
    case bd: scala.math.BigDecimal   => bd.bigDecimal.toPlainString
    case s: scala.collection.Seq[_]  =>
      s.map(serializeValue).mkString("[", ",", "]")
    case other                       => other.toString
  }

  /** Duplicate output names get a positional suffix (`c`, `c_2`, …):
    * the row maps (and their JSON objects) are keyed by name, so
    * repeated names would silently collapse to the last value. The
    * candidate suffix is bumped until it collides with neither an
    * already-assigned name nor a REAL column later in the list —
    * columns (c, c, c_2) yield (c, c_3, c_2), not a recreated clash.
    */
  private def uniquify(raw: Seq[String]): Seq[String] = {
    val taken = scala.collection.mutable.Set.empty[String]
    val remaining = scala.collection.mutable.Map.empty[String, Int]
    raw.foreach(c => remaining(c) = remaining.getOrElse(c, 0) + 1)
    raw.map { c =>
      remaining(c) -= 1
      val name =
        if (!taken.contains(c)) c
        else Iterator.from(2).map(n => s"${c}_$n")
          .find(cand => !taken.contains(cand) &&
            remaining.getOrElse(cand, 0) == 0)
          .get
      taken += name
      name
    }
  }

  def toResultSet(df: DataFrame): ResultSet = {
    val cols = uniquify(df.columns.toSeq)
    val rows = df.collect().toSeq.map { r =>
      cols.zipWithIndex.map { case (c, i) =>
        c -> serializeValue(r.get(i))
      }.toMap
    }
    ResultSet(columns = cols, data = rows, rowCount = rows.length)
  }
}
