package graft.model

/** Engine IR — Scala case classes mirroring the reference's JSON contracts
  * (SURVEY.md §1, §3). Pure data, no Spark dependency.
  */

/** Column descriptor (db_connector.py:129-141; sample_metadata.py:15-20). */
final case class ColumnModel(
    name: String,
    dataType: String,
    nullable: Boolean = true,
    description: String = "",
    primaryKey: Boolean = false,
    foreignKey: Option[String] = None) // "table.column"

/** Table descriptor (db_connector.py:146-150). */
final case class TableModel(
    name: String,
    description: String = "",
    columns: Seq[ColumnModel] = Nil) {
  def pkColumns: Seq[String] = columns.filter(_.primaryKey).map(_.name)
}

/** Catalog constraints (sample_metadata.py:76-80, 158-162;
  * db_connector.py:162-166): soft-delete rule, valid status values,
  * mandatory filters the compiler must inject on every scan.
  */
final case class Constraints(
    softDeleteRule: Option[String] = None,
    validStatusValues: Map[String, Seq[String]] = Map.empty,
    mandatoryFilters: Seq[String] = Nil)

/** Whole-catalog model (db_connector.py:155-167 JSON shape).
  * `relationships` are "a.col -> b.col" FK edges — the join graph.
  */
final case class CatalogModel(
    dbType: String,
    dbVersion: String = "",
    tables: Seq[TableModel] = Nil,
    relationships: Seq[Relationship] = Nil,
    constraints: Constraints = Constraints()) {
  def table(name: String): Option[TableModel] = tables.find(_.name == name)
}

/** One FK edge of the join graph (db_connector.py:124-126). */
final case class Relationship(
    fromTable: String, fromColumn: String,
    toTable: String, toColumn: String) {
  /** Reference string form: "orders.user_id -> users.id". */
  def render: String = s"$fromTable.$fromColumn -> $toTable.$toColumn"
}

object Relationship {
  private val Edge = """\s*(\w+)\.(\w+)\s*(?:->|→)\s*(\w+)\.(\w+)\s*""".r
  def parse(s: String): Option[Relationship] = s match {
    case Edge(ft, fc, tt, tc) => Some(Relationship(ft, fc, tt, tc))
    case _ => None
  }
}

/** Declarative query IR — the demo planner's implicit plan
  * (sql_generator.py:271-281) generalized: scan → joins → filter →
  * group/agg → having → sort → limit. The compiler turns this into a
  * DataFrame plan; Catalyst does the rest.
  */
final case class QuerySpec(
    table: String,
    select: Seq[String] = Nil,                    // empty = all columns
    filters: Seq[String] = Nil,                   // SQL boolean expressions
    joins: Seq[JoinSpec] = Nil,
    groupBy: Seq[String] = Nil,
    aggregates: Seq[AggSpec] = Nil,
    having: Option[String] = None,
    orderBy: Seq[OrderSpec] = Nil,
    limit: Option[Int] = None)

final case class JoinSpec(
    table: String,
    on: String,                                   // SQL join condition
    joinType: String = "inner",
    alias: Option[String] = None)                 // needed for self-joins

final case class AggSpec(expr: String, alias: String)

final case class OrderSpec(expr: String, ascending: Boolean = true)

/** ETL pipeline spec (sql_generator.py:40-49, 296-311). */
final case class EtlSpec(
    extract: ExtractSpec,
    transform: Seq[TransformStep] = Nil,
    load: LoadSpec)

final case class ExtractSpec(sourceTables: Seq[String], conditions: Seq[String] = Nil)

/** Named transform steps — the demo pipeline's steps
  * (sql_generator.py:302-306): null-default handling, date
  * standardization, type validation — plus a free-form expression step.
  */
sealed trait TransformStep
object TransformStep {
  /** "NULL 값 기본값 처리" — fill nulls with defaults per column. */
  final case class NullDefault(defaults: Map[String, String]) extends TransformStep
  /** "날짜 형식 표준화" — standardize a date/timestamp column to a format. */
  final case class DateStandardize(column: String, format: String = "yyyy-MM-dd")
      extends TransformStep
  /** "데이터 타입 검증" — cast + drop rows failing the cast. */
  final case class TypeValidate(column: String, toType: String) extends TransformStep
  /** Derived column from a SQL expression. */
  final case class Derive(alias: String, expr: String) extends TransformStep
  /** Filter rows by a SQL predicate. */
  final case class FilterRows(predicate: String) extends TransformStep

  /** Reference wire name of a step (sql_generator.py:302-306); the
    * typed extensions render with a readable prefix.
    */
  def wireName(s: TransformStep): String = s match {
    case _: NullDefault     => "NULL 값 기본값 처리"
    case _: DateStandardize => "날짜 형식 표준화"
    case _: TypeValidate    => "데이터 타입 검증"
    case Derive(a, e)       => s"derive $a = $e"
    case FilterRows(p)      => s"filter $p"
  }
}

/** Load target (sql_generator.py:46: "append_OR_overwrite").
  * `partitionBy` extends the reference contract for scale: a 100 TB
  * overwrite target must be partitioned so a re-run replaces only the
  * partitions it produced (dynamic partition overwrite), never the
  * whole table.
  */
final case class LoadSpec(targetTable: String, writeMode: String,
    partitionBy: Seq[String] = Nil)

/** Shared JSON rendering for the wire-contract serializers — field
  * names and shapes are the reference's HTTP response contract, so the
  * escaping and array forms live in one place.
  */
private[model] object Json {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
  def arr(xs: Seq[String]): String = xs.map(quote).mkString("[", ",", "]")
}

/** NL→plan result contract (sql_generator.py:27-35; main.py:41-50). */
final case class GenerateResult(
    intentSummary: String,
    sql: String,
    assumptions: Seq[String] = Nil,
    safetyNotes: Seq[String] = Nil,
    tablesUsed: Seq[String] = Nil,
    isBlocked: Boolean = false,
    blockReason: Option[String] = None,
    etlPipeline: Option[EtlSpec] = None) {

  /** Render to the reference's exact response field names (main.py:
    * 41-50, snake_case). The etl_pipeline member mirrors
    * sql_generator.py:296-311: extract.conditions is a single string,
    * transform steps serialize as their reference step names, and the
    * key is ABSENT (not null) when no pipeline was requested.
    */
  def toJsonString: String = {
    import Json._
    val base = Seq(
      s""""intent_summary": ${quote(intentSummary)}""",
      s""""sql": ${quote(sql)}""",
      s""""assumptions": ${arr(assumptions)}""",
      s""""safety_notes": ${arr(safetyNotes)}""",
      s""""tables_used": ${arr(tablesUsed)}""",
      s""""is_blocked": $isBlocked""",
      s""""block_reason": ${blockReason.map(quote).getOrElse("null")}""")
    val etl = etlPipeline.map { e =>
      val ex = s""""extract": {"source_tables": ${arr(e.extract.sourceTables)},""" +
        s""" "conditions": ${quote(e.extract.conditions.mkString(" AND "))}}"""
      val tr = s""""transform": ${arr(e.transform.map(TransformStep.wireName))}"""
      val ld = s""""load": {"target_table": ${quote(e.load.targetTable)},""" +
        s""" "write_mode": ${quote(e.load.writeMode)}}"""
      s""""etl_pipeline": {$ex, $tr, $ld}"""
    }
    (base ++ etl).mkString("{", ", ", "}")
  }
}

/** Result-set JSON contract (db_connector.py:238-243). */
final case class ResultSet(
    columns: Seq[String],
    data: Seq[Map[String, String]],
    rowCount: Int) {

  /** Render to the reference's exact JSON field names: {"success": true,
    * "columns": [...], "data": [{col: val}...], "row_count": N}.
    */
  def toJsonString: String = {
    import Json.quote
    val cols = Json.arr(columns)
    val rows = data.map { row =>
      columns.map { c =>
        val v = row.getOrElse(c, null)
        s"${quote(c)}: ${if (v == null) "null" else quote(v)}"
      }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    s"""{"success": true, "columns": $cols, "data": $rows, "row_count": $rowCount}"""
  }
}
