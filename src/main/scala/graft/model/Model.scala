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
}

/** Load target (sql_generator.py:46: "append_OR_overwrite").
  * `partitionBy` extends the reference contract for scale: a 100 TB
  * overwrite target must be partitioned so a re-run replaces only the
  * partitions it produced (dynamic partition overwrite), never the
  * whole table.
  */
final case class LoadSpec(targetTable: String, writeMode: String,
    partitionBy: Seq[String] = Nil)

/** NL→plan result contract (sql_generator.py:27-35; main.py:41-50). */
final case class GenerateResult(
    intentSummary: String,
    sql: String,
    assumptions: Seq[String] = Nil,
    safetyNotes: Seq[String] = Nil,
    tablesUsed: Seq[String] = Nil,
    isBlocked: Boolean = false,
    blockReason: Option[String] = None,
    etlPipeline: Option[EtlSpec] = None)

/** Result-set JSON contract (db_connector.py:238-243). */
final case class ResultSet(
    columns: Seq[String],
    data: Seq[Map[String, String]],
    rowCount: Int) {

  /** Render to the reference's exact JSON field names:
    * {"columns": [...], "data": [{col: val}...], "row_count": N}.
    */
  def toJsonString: String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val cols = columns.map(q).mkString("[", ",", "]")
    val rows = data.map { row =>
      columns.map { c =>
        val v = row.getOrElse(c, null)
        s"${q(c)}: ${if (v == null) "null" else q(v)}"
      }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    s"""{"columns": $cols, "data": $rows, "row_count": $rowCount}"""
  }
}
