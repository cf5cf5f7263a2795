package graft.compile

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan}

import graft.model._

/** QuerySpec → DataFrame compiler (SURVEY.md §3.1, §7.4).
  *
  * The reference delegates planning to an LLM + remote DB; our engine
  * compiles a declarative `QuerySpec` into a DataFrame logical plan and
  * lets Catalyst do predicate pushdown / column pruning / join selection.
  * Mandatory catalog filters (sample_metadata.py:76-80, 158-162) are
  * injected at scan time so every optimization below sees them.
  */
final class SpecCompiler(resolve: String => DataFrame, catalog: CatalogModel) {

  // Fail loudly at construction if a mandatory filter attaches to no
  // table at all: a soft-delete/policy predicate vanishing without
  // error would silently widen every result this compiler produces.
  locally {
    val dead = MandatoryFilters.unapplicable(catalog)
    require(dead.isEmpty,
      s"mandatory filter(s) resolve on no catalog table — " +
        s"policy constraint would be silently dropped: " +
        dead.mkString("; "))
  }

  /** Scan a table with the catalog's mandatory filters applied. The
    * scan is aliased to its table name FIRST so a qualified mandatory
    * filter ("orders.o_orderstatus != 'F'") resolves; callers may
    * re-alias on top for self-joins.
    */
  def scan(table: String): DataFrame =
    MandatoryFilters(resolve(table).as(table), table, catalog)

  def compile(spec: QuerySpec): DataFrame = {
    // every scan carries its table name (or explicit alias) so join
    // conditions may use qualified column references — required for
    // self-joins and for suggester-emitted "t1.col = t2.col" conditions
    var df = scan(spec.table).as(spec.table)

    df = spec.joins.foldLeft(df) { (acc, j) =>
      acc.join(scan(j.table).as(j.alias.getOrElse(j.table)),
        expr(j.on), j.joinType)
    }

    spec.filters.foreach(f => df = df.filter(expr(f)))

    if (spec.groupBy.nonEmpty && spec.aggregates.isEmpty)
      throw new IllegalArgumentException(
        s"invalid QuerySpec for '${spec.table}': groupBy " +
          s"(${spec.groupBy.mkString(", ")}) requires at least one aggregate")

    if (spec.groupBy.nonEmpty || spec.aggregates.nonEmpty) {
      val aggCols = spec.aggregates.map(a => expr(a.expr).as(a.alias))
      df =
        if (spec.groupBy.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
        else df.groupBy(spec.groupBy.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      spec.having.foreach(h => df = df.filter(expr(h)))
    }

    if (spec.select.nonEmpty) df = df.select(spec.select.map(expr): _*)

    if (spec.orderBy.nonEmpty) {
      val sortCols: Seq[Column] = spec.orderBy.map { o =>
        val c = expr(o.expr)
        if (o.ascending) c.asc else c.desc
      }
      df = df.orderBy(sortCols: _*)
    }

    spec.limit.foreach(n => df = df.limit(n))
    df
  }
}

object SpecCompiler {
  /** Compiler over the fixture parquet directory. */
  def forParquetDir(spark: SparkSession, dir: String,
      catalog: CatalogModel = CatalogModel(dbType = "parquet")): SpecCompiler =
    new SpecCompiler(name => spark.read.parquet(s"$dir/$name.parquet"), catalog)
}

/** Plan-level auto-LIMIT — the reference's one genuine rewrite
  * (db_connector.py:213-224): append the default cap unless the query
  * already has one. The reference checks for the substring "LIMIT"
  * (misfires on a column literally named `limit`); ours inspects the
  * logical plan, so only a real Limit node suppresses injection.
  */
object ResultLimiter {
  import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort, SubqueryAlias, WithCTE}

  /** True only when the OUTERMOST operator (through row-preserving
    * wrappers) is a Limit. Recursing into all children would let a LIMIT
    * inside a subquery suppress the outer cap — and then the bounded
    * result-sink collect becomes unbounded.
    */
  def hasLimit(plan: LogicalPlan): Boolean = plan match {
    case _: GlobalLimit | _: LocalLimit => true
    case p: Project       => hasLimit(p.child)
    case s: Sort          => hasLimit(s.child)
    case a: SubqueryAlias => hasLimit(a.child)
    case w: WithCTE       => hasLimit(w.plan)
    case _                => false
  }

  def apply(df: DataFrame, defaultLimit: Int = 10): DataFrame =
    if (hasLimit(df.queryExecution.logical)) df else df.limit(defaultLimit)
}

/** Catalog-constraint injection (SURVEY.md §4): every scan of a table with
  * `mandatory_filters` gets those predicates appended — the engine-side
  * equivalent of the prompt-time soft-delete hints
  * (sample_metadata.py:76-80: "is_deleted = false";
  * :158-162: "status != 'resigned'").
  *
  * Injected at spec-compile time (before Catalyst) so the predicates push
  * down into the source scan like any user filter.
  */
object MandatoryFilters {
  /** One lexical reference in a predicate: optional qualifier, name, and
    * whether a '(' follows (= function call, not a column reference).
    */
  private val Ref =
    """([A-Za-z_][A-Za-z0-9_]*)(\s*\.\s*([A-Za-z_][A-Za-z0-9_]*))?(\s*\()?""".r

  /** Words that appear in predicate text without being column references
    * — never matched against the table's columns.
    */
  private val sqlKeywords = Set(
    "and", "or", "not", "is", "null", "true", "false", "in", "like",
    "between", "exists", "case", "when", "then", "else", "end")

  /** Column references of a filter: (qualifier, column) pairs with
    * string literals, function-call names (`coalesce(`, `year(`), and
    * keywords stripped. `t.col` keeps its qualifier so it can be matched
    * against the table it names.
    */
  private def columnRefs(filter: String): Seq[(Option[String], String)] = {
    // strip string literals, then numeric literals: without the second
    // strip the exponent of scientific notation ("1e6") parses as a
    // column reference "e6" that resolves on no table
    val noLiterals = filter.replaceAll("'(?:[^']|'')*'", " ")
      .replaceAll("\\b[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?", " ")
    Ref.findAllMatchIn(noLiterals).flatMap { m =>
      val isCall = m.group(4) != null
      val qualified = m.group(3) != null
      if (isCall) None // function name — its ARGS matched separately
      else if (qualified) Some(Some(m.group(1).toLowerCase) ->
        m.group(3).toLowerCase)
      else if (sqlKeywords.contains(m.group(1).toLowerCase)) None
      else Some(None -> m.group(1).toLowerCase)
    }.toSeq
  }

  /** True when every column reference of `filter` resolves on `table`:
    * bare names must be columns, qualified names must name this table
    * AND a column of it. Requiring every reference to resolve (forall,
    * not exists) keeps a constraint written for one table from leaking
    * into an unrelated table that merely shares one column name.
    */
  private def applies(filter: String, tableName: String,
      cols: Set[String]): Boolean = {
    val refs = columnRefs(filter)
    refs.nonEmpty && refs.forall {
      case (None, c)    => cols.contains(c)
      case (Some(q), c) => q == tableName.toLowerCase && cols.contains(c)
    }
  }

  /** Filters whose referenced columns ALL resolve on `table`. Tables
    * unknown to the catalog get NO filters (we can't know their
    * columns). Function-call names are not treated as columns, so
    * `year(ts) > 2020` or `coalesce(is_deleted, false) = false`
    * attaches to any table carrying the argument columns.
    */
  def filtersFor(table: String, catalog: CatalogModel): Seq[String] =
    catalog.table(table) match {
      case None => Nil
      case Some(t) =>
        val cols = t.columns.map(_.name.toLowerCase).toSet
        catalog.constraints.mandatoryFilters
          .filter(f => applies(f, table, cols))
    }

  /** Mandatory filters that REFERENCE columns yet attach to NO table of
    * the catalog. A policy constraint (soft delete, row-level security)
    * silently applying nowhere is a catalog bug — surface it instead of
    * dropping it. Filters with no column references at all ('1 = 1',
    * 'true') are excluded: dropping them cannot change any result, so
    * they are not worth failing a whole compiler over.
    */
  def unapplicable(catalog: CatalogModel): Seq[String] =
    catalog.constraints.mandatoryFilters.filter { f =>
      columnRefs(f).nonEmpty &&
        !catalog.tables.exists(t =>
          applies(f, t.name, t.columns.map(_.name.toLowerCase).toSet))
    }

  def apply(df: DataFrame, table: String, catalog: CatalogModel): DataFrame =
    filtersFor(table, catalog).foldLeft(df)((d, f) => d.filter(expr(f)))
}

/** Destructive-keyword safety gate (sql_generator.py:253-266): the
  * reference blocks NL requests naming delete/drop/truncate/… and tags
  * responses `is_blocked`. Ours validates the *plan*: a read-only engine
  * rejects specs/SQL that mutate state.
  */
object SafetyValidator {
  /** Keyword set mirrored from the reference's blocklist
    * (sql_generator.py:255-258), deduplicated to SQL commands.
    */
  val destructiveCommands: Set[String] =
    Set("delete", "drop", "truncate", "update", "insert", "alter", "create",
      "grant", "revoke", "merge")

  /** Fast text-level check: leading comments stripped, then the first
    * command token. (A comment would otherwise hide the verb —
    * "-- x\nDROP TABLE t" must not pass.)
    */
  def validateSql(sql: String): Either[String, Unit] = {
    val noComments = sql
      .replaceAll("(?s)/\\*.*?\\*/", " ")
      .replaceAll("(?m)--.*$", " ")
    val head = noComments.trim.split("\\s+").headOption
      .map(_.toLowerCase).getOrElse("")
    if (destructiveCommands.contains(head))
      Left(s"blocked: destructive command '$head' (read-only engine)")
    else Right(())
  }

  /** Plan-level check — the authoritative gate: any parsed Command (DDL)
    * or INSERT, anywhere in the plan (e.g. behind a CTE), is a write.
    * Token checks can be evaded ("WITH t AS (...) INSERT INTO ...");
    * the parsed plan cannot.
    */
  def validatePlan(plan: LogicalPlan): Either[String, Unit] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement}
    val write = plan match {
      case _: Command => Some(plan.nodeName)
      case _ => plan.collectFirst {
        case c: Command => c.nodeName
        case i: InsertIntoStatement => i.nodeName
      }
    }
    write match {
      case Some(node) =>
        Left(s"blocked: plan contains write operator $node (read-only engine)")
      case None => Right(())
    }
  }

  /** An NL request is blocked when it names a destructive operation —
    * observable contract of the reference demo planner
    * (sql_generator.py:253-266).
    */
  def validateRequest(request: String): Either[String, Unit] = {
    // whole-word match: "show customers created this month" must NOT
    // trip on the substring "create"
    val words = request.toLowerCase.split("[^a-z]+").toSet
    val korean = Map("삭제" -> "delete", "드롭" -> "drop", "지워" -> "delete",
      "수정" -> "update", "변경" -> "update", "추가" -> "insert", "업데이트" -> "update")
    val hit = destructiveCommands.find(words.contains)
      .orElse(korean.collectFirst { case (k, v) if request.contains(k) => v })
    hit match {
      case Some(op) => Left(s"blocked: request asks for destructive operation '$op'")
      case None => Right(())
    }
  }
}
