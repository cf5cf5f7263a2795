package graft.compile

import graft.model._

/** Deterministic NL→plan fallback — the generalized form of the
  * reference's demo mode (sql_generator.py:249-313), which is its own
  * LLM-free planner: keyword detection → block-or-plan → project the main
  * table's first 5 columns → apply the catalog's mandatory filters →
  * LIMIT 10.
  *
  * The LLM front-end stays outside the engine boundary (SURVEY.md §0);
  * any `Planner: (String, CatalogModel) => GenerateResult` can replace
  * this one.
  */
object DemoPlanner {

  val DefaultLimit = 10

  /** Pick the request's main table: first catalog table whose name
    * appears in the request, else the catalog's first table — the
    * reference's table-selection heuristic (sql_generator.py:268-272).
    */
  def mainTable(request: String, catalog: CatalogModel): TableModel = {
    val lower = request.toLowerCase
    catalog.tables.find(t => lower.contains(t.name.toLowerCase))
      .getOrElse(catalog.tables.head)
  }

  def plan(request: String, catalog: CatalogModel): GenerateResult =
    SafetyValidator.validateRequest(request) match {
      case Left(reason) =>
        GenerateResult(
          intentSummary = s"blocked request: $request",
          sql = "",
          isBlocked = true,
          blockReason = Some(reason),
          safetyNotes = Seq("destructive keyword detected (read-only engine)"))
      case Right(()) =>
        val t = mainTable(request, catalog)
        val spec = toSpec(t, catalog)
        GenerateResult(
          intentSummary = s"preview of ${t.name}",
          sql = renderSql(spec, catalog),
          assumptions = Seq(s"main table inferred as '${t.name}'"),
          safetyNotes = Seq(s"LIMIT $DefaultLimit applied automatically"),
          tablesUsed = Seq(t.name))
    }

  /** The demo plan as a QuerySpec: first-5-column projection + mandatory
    * filters + deterministic order + LIMIT 10 (sql_generator.py:274-281;
    * ORDER BY added for engine determinism — the reference relies on the
    * remote DB's arbitrary row order).
    */
  def toSpec(t: TableModel, catalog: CatalogModel): QuerySpec = {
    val cols = t.columns.take(5).map(_.name)
    QuerySpec(
      table = t.name,
      select = cols,
      filters = MandatoryFilters.filtersFor(t.name, catalog),
      orderBy = t.pkColumns.headOption.orElse(cols.headOption).toSeq
        .map(OrderSpec(_)),
      limit = Some(DefaultLimit))
  }

  /** SQL text of the demo plan — the observable contract the reference
    * returns to the client (sql_generator.py:277-281).
    */
  def renderSql(spec: QuerySpec, catalog: CatalogModel): String = {
    val where =
      if (spec.filters.isEmpty) "" else spec.filters.mkString(" WHERE ", " AND ", "")
    val order =
      if (spec.orderBy.isEmpty) ""
      else spec.orderBy.map(o => o.expr + (if (o.ascending) "" else " DESC"))
        .mkString(" ORDER BY ", ", ", "")
    s"SELECT ${spec.select.mkString(", ")} FROM ${spec.table}$where$order" +
      spec.limit.map(n => s" LIMIT $n").getOrElse("")
  }
}
