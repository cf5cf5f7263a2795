package graft.suggest

import graft.model._

/** Deterministic sample-query suggester (SURVEY.md §3.3): walks the
  * catalog's FK join graph emitting one QuerySpec per pattern — the same
  * pattern mix the reference asks its LLM for ("단순 조회부터 집계,
  * 그룹화, 조인" — from simple lookups to aggregation, grouping, joins,
  * sql_generator.py:209-213) but computed from catalog structure instead
  * of generated text. Capped at 10 like the reference (:243).
  */
object SampleSuggester {

  final case class Suggestion(title: String, spec: QuerySpec)

  def suggest(catalog: CatalogModel, max: Int = 10): Seq[Suggestion] = {
    val scans = catalog.tables.take(2).map { t =>
      Suggestion(s"preview ${t.name}",
        QuerySpec(t.name, select = t.columns.take(5).map(_.name),
          limit = Some(10)))
    }
    val topK = for {
      t <- catalog.tables
      ts <- t.columns.find(c => c.dataType.toLowerCase.contains("timestamp")
        || c.dataType.toLowerCase.contains("date")).toSeq
    } yield Suggestion(s"5 most recent ${t.name}",
      QuerySpec(t.name, orderBy = Seq(OrderSpec(ts.name, ascending = false)),
        limit = Some(5)))
    val groupCounts = for {
      r <- catalog.relationships
    } yield Suggestion(s"count of ${r.fromTable} per ${r.toTable}",
      QuerySpec(r.fromTable,
        groupBy = Seq(r.fromColumn),
        aggregates = Seq(AggSpec("count(1)", "n")),
        orderBy = Seq(OrderSpec(r.fromColumn))))
    val joins = for {
      r <- catalog.relationships if r.fromTable != r.toTable
    } yield Suggestion(s"${r.fromTable} joined to ${r.toTable}",
      QuerySpec(r.fromTable,
        joins = Seq(JoinSpec(r.toTable,
          s"${r.fromTable}.${r.fromColumn} = ${r.toTable}.${r.toColumn}")),
        limit = Some(10)))
    val selfJoins = for {
      r <- catalog.relationships if r.fromTable == r.toTable
    } yield Suggestion(s"${r.fromTable} hierarchy (self-join)",
      QuerySpec(r.fromTable,
        joins = Seq(JoinSpec(r.toTable,
          s"${r.fromTable}.${r.fromColumn} = parent.${r.toColumn}",
          joinType = "left", alias = Some("parent"))),
        limit = Some(10)))
    (scans ++ topK ++ groupCounts ++ joins ++ selfJoins).take(max)
  }
}
