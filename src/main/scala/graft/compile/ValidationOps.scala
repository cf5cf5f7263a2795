package graft.compile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.CatalogModel

/** Catalog value validation (SURVEY.md §1.2 ENUM hard part): the
  * reference's catalogs carry `valid_status_values` per column
  * (sample_metadata.py:78, 160 — e.g. employees.status ∈
  * {active, resigned, on_leave}); Spark has no ENUM type, so the engine
  * enforces the constraint as a validation operator.
  */
object ValidationOps {

  /** Keys of `validStatusValues` are "table.column" or bare "column".
    * A table-qualified key deterministically overrides a bare one for
    * the same column; results are sorted by column name so downstream
    * when-chains evaluate in a stable order (Map iteration order is not
    * a contract).
    */
  private def constraintsFor(table: String, catalog: CatalogModel)
      : Seq[(String, Seq[String])] = {
    val bare = catalog.constraints.validStatusValues.collect {
      case (k, vs) if !k.contains(".") => k -> vs
    }
    val qualified = catalog.constraints.validStatusValues.collect {
      case (k, vs) if k.startsWith(s"$table.") => k.split("\\.")(1) -> vs
    }
    (bare ++ qualified).toSeq.sortBy(_._1) // qualified wins via ++ override
  }

  /** Rows of `df` violating any ENUM constraint of `table`, tagged with
    * the offending column and value. Empty result = valid table.
    */
  def violations(df: DataFrame, table: String, catalog: CatalogModel): DataFrame = {
    val cons = constraintsFor(table, catalog)
      .filter { case (c, _) => df.columns.contains(c) }
    if (cons.isEmpty) return df.limit(0)
      .select(df.columns.map(col): _*)
      .withColumn("invalid_column", lit(null).cast("string"))
      .withColumn("invalid_value", lit(null).cast("string"))
    val checks = cons.map { case (c, allowed) =>
      (col(c).isNotNull && !col(c).isin(allowed: _*), c)
    }
    val anyBad = checks.map(_._1).reduce(_ || _)
    val badCol = checks.foldRight(lit(null).cast("string")) {
      case ((cond, c), acc) => when(cond, c).otherwise(acc)
    }
    df.filter(anyBad)
      .withColumn("invalid_column", badCol)
      .withColumn("invalid_value",
        checks.foldRight(lit(null).cast("string")) {
          case ((cond, c), acc) => when(cond, col(c).cast("string")).otherwise(acc)
        })
  }

  /** Keep only rows satisfying every ENUM constraint (the enforcing
    * variant — mirrors the reference's prompt-time guidance as a hard
    * filter).
    */
  def enforce(df: DataFrame, table: String, catalog: CatalogModel): DataFrame = {
    val cons = constraintsFor(table, catalog)
      .filter { case (c, _) => df.columns.contains(c) }
    cons.foldLeft(df) { case (d, (c, allowed)) =>
      d.filter(col(c).isNull || col(c).isin(allowed: _*))
    }
  }
}
