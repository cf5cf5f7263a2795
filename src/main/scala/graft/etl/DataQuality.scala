package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{EngineQuery, Tables}

/** Declarative data-quality expectations — the contract-check stage an
  * ETL pipeline runs before publishing a load: a rule set evaluated in
  * ONE aggregation over ONE scan (the q99 profiling shape), returning
  * per-rule violation counts. A rule is any boolean Column; a row
  * violates the rule when the predicate is false OR null (an
  * unexpected NULL is a violation, not a pass — the SQL three-valued
  * trap the naive `sum(when(!p,1))` form falls into).
  *
  * At 100 TB: all rules ride one map-side-combined aggregation; adding
  * a rule adds a projection column, never a pass. Gating a load on the
  * result is a driver-side check of a ≤ |rules|-row DataFrame.
  */
object DataQuality {

  final case class Rule(name: String, predicate: Column)

  /** Evaluate all rules in one aggregation: (rule, n_violations, pass).
    * An EMPTY input passes every rule (0 violations, not NULL — the
    * sum-over-zero-rows trap would otherwise make the gate tri-state).
    */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    // names are spliced into the stack() expression as identifiers and
    // string literals — restrict to identifier shape rather than
    // silently producing an unparseable projection
    rules.foreach { r =>
      require(r.name.matches("[A-Za-z][A-Za-z0-9_]*"),
        s"rule name must be identifier-shaped: '${r.name}'")
    }
    val aggs = rules.map { r =>
      coalesce(sum(when(r.predicate, 0).otherwise(1)), lit(0L))
        .as(s"v_${r.name}")
    }
    val stackArgs = rules.map(r => s"'${r.name}', v_${r.name}")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)"))
      .select(col("rule"), col("n_violations"),
        (col("n_violations") === 0).as("pass"))
      .orderBy(col("rule"))
  }

  /** Gate row: a realistic rule set over orders — positivity, domain
    * membership, referential completeness, date sanity — including one
    * rule that FAILS on the fixture ('4-NOT SPECIFIED' is outside the
    * specified-priority domain), so the violation-counting path is
    * actually exercised, not just the all-green path.
    */
  val q109 = EngineQuery(
    "q109_quality_expectations",
    (s, dir) => {
      val t = Tables(s, dir)
      evaluate(t.orders, Seq(
        Rule("total_positive", col("o_totalprice") > 0),
        Rule("status_domain", col("o_orderstatus").isin("O", "F", "P")),
        Rule("custkey_present", col("o_custkey").isNotNull),
        Rule("date_in_range",
          col("o_orderdate") >= lit("1990-01-01").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("2010-01-01").cast("timestamp_ntz")),
        Rule("priority_specified",
          col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM",
            "5-LOW"))))
    },
    Some("""SELECT rule, n_violations, n_violations = 0 AS pass FROM (
              SELECT 'total_positive' AS rule,
                CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_violations FROM orders
              UNION ALL
              SELECT 'status_domain',
                CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0
                  ELSE 1 END) AS BIGINT) FROM orders
              UNION ALL
              SELECT 'custkey_present',
                CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END)
                  AS BIGINT) FROM orders
              UNION ALL
              SELECT 'date_in_range',
                CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1990-01-01'
                          AND o_orderdate < TIMESTAMP '2010-01-01'
                         THEN 0 ELSE 1 END) AS BIGINT) FROM orders
              UNION ALL
              SELECT 'priority_specified',
                CAST(SUM(CASE WHEN o_orderpriority IN
                    ('1-URGENT','2-HIGH','3-MEDIUM','5-LOW')
                  THEN 0 ELSE 1 END) AS BIGINT) FROM orders
            ) ORDER BY rule"""))

  val all: Seq[EngineQuery] = Seq(q109)
}
