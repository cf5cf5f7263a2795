package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.{Det, EngineQuery, Tables}

/** Snapshot reconciliation + incremental aggregate maintenance — the two
  * table-maintenance operators every large warehouse runs nightly
  * (reference context: db_connector.py's extract/load cycle implies
  * repeated snapshots of the same source; these operators answer "what
  * changed?" and "update the rollup without rescanning history").
  *
  * Scale design:
  *   - q118 diff = ONE full-outer shuffle join on the primary key; the
  *     column comparison is map-side. At 100 TB both snapshots are
  *     bucketed by PK (q88's layout machinery) so the join is
  *     zero-exchange, and a row-fingerprint (xxhash over the serialized
  *     row) prefilters unchanged rows before any column-level compare.
  *   - q119 merge = partial aggregates are additive (count/sum/max), so
  *     maintaining the rollup costs one scan of the DELTA plus a
  *     hash-agg of |state| + |delta groups| rows — never a rescan of
  *     history. This is exactly Spark's own map-side partial agg shape,
  *     lifted to cross-run persistence.
  */
object Reconcile {

  /** Keyed snapshot diff: old vs new snapshot of `orders`, classifying
    * every key as added / removed / changed / unchanged, with per-column
    * change counts. The two snapshots are deterministic derivations of
    * the fixture (drop `%11`/`%13` keys, bump price on `%7`, flip status
    * on `%19`) so the oracle can rebuild them.
    */
  val q118 = EngineQuery(
    "q118_snapshot_diff",
    (s, dir) => {
      val t = Tables(s, dir)
      val key = col("o_orderkey")
      val oldSnap = t.orders
        .filter(key % 11 =!= 0)
        .select(key, Det.dec2(col("o_totalprice")).as("p_old"),
          col("o_orderstatus").as("s_old"), lit(1).as("in_old"))
      val newSnap = t.orders
        .filter(key % 13 =!= 0)
        .select(key,
          when(key % 7 === 0, Det.dec2(col("o_totalprice")) + Det.dec2(lit(1.0)))
            .otherwise(Det.dec2(col("o_totalprice"))).as("p_new"),
          when(key % 19 === 0, lit("F")).otherwise(col("o_orderstatus"))
            .as("s_new"),
          lit(1).as("in_new"))
      val j = oldSnap.join(newSnap, Seq("o_orderkey"), "full_outer")
      val priceDiff = col("in_old").isNotNull && col("in_new").isNotNull &&
        col("p_old") =!= col("p_new")
      val statusDiff = col("in_old").isNotNull && col("in_new").isNotNull &&
        col("s_old") =!= col("s_new")
      val status = when(col("in_old").isNull, lit("added"))
        .when(col("in_new").isNull, lit("removed"))
        .when(priceDiff || statusDiff, lit("changed"))
        .otherwise(lit("unchanged"))
      j.select(status.as("diff_status"),
          priceDiff.cast(LongType).as("pd"),
          statusDiff.cast(LongType).as("sd"))
        .groupBy(col("diff_status"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("pd")).as("n_price_diff"),
          sum(col("sd")).as("n_status_diff"))
        .orderBy(col("diff_status"))
    },
    Some("""WITH old_snap AS (
              SELECT o_orderkey,
                CAST(o_totalprice AS DECIMAL(18,2)) AS p_old,
                o_orderstatus AS s_old, 1 AS in_old
              FROM orders WHERE o_orderkey % 11 != 0
            ), new_snap AS (
              SELECT o_orderkey,
                CASE WHEN o_orderkey % 7 = 0
                     THEN CAST(o_totalprice AS DECIMAL(18,2))
                          + CAST(1.0 AS DECIMAL(18,2))
                     ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS p_new,
                CASE WHEN o_orderkey % 19 = 0 THEN 'F'
                     ELSE o_orderstatus END AS s_new,
                1 AS in_new
              FROM orders WHERE o_orderkey % 13 != 0
            ), j AS (
              SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
                o.p_old, o.s_old, o.in_old, n.p_new, n.s_new, n.in_new
              FROM old_snap o FULL OUTER JOIN new_snap n
                ON o.o_orderkey = n.o_orderkey
            ), flagged AS (
              SELECT
                CASE WHEN in_old IS NULL THEN 'added'
                     WHEN in_new IS NULL THEN 'removed'
                     WHEN p_old != p_new OR s_old != s_new THEN 'changed'
                     ELSE 'unchanged' END AS diff_status,
                CASE WHEN in_old IS NOT NULL AND in_new IS NOT NULL
                          AND p_old != p_new THEN 1 ELSE 0 END AS pd,
                CASE WHEN in_old IS NOT NULL AND in_new IS NOT NULL
                          AND s_old != s_new THEN 1 ELSE 0 END AS sd
              FROM j
            )
            SELECT diff_status, COUNT(*) AS n_rows,
              CAST(SUM(pd) AS BIGINT) AS n_price_diff,
              CAST(SUM(sd) AS BIGINT) AS n_status_diff
            FROM flagged GROUP BY diff_status ORDER BY diff_status"""))

  /** Incremental aggregate maintenance: a persisted per-customer rollup
    * (orders before the cut) is merged with the delta (orders at/after
    * the cut) WITHOUT rescanning history — count/sum/max are additive,
    * so `merge(state, agg(delta)) == agg(everything)`, which is exactly
    * what the oracle (one full GROUP BY) asserts.
    */
  val q119 = EngineQuery(
    "q119_incremental_agg",
    (s, dir) => {
      val t = Tables(s, dir)
      val cut = lit("1997-01-01").cast("timestamp")
      def partial(pred: org.apache.spark.sql.Column) = t.orders
        .filter(pred)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(Det.dec2(col("o_totalprice"))).as("spend"),
          max(col("o_orderdate")).as("last_order"))
      val state = partial(col("o_orderdate") < cut)   // persisted rollup
      val delta = partial(col("o_orderdate") >= cut)  // the new increment
      state.unionAll(delta)
        .groupBy(col("o_custkey"))
        .agg(sum(col("n_orders")).as("n_orders"),
          sum(col("spend")).as("spend_d"),
          max(col("last_order")).as("last_order"))
        .select(col("o_custkey"), col("n_orders"),
          Det.toDouble(Det.dec2(col("spend_d"))).as("total_spend"),
          col("last_order"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, COUNT(*) AS n_orders,
              CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS DOUBLE) AS total_spend,
              MAX(o_orderdate) AS last_order
            FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  val all: Seq[EngineQuery] = Seq(q118, q119)
}
