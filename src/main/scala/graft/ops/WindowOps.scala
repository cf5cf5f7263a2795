package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Det._

/** Window-function surface (SURVEY.md §2.5): ranking, analytic,
  * aggregate-over-frame. Window partition keys are the shuffle keys — at
  * 100 TB each of these runs one hash exchange on the partition column and
  * sorts within partitions only (no global sort).
  */
object WindowOps {

  /** row_number: "latest order per customer" — the recency idiom behind
    * the reference's sample question (sql_generator.py:211).
    */
  val q21 = EngineQuery(
    "q21_window_rownum",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t.orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
              SELECT *, row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders) t
            WHERE rn = 1 ORDER BY o_custkey"""),
    bench = true)

  /** lag / lead analytics over per-customer order history. */
  val q22 = EngineQuery(
    "q22_window_lag_lead",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t.orders
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
              lag(o_totalprice, 1) OVER w AS prev_price,
              lead(o_totalprice, 1) OVER w AS next_price
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderkey"""))

  /** Running aggregate over an explicit ROWS frame. */
  val q23 = EngineQuery(
    "q23_window_running_sum",
    (s, dir) => {
      val t = Tables(s, dir)
      // (l_orderkey, l_linenumber) is NOT unique: the window order adds
      // l_quantity so tied rows accumulate deterministically (equal-
      // quantity ties are interchangeable), and the outer sort adds the
      // running value itself to totalize the output order
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.lineitem
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"),
          toDouble(sum(dec2(col("l_quantity"))).over(w)).as("running_qty"))
        .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("running_qty"))
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                AS running_qty
            FROM lineitem
            ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber,
              running_qty"""),
    bench = true)

  /** rank / dense_rank / ntile / percent_rank within a partition. */
  val q24 = EngineQuery(
    "q24_window_rank",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t.customer
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("prank"))
        .orderBy(col("c_mktsegment"), col("rnk"), col("c_custkey"))
    },
    Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
              rank() OVER w AS rnk,
              dense_rank() OVER w AS drnk,
              ntile(4) OVER w AS quartile,
              percent_rank() OVER w AS prank
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment
              ORDER BY c_acctbal DESC, c_custkey)
            ORDER BY c_mktsegment, rnk, c_custkey"""))

  /** first_value / last_value over an unbounded frame. */
  val q25 = EngineQuery(
    "q25_window_first_last",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t.customer
        .select(col("c_mktsegment"), col("c_custkey"),
          first(col("c_name")).over(w).as("richest"),
          last(col("c_name")).over(w).as("poorest"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },
    Some("""SELECT c_mktsegment, c_custkey,
              first_value(c_name) OVER w AS richest,
              last_value(c_name) OVER w AS poorest
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment
              ORDER BY c_acctbal DESC, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            ORDER BY c_mktsegment, c_custkey"""))

  /** RANGE frame over event time: 7-day moving revenue per order
    * priority. The frame is value-based (RANGE, not ROWS): days with no
    * orders still age out of the window. Spark's rangeBetween takes
    * numeric offsets, so the order key is the day as an epoch-day int —
    * semantically identical to DuckDB's RANGE BETWEEN INTERVAL 6 DAYS
    * PRECEDING at day granularity. Pre-aggregating to one row per
    * (priority, day) FIRST keeps the window over O(days) rows, not
    * O(orders) — the scale-correct shape for moving aggregates.
    */
  val q100 = EngineQuery(
    "q100_range_window",
    (s, dir) => {
      val t = Tables(s, dir)
      val daily = t.orders
        .groupBy(col("o_orderpriority"),
          date_trunc("day", col("o_orderdate")).as("day"))
        .agg(sum(dec2(col("o_totalprice"))).as("rev"))
        .withColumn("day_num", unix_date(col("day").cast("date")))
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("day_num")).rangeBetween(-6, 0)
      daily
        .select(col("o_orderpriority"), col("day"),
          toDouble(col("rev")).as("rev"),
          toDouble(sum(col("rev")).over(w)).as("rev_7d"))
        .orderBy(col("o_orderpriority"), col("day"))
    },
    Some("""WITH daily AS (
              SELECT o_orderpriority, date_trunc('day', o_orderdate) AS day,
                SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
              FROM orders GROUP BY 1, 2
            )
            SELECT o_orderpriority, day,
              CAST(rev AS DOUBLE) AS rev,
              CAST(SUM(rev) OVER (PARTITION BY o_orderpriority
                ORDER BY day RANGE BETWEEN INTERVAL 6 DAYS PRECEDING
                AND CURRENT ROW) AS DOUBLE) AS rev_7d
            FROM daily
            ORDER BY o_orderpriority NULLS FIRST, day"""))

  val all: Seq[EngineQuery] = Seq(q21, q22, q23, q24, q25, q100)
}
