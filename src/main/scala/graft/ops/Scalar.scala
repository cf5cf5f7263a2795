package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import Det._

/** Scalar-function surface (SURVEY.md §2.8): string, date/time, math,
  * conditional, cast/format, JSON, array + higher-order. All Catalyst
  * built-ins (whole-stage-codegen'd) — no UDFs anywhere.
  *
  * Cross-engine determinism notes (vs the DuckDB oracle):
  *  - floor/ceil/sqrt on doubles are IEEE-exact → safe; ln/exp/pow are
  *    libm-dependent → never used in oracle-checked outputs.
  *  - double→int casts truncate in Spark but round in DuckDB → always
  *    floor() first on both sides.
  *  - Spark dayofweek is 1=Sunday; DuckDB 0=Sunday → oracle adds 1.
  */
object Scalar {

  /** String functions over name/segment columns (columns the reference
    * schemas exercise: sample_metadata.py:16-17, 53).
    */
  val q26 = EngineQuery(
    "q26_scalar_string",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .select(
          col("c_custkey"),
          lower(col("c_name")).as("lname"),
          upper(col("c_mktsegment")).as("useg"),
          concat(col("c_name"), lit("#"), col("c_mktsegment")).as("cname"),
          substring(col("c_name"), 10, 5).as("sub"),
          trim(concat(lit("  "), col("c_name"), lit("  "))).as("trimmed"),
          length(col("c_name")).as("name_len"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("repl"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          col("c_name").like("%001%").as("has_001"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey,
              lower(c_name) AS lname,
              upper(c_mktsegment) AS useg,
              concat(c_name, '#', c_mktsegment) AS cname,
              substring(c_name, 10, 5) AS sub,
              trim(concat('  ', c_name, '  ')) AS trimmed,
              length(c_name) AS name_len,
              regexp_replace(c_name, 'Customer', 'Cust') AS repl,
              lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
              c_name LIKE '%001%' AS has_001
            FROM customer ORDER BY c_custkey"""))

  /** String functions, second batch: positional/affix/segment operations.
    * (initcap exists in Spark but not DuckDB — excluded from the oracle
    * surface.)
    */
  val q26b = EngineQuery(
    "q26b_scalar_string_more",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .select(
          col("c_custkey"),
          reverse(col("c_name")).as("rev"),
          repeat(col("c_mktsegment"), 2).as("seg2"),
          translate(col("c_name"), "0", "#").as("trans"),
          instr(col("c_name"), "#").as("hash_pos"),
          col("c_name").startsWith("Customer").as("is_cust"),
          col("c_name").endsWith("1").as("ends_1"),
          split_part(col("c_name"), lit("#"), lit(2)).as("num_part"),
          expr("left(c_name, 8)").as("l8"),
          expr("right(c_name, 3)").as("r3"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey,
              reverse(c_name) AS rev,
              repeat(c_mktsegment, 2) AS seg2,
              translate(c_name, '0', '#') AS trans,
              strpos(c_name, '#') AS hash_pos,
              starts_with(c_name, 'Customer') AS is_cust,
              ends_with(c_name, '1') AS ends_1,
              split_part(c_name, '#', 2) AS num_part,
              left(c_name, 8) AS l8,
              right(c_name, 3) AS r3
            FROM customer ORDER BY c_custkey"""))

  /** Date/time functions (reference date columns: order_date, hire_date,
    * created_at — sample_metadata.py:18, 50, 98; "날짜 형식 표준화"
    * transform, sql_generator.py:304).
    */
  val q27 = EngineQuery(
    "q27_scalar_datetime",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("qtr"),
          dayofweek(col("o_orderdate")).as("dow"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
            .as("days_since_95"),
          date_add(col("o_orderdate").cast("date"), 30).cast("timestamp")
            .as("plus_30d"),
          last_day(col("o_orderdate")).cast("timestamp").as("eom"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
              year(o_orderdate) AS y,
              month(o_orderdate) AS m,
              day(o_orderdate) AS d,
              quarter(o_orderdate) AS qtr,
              dayofweek(o_orderdate) + 1 AS dow,
              date_trunc('month', o_orderdate) AS month_start,
              date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS days_since_95,
              CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus_30d,
              CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
              strftime(o_orderdate, '%Y-%m-%d') AS iso_day
            FROM orders ORDER BY o_orderkey"""))

  /** Math + conditional (CASE/COALESCE/NULLIF — the "NULL 값 기본값 처리"
    * transform family, sql_generator.py:303).
    */
  val q28 = EngineQuery(
    "q28_scalar_math_case",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // decimal math stays exact internally; the OUTPUT is cast to
          // DOUBLE on both sides (driver hashes serialized cells — Spark
          // Decimal('0.00') vs DuckDB float64 0.0 would mismatch)
          toDouble(round(dec2(col("l_extendedprice")) * dec2(col("l_discount")), 2))
            .as("discount_amt"),
          toDouble(abs(dec2(col("l_extendedprice")) - lit(50000).cast(D2)))
            .as("dist_50k"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          (col("l_partkey") % 7).as("part_mod"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          when(col("l_quantity") > 40, "heavy")
            .when(col("l_quantity") > 20, "mid")
            .otherwise("light").as("weight_class"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none"))
            .as("flag_or_none"),
          greatest(col("l_discount"), col("l_tax")).as("max_rate"),
          least(col("l_discount"), col("l_tax")).as("min_rate"))
        // (l_orderkey, l_linenumber) is NOT unique: extend the sort over
        // every source column the outputs derive from, so remaining ties
        // are identical output rows
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_quantity"), col("l_partkey"), col("l_returnflag"))
    },
    Some("""SELECT l_orderkey, l_linenumber,
              CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(l_discount AS DECIMAL(18,2)), 2) AS DOUBLE)
                AS discount_amt,
              CAST(abs(CAST(l_extendedprice AS DECIMAL(18,2)) -
                  CAST(50000 AS DECIMAL(18,2))) AS DOUBLE) AS dist_50k,
              CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
              CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
              l_partkey % 7 AS part_mod,
              sqrt(l_quantity) AS qty_sqrt,
              CASE WHEN l_quantity > 40 THEN 'heavy'
                   WHEN l_quantity > 20 THEN 'mid'
                   ELSE 'light' END AS weight_class,
              coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
              greatest(l_discount, l_tax) AS max_rate,
              least(l_discount, l_tax) AS min_rate
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount,
              l_tax, l_quantity, l_partkey, l_returnflag"""))

  /** Cast / format round-trips ("데이터 타입 검증" transform,
    * sql_generator.py:305).
    */
  val q29 = EngineQuery(
    "q29_cast_format",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day_str"),
          to_date(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd")
            .cast("timestamp").as("day_back"),
          col("o_orderkey").cast("string").as("key_str"),
          col("o_orderkey").cast("string").cast(LongType).as("key_back"),
          floor(col("o_totalprice")).as("price_int"),
          // 2-dp decimal round-trip, surfaced as DOUBLE (exact decimal
          // internally; output boundary must not be DecimalType — see
          // scripts/check.py type guard)
          col("o_totalprice").cast(DecimalType(18, 2)).cast(DoubleType)
            .as("price_dec"),
          (col("o_orderstatus") === "F").as("is_final"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
              strftime(o_orderdate, '%Y-%m-%d') AS day_str,
              CAST(CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS TIMESTAMP)
                AS day_back,
              CAST(o_orderkey AS VARCHAR) AS key_str,
              CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_back,
              CAST(floor(o_totalprice) AS BIGINT) AS price_int,
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
              o_orderstatus = 'F' AS is_final
            FROM orders ORDER BY o_orderkey"""))

  /** JSON extraction over `events.props` (SURVEY.md §2.8 [ext]). */
  val q30 = EngineQuery(
    "q30_json",
    (s, dir) => {
      val t = Tables(s, dir)
      t.events
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    },
    // DuckDB SUM(int) widens to HUGEINT (pandas float64); CAST AS BIGINT
    // matches Spark's int64 sum exactly.
    Some("""SELECT event_type, COUNT(*) AS n,
              CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT))
                AS BIGINT) AS sum_k,
              MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
              MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Array basics over `embeddings.embedding` (ARRAY<FLOAT>). Element
    * reads are exact (no arithmetic); the norm uses exact decimal
    * accumulation (order-independent, engine-portable).
    */
  val q31 = EngineQuery(
    "q31_array_ops",
    (s, dir) => {
      val t = Tables(s, dir)
      t.embeddings
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).cast(DoubleType).as("first_val"),
          element_at(col("embedding"), -1).cast(DoubleType).as("last_val"),
          // array OUTPUT serialized to a fixed-point CSV string — the
          // driver harness can't hash list cells, and float-to-string
          // rendering differs across engines; floor(v*1e7) is tie-free
          // and engine-exact (float->double is exact)
          concat_ws(",", transform(slice(col("embedding"), 1, 3),
            x => floor(x.cast(DoubleType) * lit(1e7)).cast(LongType)
              .cast("string"))).as("head3"))
        .orderBy(col("vec_id"))
    },
    Some("""SELECT vec_id,
              len(embedding) AS dim,
              CAST(embedding[1] AS DOUBLE) AS first_val,
              CAST(embedding[-1] AS DOUBLE) AS last_val,
              array_to_string(list_transform(embedding[1:3],
                x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT)
                          AS VARCHAR)), ',') AS head3
            FROM embeddings ORDER BY vec_id"""))

  /** Higher-order array functions (transform/filter/aggregate) — the
    * codegen-friendly path for vector math (SURVEY.md §2.8 [ext]); the
    * fixed-point integer fold (floor(v*1e7), exact int64 sum) makes the
    * L2 norm bit-identical across engines.
    */
  val q32 = EngineQuery(
    "q32_higher_order",
    (s, dir) => {
      val t = Tables(s, dir)
      val x = col("x")
      t.embeddings
        .select(
          col("vec_id"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"),
          // doubled head, serialized fixed-point (see q31 head3): 2x on a
          // double is exact, *1e7 is one identical IEEE rounding per engine
          concat_ws(",", transform(slice(col("embedding"), 1, 3),
            x => floor((x.cast(DoubleType) + x.cast(DoubleType)) * lit(1e7))
              .cast(LongType).cast("string"))).as("doubled_head"),
          (aggregate(col("embedding"), lit(0L), (acc, v) => {
            val f = floor(v.cast(DoubleType) * lit(1e7)).cast(LongType)
            acc + f * f
          }).cast(DoubleType) / lit(1e14)).as("norm2"))
        .orderBy(col("vec_id"))
    },
    Some("""SELECT vec_id,
              len(list_filter(embedding, x -> x > 0)) AS n_pos,
              array_to_string(list_transform(embedding[1:3],
                x -> CAST(CAST(FLOOR((CAST(x AS DOUBLE) + CAST(x AS DOUBLE))
                                     * 10000000.0) AS BIGINT) AS VARCHAR)),
                ',') AS doubled_head,
              (SELECT CAST(SUM(CAST(FLOOR(v*10000000.0) AS BIGINT)
                          * CAST(FLOOR(v*10000000.0) AS BIGINT)) AS DOUBLE)
                 / 100000000000000.0
               FROM (SELECT CAST(UNNEST(embedding) AS DOUBLE) AS v) u) AS norm2
            FROM embeddings ORDER BY vec_id"""))

  /** MAP-typed columns (§2.8 complex types, completing array q31/q32 and
    * JSON q30): per-customer status→count maps built from SORTED entries
    * (map construction order is the iteration order in both engines, so
    * determinism requires sorting the entry list first), then key/value
    * extraction and lookup. try_element_at, not element_at — ANSI mode
    * throws on a missing key. Maps serialize to CSV strings at the gate
    * boundary (map cells crash the driver harness).
    */
  val q103 = EngineQuery(
    "q103_map_ops",
    (s, dir) => {
      val t = Tables(s, dir)
      val per = t.orders.groupBy(col("o_custkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      per.groupBy(col("o_custkey"))
        .agg(map_from_entries(array_sort(collect_list(
          struct(col("o_orderstatus"), col("n"))))).as("m"))
        .select(col("o_custkey"),
          size(col("m")).as("n_statuses"),
          concat_ws(",", map_keys(col("m"))).as("statuses"),
          concat_ws(",", map_values(col("m")).cast("array<string>"))
            .as("counts"),
          expr("try_element_at(m, 'F')").as("f_count"))
        .orderBy(col("o_custkey"))
    },
    Some("""WITH per AS (
              SELECT o_custkey, o_orderstatus, COUNT(*) AS n
              FROM orders GROUP BY 1, 2
            ), m AS (
              SELECT o_custkey,
                map_from_entries(list_sort(list((o_orderstatus, n)))) AS m
              FROM per GROUP BY o_custkey
            )
            SELECT o_custkey,
              CAST(cardinality(m) AS INT) AS n_statuses,
              array_to_string(map_keys(m), ',') AS statuses,
              array_to_string(map_values(m), ',') AS counts,
              CASE WHEN len(m['F']) > 0 THEN m['F'][1] END AS f_count
            FROM m ORDER BY o_custkey"""))

  val all: Seq[EngineQuery] =
    Seq(q26, q26b, q27, q28, q29, q30, q31, q32, q103)
}
