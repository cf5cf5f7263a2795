package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{EngineQuery, Tables}

/** Keyed changeset merge (MERGE/upsert) — the incremental-load operator
  * every warehouse ETL needs: apply a batch of inserts / updates /
  * deletes to a dimension snapshot in ONE keyed join.
  *
  * Semantics (standard MERGE):
  *  - matched + op='U'  → take the changeset's values ("updated")
  *  - matched + op='D'  → drop the row
  *  - matched + other   → keep the snapshot row ("kept")
  *  - unmatched + op='I' → insert the changeset row ("inserted")
  *  - unmatched + other  → ignored (U/D against a missing key is a no-op)
  *
  * Scale story: one shuffle on the merge key — AQE broadcasts the
  * changeset when it is small (the common incremental case). Combined
  * with a partitioned layout and dynamic partition overwrite
  * (EtlRunner's partitioned loads), the physical rewrite touches only
  * the partitions the changeset lands in, never the full 100 TB table.
  */
object MergeOps {

  /** Merge `changes` (same data columns as `snapshot`, plus `opCol`
    * with values I/U/D) into `snapshot` on `key`. Output = snapshot
    * schema + an `action` column (kept/updated/inserted).
    */
  def merge(snapshot: DataFrame, changes: DataFrame, key: String,
      opCol: String): DataFrame = {
    // explicit presence flags, NOT key-nullness: a snapshot row with a
    // NULL merge key never matches (SQL null-join semantics) but is
    // still a never-matched target row, which standard MERGE keeps.
    // Key-nullness tests turn such rows' filters three-valued and
    // silently drop them on every incremental load.
    // collision-proof internal flag names: a caller column with the
    // same name would be silently replaced by withColumn and then
    // emitted as the flag value by pick()
    val spName = "_graft_s_present"
    val cpName = "_graft_c_present"
    require(!snapshot.columns.contains(spName) &&
      !changes.columns.contains(cpName),
      s"columns $spName/$cpName are reserved by merge()")
    val s = snapshot.withColumn(spName, lit(true)).alias("s")
    val c = changes.withColumn(cpName, lit(true)).alias("c")
    val sk = col(s"s.$key")
    val ck = col(s"c.$key")
    val sp = col(s"s.$spName").isNotNull // never three-valued
    val cp = col(s"c.$cpName").isNotNull
    val op = col(s"c.$opCol")
    val matched = sp && cp
    val takeChange = (matched && op === "U") || (!sp && op === "I")
    def pick(name: String): Column =
      when(takeChange, col(s"c.$name")).otherwise(col(s"s.$name")).as(name)
    val dataCols = snapshot.columns.toSeq.filterNot(_ == key)
    s.join(c, sk === ck, "full_outer")
      .filter(!(matched && op === "D"))   // matched deletes drop
      .filter(sp || op === "I")           // unmatched U/D are no-ops
      .select(coalesce(sk, ck).as(key) +: dataCols.map(pick) :+
        when(!sp, "inserted").when(matched && op === "U", "updated")
          .otherwise("kept").as("action"): _*)
  }

  /** SCD Type-2 merge — dimension history with validity intervals,
    * the warehouse pattern for "what did this customer look like when
    * the order shipped": applying a change CLOSES the current version
    * (valid_to = effective date) and opens a new one, so no fact ever
    * loses its point-in-time context.
    *
    * `history` carries (key, attrs..., validFrom, validTo) with open
    * versions having NULL validTo; `changes` carries (key, attrs...,
    * effCol). One left join of the history against the changeset
    * (matching only open versions) + a union of the new versions —
    * a single shuffle on the key, changeset broadcast by AQE when
    * small, exactly like [[merge]]. Closed history rows pass through
    * untouched, so reprocessing a day's changes never rewrites deep
    * history.
    */
  def scd2(history: DataFrame, changes: DataFrame, key: String,
      effCol: String, validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    val h = history.alias("h")
    val c = changes.alias("c")
    val attrs = history.columns.toSeq
      .filterNot(Seq(key, validFrom, validTo).contains)
    val matched = col(s"c.$key").isNotNull
    val closed = h.join(c,
      col(s"h.$key") === col(s"c.$key") && col(s"h.$validTo").isNull,
      "left")
      .select(col(s"h.$key").as(key) +:
        attrs.map(a => col(s"h.$a").as(a)) :+
        col(s"h.$validFrom").as(validFrom) :+
        when(matched, col(s"c.$effCol")).otherwise(col(s"h.$validTo"))
          .as(validTo): _*)
    val fresh = changes.select(col(key) +: attrs.map(col) :+
      col(effCol).as(validFrom) :+
      // open marker typed from the HISTORY's schema, so DATE- or
      // LTZ-valued validity columns union cleanly
      lit(null).cast(history.schema(validTo).dataType).as(validTo): _*)
    closed.unionByName(fresh)
  }

  /** Gate row: segment changes for keys ≡3 (mod 10) effective
    * 2001-06-01 applied to a seeded single-version history. Updated
    * keys yield a closed 2000→2001 version plus an open current one;
    * untouched keys keep their open seed version.
    */
  val q110 = EngineQuery(
    "q110_scd2_history",
    (s, dir) => {
      val t = Tables(s, dir)
      val hist = t.customer.select(col("c_custkey"), col("c_mktsegment"),
        lit("2000-01-01 00:00:00").cast("timestamp_ntz").as("valid_from"),
        lit(null).cast("timestamp_ntz").as("valid_to"))
      val chg = t.customer.filter(col("c_custkey") % 10 === 3)
        .select(col("c_custkey"), lit("SEG_UPDATED").as("c_mktsegment"),
          lit("2001-06-01 00:00:00").cast("timestamp_ntz").as("eff"))
      scd2(hist, chg, "c_custkey", "eff")
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy(col("c_custkey"), col("valid_from"))
    },
    Some("""WITH hist AS (
              SELECT c_custkey, c_mktsegment,
                TIMESTAMP '2000-01-01' AS valid_from,
                CAST(NULL AS TIMESTAMP) AS valid_to
              FROM customer
            ), chg AS (
              SELECT c_custkey, 'SEG_UPDATED' AS c_mktsegment,
                TIMESTAMP '2001-06-01' AS eff
              FROM customer WHERE c_custkey % 10 = 3
            ), closed AS (
              SELECT h.c_custkey, h.c_mktsegment, h.valid_from,
                CASE WHEN c.c_custkey IS NULL THEN h.valid_to
                     ELSE c.eff END AS valid_to
              FROM hist h LEFT JOIN chg c ON h.c_custkey = c.c_custkey
            ), newv AS (
              SELECT c_custkey, c_mktsegment, eff AS valid_from,
                CAST(NULL AS TIMESTAMP) AS valid_to
              FROM chg
            )
            SELECT c_custkey, c_mktsegment, valid_from, valid_to,
              valid_to IS NULL AS is_current
            FROM (SELECT * FROM closed UNION ALL SELECT * FROM newv)
            ORDER BY c_custkey, valid_from"""))

  /** Gate row: a deterministic changeset derived from the customer
    * snapshot itself — balance updates for keys ≡3 (mod 10), deletes
    * for keys ≡0 (mod 17) not already updated, inserts of new keys for
    * keys ≡7 (mod 25) — merged back in. The oracle rebuilds the same
    * changeset and replays the merge as FULL OUTER JOIN + CASE; the
    * single `+ 100.0` on a double is one bit-specified IEEE op, so
    * values hash-match.
    */
  val q105 = EngineQuery(
    "q105_merge_upsert",
    (s, dir) => {
      val t = Tables(s, dir)
      val snap = t.customer.select(col("c_custkey"), col("c_name"),
        col("c_acctbal"), col("c_mktsegment"))
      val upd = snap.filter(col("c_custkey") % 10 === 3)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 100.0).as("c_acctbal"),
          lit("UPDATED").as("c_mktsegment"), lit("U").as("op"))
      val del = snap
        .filter(col("c_custkey") % 17 === 0 && col("c_custkey") % 10 =!= 3)
        .withColumn("op", lit("D"))
      val ins = snap.filter(col("c_custkey") % 25 === 7)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          concat(lit("New"), col("c_name")).as("c_name"),
          lit(0.0).as("c_acctbal"), lit("NEW").as("c_mktsegment"),
          lit("I").as("op"))
      merge(snap, upd.unionByName(del).unionByName(ins),
        "c_custkey", "op")
        .orderBy(col("c_custkey"))
    },
    Some("""WITH snap AS (
              SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
            ), chg AS (
              SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal,
                'UPDATED' AS c_mktsegment, 'U' AS op
              FROM snap WHERE c_custkey % 10 = 3
              UNION ALL
              SELECT c_custkey, c_name, c_acctbal, c_mktsegment, 'D'
              FROM snap WHERE c_custkey % 17 = 0 AND c_custkey % 10 != 3
              UNION ALL
              SELECT c_custkey + 1000000, 'New' || c_name, 0.0, 'NEW', 'I'
              FROM snap WHERE c_custkey % 25 = 7
            )
            SELECT COALESCE(s.c_custkey, c.c_custkey) AS c_custkey,
              CASE WHEN (s.c_custkey IS NOT NULL AND c.op = 'U')
                     OR (s.c_custkey IS NULL AND c.op = 'I')
                   THEN c.c_name ELSE s.c_name END AS c_name,
              CASE WHEN (s.c_custkey IS NOT NULL AND c.op = 'U')
                     OR (s.c_custkey IS NULL AND c.op = 'I')
                   THEN c.c_acctbal ELSE s.c_acctbal END AS c_acctbal,
              CASE WHEN (s.c_custkey IS NOT NULL AND c.op = 'U')
                     OR (s.c_custkey IS NULL AND c.op = 'I')
                   THEN c.c_mktsegment ELSE s.c_mktsegment END
                AS c_mktsegment,
              CASE WHEN s.c_custkey IS NULL THEN 'inserted'
                   WHEN c.op = 'U' THEN 'updated' ELSE 'kept' END AS action
            FROM snap s FULL OUTER JOIN chg c ON s.c_custkey = c.c_custkey
            WHERE NOT (s.c_custkey IS NOT NULL AND c.c_custkey IS NOT NULL
                       AND c.op = 'D')
              AND (s.c_custkey IS NOT NULL OR c.op = 'I')
            ORDER BY c_custkey"""))

  val all: Seq[EngineQuery] = Seq(q105, q110)
}
