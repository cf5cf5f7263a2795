package graft.llmops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.{EngineQuery, Tables}
import PortableHash._

/** Reproducible corpus sampling + vocabulary extraction (training-data
  * curation steps a 100 TB pipeline runs constantly).
  *
  * Sampling is HASH-based, not `TABLESAMPLE`/`rand()`: Spark's sample
  * is partition-order-dependent, so two runs (or two engines) disagree.
  * A multiplicative hash of the stable row key selects the same rows on
  * any cluster layout, any engine — and makes the sample REPEATABLE,
  * which is what "10% of the corpus, same 10% next week" actually
  * requires. Per-stratum rates (here: keep non-English at a higher
  * rate) are a projection — no shuffle at all; the operator is a pure
  * filter over the scan.
  */
object Sampling {

  /** Keep-threshold per mille for each language stratum. */
  private def rateFor(lang: org.apache.spark.sql.Column) =
    when(lang === "en", lit(200L)).otherwise(lit(600L))

  /** Deterministic per-row draw in [0, 1000) — the shared
    * [[PortableHash.splitDraw]] rule (q48's leakage audit and q49's
    * selection order build on the same mix, by construction).
    */
  private def draw(key: org.apache.spark.sql.Column) = splitDraw(key)

  val q65 = EngineQuery(
    "q65_stratified_sample",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .filter(draw(col("doc_id")) < rateFor(col("lang")))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang, source, n_chars
            FROM documents
            WHERE (doc_id % 1000000007) * 2654435761 % 1000000007 % 1000
              < (CASE WHEN lang = 'en' THEN 200 ELSE 600 END)
            ORDER BY doc_id"""))

  /** Vocabulary extraction: top-20 tokens by DOCUMENT frequency (distinct
    * docs containing the token). Scale shape: per-doc distinct tokens
    * explode once, one hash-agg on token (map-side partials), top-k via
    * TakeOrderedAndProject — no global sort, no second shuffle. Ties
    * break on the token itself for a total order.
    */
  val q66 = EngineQuery(
    "q66_vocab_topk",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .select(col("doc_id"),
          explode(array_distinct(tokens(col("text")))).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("token"))
        .limit(20)
    },
    Some("""SELECT token, COUNT(*) AS doc_freq
            FROM (
              SELECT doc_id, UNNEST(list_distinct(
                string_split(trim(text), ' '))) AS token
              FROM documents)
            WHERE token != ''
            GROUP BY token ORDER BY doc_freq DESC, token LIMIT 20"""))

  /** Benchmark-contamination probe: flag corpus documents sharing any
    * 3-gram shingle with a probe set (here: the shingles of the first
    * two documents standing in for a benchmark suite). The scale shape
    * is the point — the probe set is SMALL BY DESIGN (benchmarks are
    * KBs, corpora are TBs), so it broadcasts and the corpus side is one
    * explode + broadcast hash join + one aggregation; never a LIKE/regex
    * scan (not indexable, no pushdown) and never a shuffle of the
    * corpus shingles.
    */
  val q67 = EngineQuery(
    "q67_contamination_probe",
    (s, dir) => {
      val t = Tables(s, dir)
      def sh(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"), tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(shingles3(col("ws"))).as("sh"))
      val probes = sh(t.documents.filter(col("doc_id") < 2))
        .select(col("sh")).distinct()
      sh(t.documents.filter(col("doc_id") >= 2))
        .join(broadcast(probes), "sh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (
              SELECT doc_id, string_split(trim(text), ' ') ws
              FROM documents
            ), sh AS (
              SELECT doc_id, UNNEST(list_distinct(
                [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                 for i in range(1, len(ws)-1)])) s
              FROM toks WHERE len(ws) >= 3
            ), probes AS (
              SELECT DISTINCT s FROM sh WHERE doc_id < 2
            )
            SELECT d.doc_id, COUNT(*) AS n_hits
            FROM sh d JOIN probes p USING (s)
            WHERE d.doc_id >= 2
            GROUP BY d.doc_id ORDER BY d.doc_id"""))

  /** Weighted (quality-proportional) sampling: the keep-rate is a
    * per-row FUNCTION of the row (here: proportional to document
    * length, capped) instead of a per-stratum constant — the shape
    * used for quality-weighted corpus downsampling. Still a pure
    * filter over the scan: draw and rate are both projections, zero
    * shuffle, repeatable on any layout/engine. The kept row carries
    * its draw and rate for audit.
    */
  val q114 = EngineQuery(
    "q114_weighted_sample",
    (s, dir) => {
      val t = Tables(s, dir)
      val rate = least(lit(1000L), expr("n_chars div 4"))
      t.documents
        .select(col("doc_id"), col("lang"), col("n_chars"),
          draw(col("doc_id")).as("draw"), rate.as("rate"))
        .filter(col("draw") < col("rate"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang, n_chars,
              (doc_id % 1000000007) * 2654435761 % 1000000007 % 1000
                AS draw,
              LEAST(1000, n_chars // 4) AS rate
            FROM documents
            WHERE (doc_id % 1000000007) * 2654435761 % 1000000007 % 1000
              < LEAST(1000, n_chars // 4)
            ORDER BY doc_id"""))

  /** Per-domain budgeted selection — data mixing under a budget: within
    * each source, take documents in priority order (longest first,
    * doc_id tiebreak) while the cumulative character count stays under
    * the domain budget (5000 chars — binding on the fixture, so the
    * truncation path executes). The running sum is a window PARTITIONED BY
    * source, so the sort is parallel across domains — a single global
    * budget would serialize into one sort partition at 100 TB (same
    * trade as q69 packing). Exact int64 cumulative sums; selection is
    * deterministic because the order is total.
    */
  val q115 = EngineQuery(
    "q115_budget_select",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      t.documents
        .select(col("source"), col("doc_id"), col("n_chars"),
          sum(col("n_chars")).over(w).as("cum_chars"))
        .filter(col("cum_chars") <= 5000L)
        // doc_id closes the order: cum_chars alone ties when a source
        // contains n_chars=0 rows (total-order determinism rule)
        .orderBy(col("source"), col("cum_chars"), col("doc_id"))
    },
    Some("""SELECT source, doc_id, n_chars, cum_chars FROM (
              SELECT source, doc_id, n_chars,
                CAST(SUM(n_chars) OVER (PARTITION BY source
                  ORDER BY n_chars DESC, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_chars
              FROM documents)
            WHERE cum_chars <= 5000
            ORDER BY source, cum_chars, doc_id"""))

  /** Deterministic global shuffle + shard assignment: the "shuffle the
    * corpus once, write N shards" step before training. Order comes from
    * a multiplicative hash of the stable row key — reproducible on any
    * cluster layout and any engine, unlike rand().
    *
    * The within-shard position is a DISTRIBUTED dense rank, not a
    * row_number over Window.partitionBy(shard): with N shards that
    * window is N partitions, so each sorts corpus/N rows in ONE task —
    * a scale-killer at 100 TB. Instead: (1) bucket the hash into 64
    * range blocks per shard, (2) count rows per (shard, block) — a tiny
    * N×64-row aggregate, (3) turn counts into per-block start offsets
    * with a window over that TINY table, broadcast back, (4) number
    * rows within (shard, block) — 64× finer windows, all parallel.
    * pos = block offset + within-block row_number, a dense 1..n per
    * shard with no single-task sort anywhere.
    */
  /** Distributed dense rank core of q75, over any (key) DataFrame:
    * hash → shard → block-range offsets → within-block numbering.
    * PropertySpec proves it equal to the naive one-window-per-shard
    * row_number on random inputs.
    */
  private[graft] def shardPositions(df: org.apache.spark.sql.DataFrame,
      key: String, nShards: Int): org.apache.spark.sql.DataFrame = {
    val h = ((col(key).cast(LongType) % P) * lit(2654435761L)
      + lit(12345L)) % P
    val rows = df
      .select(col(key), h.as("h"), (h % nShards).as("shard"),
        // range block: ~P/64-wide slices of the hash space, so block
        // order IS hash order and offsets compose
        (h / lit((P / 64) + 1)).as("blk"))
    val offsets = rows.groupBy(col("shard"), col("blk"))
      .agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("blk"))
          .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("shard"), col("blk"), col("off"))
    val wBlk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), col("blk")).orderBy(col("h"), col(key))
    rows
      .join(broadcast(offsets), Seq("shard", "blk"))
      .withColumn("pos",
        (col("off") + row_number().over(wBlk)).cast("int"))
      .select(col(key), col("shard"), col("pos"))
  }

  val q75 = EngineQuery(
    "q75_deterministic_shuffle",
    (s, dir) => {
      val t = Tables(s, dir)
      shardPositions(t.documents.select(col("doc_id")), "doc_id", 8)
        .orderBy(col("shard"), col("pos"))
    },
    Some("""SELECT doc_id, shard, pos FROM (
              SELECT doc_id,
                ((doc_id % 1000000007) * 2654435761 + 12345) % 1000000007 % 8
                  AS shard,
                ROW_NUMBER() OVER (
                  PARTITION BY ((doc_id % 1000000007) * 2654435761 + 12345)
                    % 1000000007 % 8
                  ORDER BY ((doc_id % 1000000007) * 2654435761 + 12345)
                    % 1000000007, doc_id) AS pos
              FROM documents)
            ORDER BY shard, pos"""))

  /** Per-source document cap (domain-frequency capping, the RefinedWeb /
    * C4 "max N pages per host" rule): within each source keep the top
    * `cap` documents by a quality key (longest text, ties on doc_id) and
    * report what the cap rejected. One window shuffle partitioned by
    * source — parallel across sources; a skewed mega-host bounds its
    * partition at |host| log |host| sort cost, and at 100 TB the
    * rank-then-filter runs per source-partition without any global stage.
    */
  val q77 = EngineQuery(
    "q77_per_source_cap",
    (s, dir) => {
      val t = Tables(s, dir)
      val cap = 10
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      t.documents
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("rk", row_number().over(w))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rk") <= cap, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rk") <= cap, col("n_chars")).otherwise(0L))
            .as("kept_chars"))
        .orderBy(col("source"))
    },
    Some("""WITH rk AS (
              SELECT doc_id, source, n_chars,
                ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY n_chars DESC, doc_id) AS rk
              FROM documents
            )
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN rk <= 10 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_kept,
              CAST(SUM(CASE WHEN rk <= 10 THEN n_chars ELSE 0 END) AS BIGINT)
                AS kept_chars
            FROM rk GROUP BY source ORDER BY source"""))

  /** Deterministic train/validation/test split: multiplicative-hash
    * bucket of doc_id → 80/10/10 assignment, with per-split size and
    * token-mass accounting. Zero-shuffle assignment (a pure projection —
    * the same row lands in the same split on any cluster, any partition
    * layout, any run); the audit rollup is one 3-group hash-agg.
    */
  val q78 = EngineQuery(
    "q78_train_val_test_split",
    (s, dir) => {
      val t = Tables(s, dir)
      val bucket = draw(col("doc_id"))
      val split = when(bucket < 800, "train")
        .when(bucket < 900, "val")
        .otherwise("test")
      t.documents
        .select(split.as("split"), col("n_chars"),
          (size(tokens(col("text")))).cast(LongType).as("n_words"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("n_words")).as("sum_words"))
        .orderBy(col("split"))
    },
    Some("""WITH sp AS (
              SELECT CASE
                  WHEN (doc_id % 1000000007) * 2654435761 % 1000000007
                    % 1000 < 800 THEN 'train'
                  WHEN (doc_id % 1000000007) * 2654435761 % 1000000007
                    % 1000 < 900 THEN 'val'
                  ELSE 'test' END AS split,
                n_chars,
                CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_words
              FROM documents
            )
            SELECT split, COUNT(*) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
              CAST(SUM(n_words) AS BIGINT) AS sum_words
            FROM sp GROUP BY split ORDER BY split"""))

  /** Temperature-based corpus mixing (α = 0.5): per-language sampling
    * targets proportional to n^α instead of n — the standard
    * multilingual rebalancing rule (dominant languages flatten, rare
    * ones up-weight). The fixture's English share drops from ~44% of
    * docs to ~30% of the mixed sample.
    *
    * Determinism across engines: sqrt is IEEE-correctly-rounded in both
    * JVMs and libm, the weight is floor(sqrt(n)·1e9) int64, and the
    * target allocation is exact integer arithmetic (B·w div ΣW) — no
    * float accumulates anywhere. Selection inside a language is the
    * hash-draw order (q65's rule), so the same docs are chosen on any
    * cluster. Scale shape: weights/targets are a |langs|-row broadcast;
    * selection is one per-lang window over pre-hash-ordered rows.
    */
  val q49 = EngineQuery(
    "q49_temperature_mixing",
    (s, dir) => {
      val t = Tables(s, dir)
      val budget = 100L
      val n = t.documents.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
      val w = n.withColumn("wt",
        floor(sqrt(col("n_docs").cast("double")) * lit(1e9)).cast(LongType))
      val tot = w.agg(sum(col("wt")).as("tw"))
      val tgt = w.crossJoin(broadcast(tot))
        .withColumn("target", expr(s"($budget * wt) div tw"))
        .select(col("lang"), col("n_docs"), col("target"))
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(mixHash(col("doc_id")), col("doc_id"))
      t.documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("rk", row_number().over(wRank))
        .join(broadcast(tgt), Seq("lang"))
        .filter(col("rk") <= col("target"))
        .groupBy(col("lang"))
        .agg(max(col("n_docs")).as("n_docs"),
          max(col("target")).as("target"),
          count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("kept_chars"))
        .orderBy(col("lang"))
    },
    Some("""WITH n AS (
              SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
            ), w AS (
              SELECT lang, n_docs,
                CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) * 1000000000.0)
                  AS BIGINT) AS wt
              FROM n
            ), tot AS (SELECT SUM(wt) AS tw FROM w),
            tgt AS (
              SELECT lang, n_docs,
                CAST((100 * wt) // tw AS BIGINT) AS target
              FROM w CROSS JOIN tot
            ), rk AS (
              SELECT doc_id, lang, n_chars,
                ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY (doc_id % 1000000007) * 2654435761 % 1000000007,
                    doc_id) AS rk
              FROM documents
            )
            SELECT r.lang, MAX(t.n_docs) AS n_docs, MAX(t.target) AS target,
              COUNT(*) AS n_kept, CAST(SUM(r.n_chars) AS BIGINT) AS kept_chars
            FROM rk r JOIN tgt t ON r.lang = t.lang
            WHERE r.rk <= t.target
            GROUP BY r.lang ORDER BY r.lang"""))

  /** Group-aware (source-level) holdout split — the leakage-free
    * complement to q78: q78's per-DOC hash puts near-identical pages
    * from one host on both sides of the train/test boundary (exactly
    * the contamination q48 audits for), so eval-split best practice
    * holds out whole GROUPS. The split key is the portable char hash
    * of `source` through the SAME mixHash draw as q78 — one shared
    * split-rule constant family, so the two split operators can never
    * silently desynchronize.
    *
    * Scale shape: the split is a per-row projection (hash of a column
    * already on the row — zero shuffle, no source registry to join);
    * the gate rollup is one map-side-combined agg. Group-split
    * variance is the documented trade: buckets move whole sources, so
    * realized proportions wobble with the source-size distribution
    * (17/2/1 sources on the fixture) — the price of a boundary no
    * duplicate can straddle.
    */
  /** The q172 source-level split label, shared with every consumer that
    * partitions work along the holdout boundary (the held-out tokenizer
    * eval q173 trains on `groupSplit === "train"` only) — one rule, one
    * constant family, so a consumer cannot silently desynchronize from
    * the split it claims to respect.
    *
    * coalesce mirrors the oracle's `coalesce(..., 0)` and tokenHashes'
    * 0-pinning: charPolyHash is NULL for the empty string, and an
    * un-coalesced NULL bucket would silently route empty/null sources
    * to 'test' in Spark but 'train' in DuckDB.
    */
  def groupSplit(source: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val bucket = splitDraw(coalesce(
      graft.functions.CharPolyHash.charPolyHash(source), lit(0L)))
    when(bucket < 800, "train")
      .when(bucket < 900, "val")
      .otherwise("test")
  }

  val q172 = EngineQuery(
    "q172_group_holdout_split",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .select(groupSplit(col("source")).as("split"), col("source"),
          col("n_chars"))
        .groupBy(col("split"))
        .agg(count_distinct(col("source")).as("n_sources"),
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("split"))
    },
    Some {
      // ONE SQL rendering of the split rule: the same PortableHash
      // helpers q173/q175's oracles use — a constant edited in the
      // helper updates every oracle that claims this split, so the
      // split gate and the held-out tokenizer gates cannot disagree
      // about which sources are train
      val draw = PortableHash.splitDrawSql("hv")
      s"""WITH h AS (
              SELECT source, n_chars,
                ${PortableHash.charHashSql("source")} AS hv
              FROM documents
            ), sp AS (
              SELECT CASE
                  WHEN $draw < 800 THEN 'train'
                  WHEN $draw < 900 THEN 'val'
                  ELSE 'test' END AS split,
                source, n_chars
              FROM h
            )
            SELECT split, COUNT(DISTINCT source) AS n_sources,
              COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM sp GROUP BY split ORDER BY split"""
    })

  /** Deterministic dataset SHARDING — the export step of the training
    * pipeline: a seeded hash permutation assigns every document to one
    * of 16 shards and fixes a fully-shuffled read order WITHIN each
    * shard, with NO GLOBAL SORT anywhere (the naive "rank the corpus,
    * slice into shards" plan is a single global window — the exact
    * operation that cannot exist at 100 TB). shard = permutation hash
    * mod 16 is pure projection; within-shard position is a window
    * PARTITIONED BY shard (parallel across shards, each a 1/16 slice).
    * Balance falls out of hash uniformity instead of coordination.
    *
    * The gate emits per-shard (n_docs, sum_tokens, n_sources) plus an
    * ORDER-pinning checksum: sum(position · (doc_id mod 1000003)),
    * exact int64 — any reordering, dropped doc, or shard-assignment
    * drift moves the checksum. Token counts are whitespace-token
    * counts (the q62 rule), so the shard plan is the real batch-size
    * input a loader consumes.
    */
  val q203 = EngineQuery(
    "q203_dataset_shard_plan",
    (s, dir) => {
      val t = Tables(s, dir)
      // reduce mod P BEFORE the Knuth multiply (the PortableHash
      // discipline): an unreduced doc_id * 2654435761 wraps int64 at
      // doc_id ≳ 3.47e9 — Spark would go negative while DuckDB raises
      // BIGINT overflow, diverging exactly at corpus scale
      val key = (((col("doc_id") % lit(P)) + 1L) * lit(2654435761L)) %
        lit(P)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
        .orderBy(col("key"), col("doc_id"))
      t.documents
        .select(col("doc_id"), col("source"),
          size(tokens(col("text"))).cast("long").as("n_tok"),
          key.as("key"))
        .withColumn("shard", col("key") % 16)
        .withColumn("pos", row_number().over(w).cast("long"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tokens"),
          count_distinct(col("source")).as("n_sources"),
          sum(col("pos") * (col("doc_id") % 1000003L)).as("order_sum"))
        .orderBy(col("shard"))
    },
    Some("""WITH keyed AS (
              SELECT doc_id, source,
                CAST(length(string_split(trim(text), ' ')) AS BIGINT)
                  AS n_tok,
                (((doc_id % 1000000007) + 1) * 2654435761)
                  % 1000000007 AS key
              FROM documents
            ), sharded AS (
              SELECT doc_id, source, n_tok, key % 16 AS shard,
                CAST(row_number() OVER (PARTITION BY key % 16
                  ORDER BY key, doc_id) AS BIGINT) AS pos
              FROM keyed
            )
            SELECT shard, COUNT(*) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
              COUNT(DISTINCT source) AS n_sources,
              CAST(SUM(pos * (doc_id % 1000003)) AS BIGINT) AS order_sum
            FROM sharded GROUP BY shard ORDER BY shard"""))

  /** Token-budget WATERFILLING allocation (the UniMax rule, Chung et
    * al. 2023) — the third member of the mixing family: q49 reweights
    * by a fixed temperature, q115 greedily fills per-source caps; this
    * operator allocates a GLOBAL token budget across sources under a
    * per-source epoch cap (cap = 2 epochs of the source), maximizing
    * uniformity: every source gets min(cap, T) where the water level T
    * is the largest integer with Σ min(cap_i, T) ≤ B, and the
    * sub-|sources| integer remainder goes +1 each to the largest
    * unsaturated sources (deterministic ties). T has a CLOSED FORM
    * over sorted prefix sums — no iteration: with caps ascending and
    * prefix sums P_j, the saturated prefix is the largest j with
    * cap_j·(n−j) + P_j ≤ B, and T = (B − P_j*) div (n − j*).
    *
    * Exactness: all integers (whitespace token counts via the shared
    * q62/BM25 dl rule); maximality of j* guarantees every source past
    * it has cap > T, so the +1 bonus never breaches a cap and the
    * allocation sums to exactly B (invariants spec-proven).
    *
    * Scale shape: ONE corpus scan into a source-keyed hash agg; every
    * window after that runs over the |sources|-row table (tiny by
    * construction — a registry, not a corpus). Σcap = 2B > B
    * structurally, so the all-saturated division-by-zero branch
    * cannot occur.
    */
  /** The q221 waterfill over any (source, text) docs frame — factored
    * so the scale harness can run it at amplified source counts.
    */
  private[graft] def waterfillOver(docs: org.apache.spark.sql.DataFrame,
      srcCol: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
      val W = org.apache.spark.sql.expressions.Window
      val tokCount = when(length(trim(col("text"))) === 0, lit(0L))
        .otherwise(size(tokens(col("text"))).cast(LongType))
      // the per-source table is consumed by four downstream branches
      // (totals, the sorted prefix scan, the level lookup, the final
      // allocation) — checkpoint it so the corpus is scanned ONCE,
      // not once per branch
      val src = graft.ops.SessionScratch.transientCheckpoint(
        docs
          .select(srcCol.as("source"), tokCount.as("tk"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("tok"))
          .withColumn("cap", lit(2L) * col("tok")))
      val tot = src.agg(sum(col("tok")).as("b"), count(lit(1)).as("n"))
      val wOrd = W.orderBy(col("cap"), col("source"))
      val ord = src.crossJoin(broadcast(tot))
        .withColumn("j", row_number().over(wOrd).cast(LongType))
        .withColumn("p", sum(col("cap")).over(
          wOrd.rowsBetween(W.unboundedPreceding, W.currentRow)))
      val jst = ord
        .agg(max(when(
          col("cap") * (col("n") - col("j")) + col("p") <= col("b"),
          col("j")).otherwise(lit(0L))).as("js"))
      val lvl = jst.crossJoin(broadcast(tot))
        .join(ord.select(col("j").as("js"), col("p").as("pj")),
          Seq("js"), "left")
        .select(col("b"), col("n"), col("js"),
          coalesce(col("pj"), lit(0L)).as("pj"))
        .withColumn("t_lvl", expr("(b - pj) div (n - js)"))
        .withColumn("rem", (col("b") - col("pj")) % (col("n") - col("js")))
        .select(col("t_lvl"), col("rem"))
      val wBonus = W.orderBy(
        when(col("cap") > col("t_lvl"), lit(0)).otherwise(lit(1)),
        col("cap").desc, col("source"))
      src.crossJoin(broadcast(lvl))
        .withColumn("alloc0", least(col("cap"), col("t_lvl")))
        .withColumn("brank", row_number().over(wBonus).cast(LongType))
        .withColumn("alloc", col("alloc0") +
          when(col("cap") > col("t_lvl") && col("brank") <= col("rem"),
            lit(1L)).otherwise(lit(0L)))
        .select(col("source"), col("n_docs"), col("tok"), col("cap"),
          col("alloc"),
          when(col("alloc") === col("cap"), lit(1)).otherwise(lit(0))
            .as("saturated"))
        .orderBy(col("source"))
  }

  val q221 = EngineQuery(
    "q221_budget_waterfill",
    (s, dir) => waterfillOver(Tables(s, dir).documents, col("source")),
    Some("""WITH dl AS (
              SELECT source,
                CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE length(trim(text))
                       - length(regexp_replace(trim(text), ' ', '', 'g')) + 1
                END AS BIGINT) AS tk
              FROM documents
            ), src AS (
              SELECT source, COUNT(*) AS n_docs,
                CAST(SUM(tk) AS BIGINT) AS tok,
                CAST(2*SUM(tk) AS BIGINT) AS cap
              FROM dl GROUP BY source
            ), tot AS (
              SELECT CAST(SUM(tok) AS BIGINT) AS b, COUNT(*) AS n FROM src
            ), ord AS (
              SELECT s.source, s.cap, t.b, t.n,
                CAST(row_number() OVER (ORDER BY s.cap, s.source)
                  AS BIGINT) AS j,
                CAST(SUM(s.cap) OVER (ORDER BY s.cap, s.source
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS p
              FROM src s CROSS JOIN tot t
            ), jst AS (
              SELECT MAX(CASE WHEN cap*(n - j) + p <= b
                THEN j ELSE 0 END) AS js
              FROM ord
            ), lvl AS (
              SELECT t.b, t.n, j.js, COALESCE(o.p, 0) AS pj
              FROM tot t CROSS JOIN jst j
              LEFT JOIN ord o ON o.j = j.js
            ), lv2 AS (
              SELECT CAST((b - pj) // (n - js) AS BIGINT) AS t_lvl,
                CAST((b - pj) % (n - js) AS BIGINT) AS rem
              FROM lvl
            ), br AS (
              SELECT s.source, s.n_docs, s.tok, s.cap, l.t_lvl, l.rem,
                CAST(row_number() OVER (ORDER BY
                  CASE WHEN s.cap > l.t_lvl THEN 0 ELSE 1 END,
                  s.cap DESC, s.source) AS BIGINT) AS brank
              FROM src s CROSS JOIN lv2 l
            )
            SELECT source, n_docs, tok, cap,
              CAST(LEAST(cap, t_lvl)
                + CASE WHEN cap > t_lvl AND brank <= rem
                    THEN 1 ELSE 0 END AS BIGINT) AS alloc,
              CASE WHEN LEAST(cap, t_lvl)
                  + CASE WHEN cap > t_lvl AND brank <= rem
                      THEN 1 ELSE 0 END = cap
                THEN 1 ELSE 0 END AS saturated
            FROM br ORDER BY source"""))

  val all: Seq[EngineQuery] =
    Seq(q49, q65, q66, q67, q75, q77, q78, q114, q115, q172, q203, q221)
}
