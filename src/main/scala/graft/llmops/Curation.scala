package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.ops.{EngineQuery, SessionScratch, Tables}

/** End-to-end training-data curation pipeline (north star): the composed
  * form of the individual llmops operators —
  *
  *   surface stats → quality gate → exact dedup (canonical doc per
  *   normalized fingerprint) → language scoring → token accounting
  *
  * One declarative plan: Catalyst fuses the per-row stages into the scan
  * projection, and the only shuffle is the dedup groupBy on the
  * fingerprint. At 100 TB this runs as scan → map → one exchange → map.
  */
object Curation {

  val MinWords = 5
  val MaxPunctRatio = 0.10

  /** Quality-gated rows with stats + fingerprint — the shared first
    * stage of [[curate]] and [[survivors]]. Stats come from the shared
    * [[TextStats]] expressions, so the gate agrees with the reported
    * q61/q63 statistics by construction.
    */
  def gated(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("text"),
      TextStats.nWords(col("text")).as("n_words"),
      TextStats.punctRatio(col("text")).as("punct_ratio"),
      TextStats.fingerprintMd5(col("text")).as("fp"))
      .filter(col("n_words") >= MinWords && col("punct_ratio") <= MaxPunctRatio)

  /** Just the surviving doc ids (canonical doc per fingerprint): ONE
    * hash aggregation — no join back, no sort. Downstream consumers
    * (q72) that only need the id set must use this, not [[curate]],
    * which pays a second exchange to re-attach the per-doc stats.
    */
  def survivors(docs: DataFrame): DataFrame =
    gated(docs).groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))

  /** The full curation plan over a `documents`-shaped frame. */
  def curate(docs: DataFrame): DataFrame = {
    val g = gated(docs)

    // exact dedup: canonical row = min doc_id per fingerprint
    val canonical = g
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))

    canonical
      .join(g, Seq("fp", "doc_id"))
      .select(col("doc_id"), col("fp"), col("lang"), col("n_words"),
        col("punct_ratio"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** The staged+gated CTE text shared by the q64 and q72 oracles — ONE
    * definition, so the SQL replica of the gate cannot silently diverge
    * between the queries that claim to share it.
    */
  val gateCtesSql: String =
    s"""staged AS (
         SELECT doc_id, lang, text,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE length(trim(text))
                     - length(regexp_replace(trim(text), ' ', '', 'g')) + 1
           END AS n_words,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST(length(text)
                     - length(regexp_replace(text, '[.,!?]', '', 'g'))
                     AS DOUBLE) / length(text)
           END AS punct_ratio,
           md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp
         FROM documents
       ), gated AS (
         SELECT * FROM staged
         WHERE n_words >= $MinWords AND punct_ratio <= $MaxPunctRatio
       )"""

  /** Driver-gate query: the whole pipeline, oracle-checked. */
  val q64 = EngineQuery(
    "q64_curation_pipeline",
    (s, dir) => curate(Tables(s, dir).documents),
    Some(s"""WITH $gateCtesSql, canonical AS (
              SELECT fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
              FROM gated GROUP BY fp
            )
            SELECT g.doc_id, g.fp, g.lang, g.n_words, g.punct_ratio,
              c.n_copies
            FROM canonical c JOIN gated g
              ON g.fp = c.fp AND g.doc_id = c.doc_id
            ORDER BY g.doc_id"""))

  /** Per-source RELATIVE quality pruning — drop each source's shortest
    * 30% by word count. Absolute gates ([[gated]]'s MinWords) mis-prune
    * when source length distributions differ (a floor tuned for web
    * text deletes half a short-form source or keeps all of a noisy
    * one); the percentile prune adapts per source.
    *
    * Scale design: aggregate-then-broadcast, NOT a per-source window —
    * the exact per-source threshold is one map-side-combined
    * percentile aggregate (|sources| rows out) broadcast back as a
    * filter. A `percent_rank` window would total-sort every source's
    * rows on one partition each; the threshold join touches each row
    * once in the scan projection. Same decorrelation shape as the
    * TPC-H Q17/Q22 composites.
    */
  val q59 = EngineQuery(
    "q59_quality_percentile_prune",
    (s, dir) => {
      val scored = Tables(s, dir).documents
        .select(col("doc_id"), col("source"),
          TextStats.nWords(col("text")).as("n_words"))
      val thresholds = scored.groupBy(col("source"))
        .agg(expr("percentile(n_words, 0.3)").as("thresh"))
      scored.join(broadcast(thresholds), Seq("source"))
        .filter(col("n_words") >= col("thresh"))
        .select(col("doc_id"), col("source"), col("n_words"),
          col("thresh"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH scored AS (
              SELECT doc_id, source,
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE length(trim(text))
                          - length(regexp_replace(trim(text), ' ', '', 'g'))
                          + 1
                END AS n_words
              FROM documents
            ), th AS (
              SELECT source, quantile_cont(n_words, 0.3) AS thresh
              FROM scored GROUP BY source
            )
            SELECT s.doc_id, s.source, s.n_words, t.thresh
            FROM scored s JOIN th t USING (source)
            WHERE s.n_words >= t.thresh
            ORDER BY s.doc_id"""))

  /** DSIR feature-space bucket count (hashed unigram features, Xie et
    * al. 2023 "Data Selection for Language Models via Importance
    * Resampling" use 10k n-gram hash buckets; 1024 keeps the fixture
    * LM tables broadcast-tiny while preserving the architecture).
    */
  val DsirBuckets = 1024L

  /** Fixed-point scale for the per-bucket importance ratio. */
  val DsirScale = 1000000L

  /** DSIR importance resampling (deterministic analog of Xie et al.
    * 2023): select raw-corpus documents whose hashed-unigram feature
    * distribution looks like a TARGET corpus (here: the `lang='en'`
    * slice, standing in for "high-quality reference corpus"). Per
    * token-hash bucket b the importance ratio is
    *
    *   w_b = floor( (tgt_b + 1) * 1e6 / (raw_b + 1) )   (add-1 smoothed)
    *
    * exact integer division in both engines; a document's score is the
    * mean bucket ratio over its tokens (sum exact int64, one IEEE
    * division at the boundary). The true DSIR weight is the PRODUCT of
    * ratios (sum of logs); ranking by the fixed-point mean keeps the
    * selection deterministic and cross-engine bit-identical — ln() is
    * not reproducible across engines — and preserves the architecture:
    * fit two bucket LMs, score raw docs, keep the top of the
    * importance order.
    *
    * Scale shape (100 TB): BOTH "LMs" come from one map-side-combined
    * hash-agg (target count = conditional sum in the same pass),
    * output bounded by the bucket count (1024 rows) — never
    * corpus-bounded; the weight table broadcasts; scoring is a
    * map-side broadcast join + per-doc agg. Two passes over the corpus
    * total (fit, then score) — exactly the published algorithm's I/O
    * shape. The final top-k is TakeOrderedAndProject, no global sort.
    */
  val q157 = EngineQuery(
    "q157_dsir_importance_resampling",
    (s, dir) => {
      import PortableHash.{tokens, tokenHashes}
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), col("source"),
          tokenHashes(tokens(col("text"))).as("ths"))
        .select(col("doc_id"), col("lang"), col("source"),
          explode(col("ths")).as("th"))
        .withColumn("b", col("th") % DsirBuckets)
      // both LMs from ONE pass over the exploded tokens: the target
      // count is a conditional sum inside the same hash-agg, so the
      // fit stage scans the corpus once, not twice
      val w = toks.groupBy(col("b"))
        .agg(count(lit(1)).as("r"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t"))
        .select(col("b"),
          expr(s"((t + 1) * $DsirScale) div (r + 1)").as("w"))
      toks.join(broadcast(w), Seq("b"))
        .groupBy(col("doc_id"), col("lang"), col("source"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("sum_w"))
        .withColumn("avg_w", col("sum_w").cast(DoubleType) /
          col("n_tokens").cast(DoubleType))
        .orderBy(col("avg_w").desc, col("doc_id"))
        .limit(100)
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, lang, source,
                string_split(trim(text), ' ') ws
              FROM documents
            ), th AS (
              SELECT doc_id, lang, source,
                [coalesce(list_sum([(ascii(w[i])
                    * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                    % 1000000007
                    for i in range(1, length(w)+1)]) % 1000000007, 0)
                 for w in ws] AS ths
              FROM toks
            ), tok AS (
              SELECT doc_id, lang, source, UNNEST(ths) % $DsirBuckets AS b
              FROM th
            ), lm AS (
              SELECT b, COUNT(*) AS r,
                CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                     AS BIGINT) AS t
              FROM tok GROUP BY b
            ), w AS (
              SELECT b, ((t + 1) * $DsirScale) // (r + 1) AS w FROM lm
            )
            SELECT tok.doc_id, tok.lang, tok.source,
              COUNT(*) AS n_tokens,
              CAST(SUM(w.w) AS BIGINT) AS sum_w,
              CAST(SUM(w.w) AS DOUBLE) / COUNT(*) AS avg_w
            FROM tok JOIN w ON tok.b = w.b
            GROUP BY tok.doc_id, tok.lang, tok.source
            ORDER BY avg_w DESC, tok.doc_id
            LIMIT 100"""),
    bench = true)

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): split each
    * language's documents into head / middle / tail thirds by LM score.
    * The LM score is q76's deterministic perplexity analog (mean corpus
    * bigram frequency — higher = more fluent = "head").
    *
    * Tertile cuts come from a HISTOGRAM, not a per-language window
    * sort — the production CCNet shape: coarse score bucket
    * cb = floor(score*100) (exact IEEE arithmetic both engines), one
    * map-side-combined (lang, cb) count agg, cumulative counts over
    * that tiny histogram, integer threshold rule 3·cum ≥ total (no
    * division), cuts broadcast back. Boundary-bucket docs all land in
    * the higher band, so head/middle are ≥ n/3 and ≥ 2n/3 by
    * construction — the documented approximation of histogram
    * quantiles.
    *
    * Scale shape (100 TB): corpus-sized stages are one bigram
    * hash-agg + one per-doc agg (shared with q76); the window runs
    * over |langs|×|score buckets| rows only; assignment is a broadcast
    * join in the scan projection.
    */
  val q158 = EngineQuery(
    "q158_ccnet_perplexity_buckets",
    (s, dir) => {
      import PortableHash.{tokens, tokenHashes, spanHashes}
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), col("lang"),
          tokenHashes(col("ws")).as("ths"))
      val bigrams = toks.select(col("doc_id"), col("lang"),
        explode(spanHashes(col("ths"), 2)).as("gh"))
      val lm = bigrams.groupBy(col("gh")).agg(count(lit(1)).as("freq"))
      val scored = bigrams.join(lm, Seq("gh"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("freq")).as("sum_freq"))
        .select(col("doc_id"), col("lang"),
          (col("sum_freq").cast(DoubleType) /
            col("n_bigrams").cast(DoubleType)).as("score"))
        .withColumn("cb", floor(col("score") * 100).cast(LongType))
      val hist = scored.groupBy(col("lang"), col("cb"))
        .agg(count(lit(1)).as("cnt"))
      val byCbDesc = Window.partitionBy("lang").orderBy(col("cb").desc)
      val cum = hist
        .withColumn("cum", sum("cnt").over(byCbDesc))
        .withColumn("total", sum("cnt").over(Window.partitionBy("lang")))
      val cuts = cum.groupBy(col("lang")).agg(
        max(when(col("cum") * 3 >= col("total"), col("cb"))).as("head_cut"),
        max(when(col("cum") * 3 >= col("total") * 2, col("cb"))).as("mid_cut"))
      scored.join(broadcast(cuts), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("score"), col("cb"),
          when(col("cb") >= col("head_cut"), "head")
            .when(col("cb") >= col("mid_cut"), "middle")
            .otherwise("tail").as("ppl_bucket"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, lang, string_split(trim(text), ' ') ws
              FROM documents
            ), th AS (
              SELECT doc_id, lang,
                [coalesce(list_sum([(ascii(w[i])
                    * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                    % 1000000007
                    for i in range(1, length(w)+1)]) % 1000000007, 0)
                 for w in ws] AS ths
              FROM toks WHERE len(ws) >= 2
            ), g AS (
              SELECT doc_id, lang,
                UNNEST([(${PortableHash.spanHashSql("ths", 2)})
                        for i in range(1, len(ths))]) AS gh
              FROM th
            ), lm AS (
              SELECT gh, COUNT(*) AS freq FROM g GROUP BY gh
            ), scored AS (
              SELECT g.doc_id, g.lang,
                CAST(SUM(lm.freq) AS DOUBLE) / COUNT(*) AS score,
                CAST(floor((CAST(SUM(lm.freq) AS DOUBLE) / COUNT(*)) * 100)
                     AS BIGINT) AS cb
              FROM g JOIN lm ON g.gh = lm.gh
              GROUP BY g.doc_id, g.lang
            ), hist AS (
              SELECT lang, cb, COUNT(*) AS cnt FROM scored GROUP BY lang, cb
            ), cum AS (
              SELECT lang, cb,
                SUM(cnt) OVER (PARTITION BY lang ORDER BY cb DESC) AS cum,
                SUM(cnt) OVER (PARTITION BY lang) AS total
              FROM hist
            ), cuts AS (
              SELECT lang,
                MAX(CASE WHEN cum*3 >= total THEN cb END) AS head_cut,
                MAX(CASE WHEN cum*3 >= 2*total THEN cb END) AS mid_cut
              FROM cum GROUP BY lang
            )
            SELECT s.doc_id, s.lang, s.score, s.cb,
              CASE WHEN s.cb >= c.head_cut THEN 'head'
                   WHEN s.cb >= c.mid_cut THEN 'middle'
                   ELSE 'tail' END AS ppl_bucket
            FROM scored s JOIN cuts c ON s.lang = c.lang
            ORDER BY s.doc_id"""))

  /** Hashed-feature bucket count for the linear quality classifier. */
  val ClfBuckets = 4096L

  /** Hashed unigram+bigram (doc_id, b) feature rows — the shared front
    * half of classifier INFERENCE (q168) and TRAINING (q176): one
    * documents scan, both n-gram orders exploded in the same
    * projection.
    */
  private[graft] def classifierFeatures(docs: DataFrame): DataFrame = {
    import PortableHash.{tokens, tokenHashes}
    bucketsFromTh(docs.select(col("doc_id"),
      tokenHashes(tokens(col("text"))).as("ths")))
  }

  /** Bucket explode over a precomputed (doc_id, ths) token-hash frame —
    * lets q177 share one corpus scan between labels and features.
    */
  private[graft] def bucketsFromTh(th: DataFrame): DataFrame = {
    import PortableHash.spanHashes
    val B = ClfBuckets
    th.filter(size(col("ths")) >= 2)
      .select(col("doc_id"), explode(concat(
        transform(col("ths"), t => t % B),
        transform(spanHashes(col("ths"), 2), g => g % B))).as("b"))
  }

  /** fastText-style linear quality classifier INFERENCE (Joulin et al.
    * 2017 architecture; the quality-filter stage of CCNet-style
    * curation pipelines, where a linear model over hashed bag-of-ngram
    * features scores every page). The reference pipeline has no model
    * host (sql_generator.py's LLM dispatch is the same missing piece);
    * what the ENGINE owns is the inference plumbing, which is real
    * here: a |buckets|-row weight table broadcast into one corpus
    * pass. Weights are a deterministic function of the bucket id (a
    * stand-in for trained parameters — swapping in a real model is
    * loading a different 4096-row table); features are hashed word
    * unigrams + bigrams, the published fastText recipe.
    *
    * Determinism: weights, feature hashes, and the score sum are exact
    * int64; the mean crosses to double once at the boundary (one IEEE
    * division — identical in both engines). `keep` is the sign of the
    * integer sum, so classification never touches a float.
    *
    * Scale shape (100 TB): the model is 4096 rows broadcast to every
    * executor (a real 2M-bucket fastText weight vector is ~8 MB — still
    * broadcast range); ONE documents scan explodes unigram+bigram
    * buckets in the same projection (no second scan for the second
    * n-gram order), the weight join is map-side, and the per-doc
    * rollup is map-side-combined — shuffle carries |docs| rows, never
    * features.
    */
  /** The classifier-inference core over an ARBITRARY (doc_id, text)
    * frame — shared by the q168 gate query and the streaming twin
    * (StreamingSpec scores micro-batches through foreachBatch with
    * this exact function: per-doc scoring is stateless, so stream
    * output == batch output by construction, and the spec proves the
    * harness composition).
    */
  def classifierScores(docs: DataFrame): DataFrame = {
    // the model table IS the distillation teacher — one definition
    // (teacherWeights), so q168 inference and the q176/q177 teacher
    // cannot silently desynchronize
    val weights = teacherWeights(docs.sparkSession)
      .withColumnRenamed("tw", "wt")
    val feats = classifierFeatures(docs)
    feats.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("wt")).as("w_sum"))
      .select(col("doc_id"), col("n_feats"), col("w_sum"),
        (col("w_sum").cast(DoubleType) /
          col("n_feats").cast(DoubleType)).as("score"),
        (col("w_sum") >= 0).as("keep"))
  }

  val q168 = EngineQuery(
    "q168_quality_classifier",
    (s, dir) => classifierScores(Tables(s, dir).documents)
      .orderBy(col("doc_id")),
    Some(s"""WITH w AS (
              SELECT p AS b,
                ((p+1)*2654435761 % 1000000007) % 2001 - 1000 AS wt
              FROM (SELECT UNNEST(range(0, $ClfBuckets)) p)
            ), toks AS (
              SELECT doc_id, string_split(trim(text), ' ') ws
              FROM documents
            ), th AS (
              SELECT doc_id,
                [coalesce(list_sum([(ascii(w[i])
                    * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                    % 1000000007
                    for i in range(1, length(w)+1)]) % 1000000007, 0)
                 for w in ws] AS ths
              FROM toks WHERE len(ws) >= 2
            ), feats AS (
              SELECT doc_id, UNNEST(list_concat(
                [t % $ClfBuckets for t in ths],
                [(${PortableHash.spanHashSql("ths", 2)}) % $ClfBuckets
                 for i in range(1, len(ths))])) AS b
              FROM th
            ), scored AS (
              SELECT f.doc_id, COUNT(*) AS n_feats,
                CAST(SUM(w.wt) AS BIGINT) AS w_sum
              FROM feats f JOIN w ON f.b = w.b
              GROUP BY f.doc_id
            )
            SELECT doc_id, n_feats, w_sum,
              CAST(w_sum AS DOUBLE) / n_feats AS score,
              w_sum >= 0 AS keep
            FROM scored ORDER BY doc_id"""))

  /** Batch-perceptron training rounds for q176. */
  val ClfRounds = 10

  /** Teacher-confidence floor: only documents the teacher scores at
    * least this far from its decision boundary enter training and
    * evaluation — standard distillation practice (confidence
    * filtering), and on this fixture a necessity: teacher scores are
    * roughly symmetric around 0 (median |score| ≈ 4k), so unfiltered
    * labels have near-zero margin for half the mass and ANY batch
    * update flips them wholesale (measured as a period-2 miss-count
    * cycle).
    */
  val MarginMin = 4000L

  /** Teacher weight table of the q168 inference model, as a frame —
    * the DISTILLATION target: q176 trains a student to reproduce the
    * served model's keep/drop decisions from (features, label) pairs
    * alone. The teacher is exactly linear in the student's own feature
    * space, so the concept is separable and Novikoff's perceptron
    * bound applies — the training curve must collapse. (Label choices
    * OUTSIDE the architecture's concept class — a token-count
    * threshold, the fixture's content-uncorrelated `lang` column —
    * were measured oscillating into degenerate one-class models: the
    * batch perceptron correctly failing on concepts it cannot
    * represent.)
    */
  private def teacherWeights(s: org.apache.spark.sql.SparkSession)
      : DataFrame = {
    import PortableHash.P
    s.range(0, ClfBuckets).select(col("id").as("b"),
      (((col("id") + 1) * lit(2654435761L)) % P % 2001L - 1000L)
        .as("tw"))
  }

  /** Teacher labels off a (doc_id, b, c) feature table: y = sign of
    * the teacher score (the q168 `keep` rule, `>= 0` maps to +1). The
    * bias bucket has no teacher row and contributes nothing — the
    * teacher never saw it.
    */
  private def teacherLabels(fx: DataFrame): DataFrame =
    fx.join(broadcast(teacherWeights(fx.sparkSession)), Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * coalesce(col("tw"), lit(0L))).as("ts"))
      .filter(abs(col("ts")) >= MarginMin)
      .select(col("doc_id"),
        when(col("ts") >= 0, 1L).otherwise(-1L).as("y"))


  /** Linear classifier TRAINING (q176) — the learning half of the
    * q168 inference stage, as model DISTILLATION: the served teacher
    * (q168's weight table) labels the q172 TRAIN split, a
    * [[MarginMin]] confidence filter drops boundary decisions, and a
    * batch perceptron with a geometric step schedule learns a student
    * over the same hashed unigram+bigram buckets. Every quantity is
    * exact int64: scores are integer weight sums, the
    * misclassification rule is `y·score <= 0` (sign(0) counts as a
    * miss — the classic perceptron convention), and epoch r's update
    * is `w += (Σ_miss y·x) · 2^(R−r)` — the step schedule is integer
    * POWERS OF TWO, so the oracle replays ALL [[ClfRounds]] epochs
    * bit-exactly and partitioning cannot flip a single weight. A
    * float learning rate or logistic loss would make epoch results
    * partition-order-dependent; constant-step batch updates were
    * measured oscillating in a period-2 miss cycle (classic
    * overshoot), while this schedule converges to ~7% training error
    * on the fixture — matching an online-perceptron reference run.
    *
    * Scale shape (100 TB): ONE documents scan builds the (doc, bucket,
    * count) feature table, checkpointed HASH-PARTITIONED on doc_id
    * ([[graft.ops.SessionScratch.partitionedTransientCheckpoint]]) so
    * each epoch's two consumers — the per-doc score rollup and the
    * miss-join — reuse the partitioning instead of re-exchanging the
    * feature table every round (the Pregel edge-list move). The weight
    * vector is ≤ [[ClfBuckets]] rows, broadcast into the score join;
    * per-epoch driver state is two scalars (miss count, |w|₁ — the
    * KMeans discipline). Epoch count is FIXED.
    */
  final case class ClfTrained(curve: Seq[(Long, Long, Long)],
      w: DataFrame)

  /** The training loop — memoized per (app, dir): training is the
    * ingest half shared by the q176 learning-curve gate and the q177
    * held-out eval (the [[Bpe.train]] contract). The final weight
    * table stays pinned for the session; per-epoch scratch (labels,
    * features, miss sets) is transient.
    */
  def trainClassifier(s: org.apache.spark.sql.SparkSession,
      dir: String): ClfTrained =
    SessionScratch.memo("clf_train", s.sparkContext.applicationId, dir) {
      trainClassifierOn(s, Tables(s, dir).documents
        .withColumn("split", Sampling.groupSplit(col("source")))
        .filter(col("split") === "train"))
    }

  /** The UNmemoized loop over an arbitrary train frame — public so the
    * determinism spec can re-execute training for real (a rerun through
    * [[trainClassifier]] just returns the memo's cached curve, which
    * can never disagree with itself).
    */
  /** The shared training-data prep: augmented feature table
    * (checkpointed HASH-PARTITIONED on doc_id) + confident teacher
    * labels — extracted so the plan audit can probe one epoch's exact
    * plan shape ([[epochPlanProbe]]) without running all
    * [[ClfRounds]] epochs.
    */
  private def clfPrep(train: DataFrame): (DataFrame, DataFrame) = {
      // augmented input: every doc carries a constant BIAS feature at
      // bucket id ClfBuckets (one past the hash range) — the standard
      // augmented-input intercept. The teacher itself is homogeneous,
      // but the MarginMin filter skews the labeled class balance and
      // the intercept lets the student absorb that shift; featureless
      // (<2-token) docs still get the bias row, so they are
      // classifiable rather than pinned to score 0.
      val fxAll = SessionScratch.transientCheckpoint(
        classifierFeatures(train)
          .unionByName(train.select(col("doc_id"),
            lit(ClfBuckets).as("b")))
          .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c")))
      // labels come off the SAME feature table (one corpus scan total)
      val lab = SessionScratch.transientCheckpoint(teacherLabels(fxAll))
      // epochs iterate ONLY the margin-confident labeled docs (~half
      // the mass survives the filter) — scoring the dropped docs every
      // epoch would be wasted work the oracle never does (its s_r
      // starts FROM lab)
      val fx = SessionScratch.partitionedTransientCheckpoint(
        fxAll.join(lab.select(col("doc_id")), Seq("doc_id"),
          "left_semi"),
        Seq(col("doc_id")))
      SessionScratch.releaseCheckpoint(fxAll)
      (fx, lab)
  }

  /** One epoch's (scores, delta) frames UNEXECUTED over the real
    * checkpointed feature table, with the teacher weight table standing
    * in for the epoch's weights (same 4096-row broadcast shape) — the
    * ExplainAudit hook proving the scale claims of q176's loop as plan
    * assertions: the score rollup reuses the checkpoint's doc_id hash
    * partitioning (no exchange between the scan and the aggregate), the
    * weight join is broadcast, and the miss-join's fx side never
    * re-exchanges.
    */
  private[graft] def epochPlanProbe(s: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val train = Tables(s, dir).documents
      .withColumn("split", Sampling.groupSplit(col("source")))
      .filter(col("split") === "train")
    val (fx, lab) = clfPrep(train)
    val w = teacherWeights(s).withColumnRenamed("tw", "w")
    val scores = fx.join(broadcast(w), Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * coalesce(col("w"), lit(0L))).as("score"))
    // the miss set materializes exactly as in the training loop, so the
    // delta plan below is the loop's real second consumer
    val miss = SessionScratch.transientCheckpoint(
      lab.join(scores, Seq("doc_id"), "left")
        .select(col("doc_id"), col("y"),
          coalesce(col("score"), lit(0L)).as("score"))
        .filter(col("y") * col("score") <= 0)
        .select(col("doc_id"), col("y")))
    val delta = fx.join(miss, Seq("doc_id"))
      .groupBy(col("b")).agg(sum(col("c") * col("y")).as("dw"))
    (scores, delta)
  }

  def trainClassifierOn(s: org.apache.spark.sql.SparkSession,
      train: DataFrame): ClfTrained = {
      import s.implicits._
      val (fx, lab) = clfPrep(train)
      var w = Seq.empty[(Long, Long)].toDF("b", "w").localCheckpoint()
      val curve = Seq.newBuilder[(Long, Long, Long)]
      for (r <- 1 to ClfRounds) {
        val scores = fx.join(broadcast(w), Seq("b"), "left")
          .groupBy(col("doc_id"))
          .agg(sum(col("c") * coalesce(col("w"), lit(0L))).as("score"))
        // materialized: the epoch's miss set is consumed by the delta
        // agg AND the curve count, and its lazy plan references the
        // CURRENT weights — which are released the moment the next
        // epoch's weights exist (counting it lazily afterwards would
        // read a dead checkpoint)
        val miss = SessionScratch.transientCheckpoint(
          lab.join(scores, Seq("doc_id"), "left")
            .select(col("doc_id"), col("y"),
              coalesce(col("score"), lit(0L)).as("score"))
            .filter(col("y") * col("score") <= 0)
            .select(col("doc_id"), col("y")))
        // geometric step decay: epoch r's update is scaled by
        // 2^(R-r) — the whole schedule is integer POWERS OF TWO, so
        // there is no division anywhere (a divided step would need
        // floor-vs-truncate care on negative sums across engines).
        // Constant-step batch updates measured a period-2 miss-count
        // cycle (classic overshoot); under this schedule the same
        // data converges to ~7% training error, matching the online
        // perceptron reference.
        val delta = fx.join(miss, Seq("doc_id"))
          .groupBy(col("b")).agg(sum(col("c") * col("y")).as("dw"))
          .select(col("b"),
            (col("dw") * lit(1L << (ClfRounds - r))).as("w"))
        val prev = w
        w = w.unionByName(delta)
          .groupBy(col("b")).agg(sum(col("w")).as("w"))
          .localCheckpoint()
        SessionScratch.releaseCheckpoint(prev)
        val nm = miss.count()
        val l1r = w.agg(sum(abs(col("w")))).head()
        SessionScratch.releaseCheckpoint(miss)
        curve += ((r.toLong, nm,
          if (l1r.isNullAt(0)) 0L else l1r.getLong(0)))
      }
      // the converged weights stay pinned — the memo hands them to q177
      // — but the training-only feature/label checkpoints are dead the
      // moment the loop ends: releasing them here (not at some caller's
      // evictTransients) is what keeps a multi-store remediation sweep
      // over N classifiers at ONE training set resident, not N
      SessionScratch.releaseCheckpoint(fx)
      SessionScratch.releaseCheckpoint(lab)
      ClfTrained(curve.result(), w)
    }

  /** Shared oracle prefix: split buckets, train-split labels +
    * features, and all [[ClfRounds]] unrolled epochs (`w0`..`wN`).
    */
  private[llmops] def clfFeatCtes(tag: String, docsRel: String): String =
    s""", toks$tag AS (
          SELECT doc_id, string_split(trim(text), ' ') ws FROM $docsRel
        ), th$tag AS (
          SELECT doc_id,
            [coalesce(list_sum([(ascii(w[i])
                * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                % 1000000007
                for i in range(1, length(w)+1)]) % 1000000007, 0)
             for w in ws] AS ths
          FROM toks$tag WHERE len(ws) >= 2
        ), fx$tag AS MATERIALIZED (
          SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT doc_id, UNNEST(list_concat(
              [t % $ClfBuckets for t in ths],
              [(${PortableHash.spanHashSql("ths", 2)}) % $ClfBuckets
               for i in range(1, len(ths))])) AS b
            FROM th$tag
            UNION ALL
            SELECT doc_id, CAST($ClfBuckets AS BIGINT) AS b
            FROM $docsRel
          ) GROUP BY 1, 2
        )"""

  /** The q176 oracle prefix, with the TRAIN relation's predicate
    * parameterizable: `extra` is appended to the split filter (empty
    * for q176/q177's full-corpus student; ` AND doc_id % 2 = 0` for
    * q190/q191's day-2 student trained on the existing corpus only).
    * `lead` lets the block open a WITH chain (default) or continue an
    * existing one (", " — q191 appends it after the dedup pair CTEs).
    * `trainPred` replaces the train-split bucket filter wholesale
    * ("TRUE" for a student trained on EVERY doc — q239's remediated
    * model, whose recorded locator selects the whole corpus).
    */
  private[llmops] def clfOracleCtesOver(extra: String,
      lead: String = "WITH ", featTag: String = "",
      trainPred: String = "bkt < 800"): String = {
    val bucket = PortableHash.splitDrawSql(
      PortableHash.charHashSql("source"))
    val head = s"""${lead}sp AS MATERIALIZED (
          SELECT doc_id, text, $bucket AS bkt FROM documents
        ), train AS MATERIALIZED (
          SELECT doc_id, text FROM sp WHERE $trainPred$extra
        )""" + clfFeatCtes(featTag, "train") + s""", tw AS MATERIALIZED (
          SELECT p AS b,
            ((p+1)*2654435761 % 1000000007) % 2001 - 1000 AS tw
          FROM (SELECT UNNEST(range(0, $ClfBuckets)) p)
        ), lab AS MATERIALIZED (
          SELECT doc_id, CASE WHEN ts >= 0 THEN 1 ELSE -1 END AS y
          FROM (
            SELECT f.doc_id,
              CAST(COALESCE(SUM(f.c * t.tw), 0) AS BIGINT) AS ts
            FROM fx$featTag f LEFT JOIN tw t ON t.b = f.b
            GROUP BY f.doc_id
          ) WHERE ABS(ts) >= $MarginMin
        ), w0 AS (
          SELECT CAST(NULL AS BIGINT) AS b, CAST(NULL AS BIGINT) AS w
          WHERE 1 = 0
        )"""
    val rounds = (1 to ClfRounds).map { r =>
      s""", s$r AS MATERIALIZED (
          SELECT l.doc_id, l.y,
            CAST(COALESCE(SUM(f.c * w.w), 0) AS BIGINT) AS score
          FROM lab l
          LEFT JOIN fx$featTag f ON f.doc_id = l.doc_id
          LEFT JOIN w${r - 1} w ON w.b = f.b
          GROUP BY 1, 2
        ), m$r AS MATERIALIZED (
          SELECT doc_id, y FROM s$r WHERE y * score <= 0
        ), d$r AS (
          SELECT f.b,
            CAST(SUM(f.c * m.y) * ${1L << (ClfRounds - r)} AS BIGINT)
              AS w
          FROM fx$featTag f JOIN m$r m ON m.doc_id = f.doc_id
          GROUP BY f.b
        ), w$r AS MATERIALIZED (
          SELECT b, CAST(SUM(w) AS BIGINT) AS w FROM (
            SELECT b, w FROM w${r - 1}
            UNION ALL SELECT b, w FROM d$r
          ) GROUP BY b
        )"""
    }.mkString
    head + rounds
  }

  val q176 = EngineQuery(
    "q176_classifier_training",
    (s, dir) => {
      import s.implicits._
      trainClassifier(s, dir).curve.toDF("round", "n_miss", "w_l1")
        .orderBy(col("round"))
    },
    Some {
      val out = (1 to ClfRounds).map { r =>
        s"""SELECT CAST($r AS BIGINT) AS round,
              (SELECT COUNT(*) FROM m$r) AS n_miss,
              (SELECT CAST(COALESCE(SUM(ABS(w)), 0) AS BIGINT) FROM w$r)
                AS w_l1"""
      }.mkString(" UNION ALL ")
      clfOracleCtesOver("") + s" $out ORDER BY round"
    })

  /** Held-out classifier evaluation (q177) — the end of the ML loop
    * the classifier family now covers: featurize (q168's buckets) →
    * train (q176's epochs) → EVALUATE generalization on the q172
    * val/test sources the training never saw, against the same weak
    * label. Integer scores, `pred = score > 0`, exact confusion
    * counts; accuracy is the one boundary division.
    *
    * Scale shape: the held-out corpus is scanned ONCE — labels and
    * token hashes come out of the same projection, checkpointed, and
    * both consumers (the label rollup and the feature explode) read
    * the checkpoint; trained weights broadcast (≤ [[ClfBuckets]]
    * rows).
    */
  val q177 = EngineQuery(
    "q177_classifier_holdout_eval",
    (s, dir) => {
      import PortableHash.{tokens, tokenHashes}
      val st = trainClassifier(s, dir).w
      val held = Tables(s, dir).documents
        .withColumn("split", Sampling.groupSplit(col("source")))
        .filter(col("split") =!= "train")
      // ONE held-corpus scan: token hashes checkpointed, features +
      // bias derived from the checkpoint
      val hb = SessionScratch.transientCheckpoint(
        held.select(col("split"), col("doc_id"),
          tokenHashes(tokens(col("text"))).as("ths")))
      val hfx = bucketsFromTh(hb.select(col("doc_id"), col("ths")))
        .unionByName(hb.select(col("doc_id"),
          lit(ClfBuckets).as("b")))
        .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      // teacher + student weights merged into ONE broadcast table so
      // both scores come out of a single pass over the features
      val wb = teacherWeights(s)
        .join(st.withColumnRenamed("w", "sw"), Seq("b"), "full")
      val sc = hfx.join(broadcast(wb), Seq("b"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(col("c") * coalesce(col("tw"), lit(0L))).as("ts"),
          sum(col("c") * coalesce(col("sw"), lit(0L))).as("ss"))
      hb.select(col("split"), col("doc_id"))
        .join(sc, Seq("doc_id"), "left")
        .filter(abs(coalesce(col("ts"), lit(0L))) >= MarginMin)
        .select(col("split"),
          when(col("ts") >= 0, 1L).otherwise(-1L).as("y"),
          when(coalesce(col("ss"), lit(0L)) > 0, 1L)
            .otherwise(-1L).as("p"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("y") === 1 && col("p") === 1, 1L)
            .otherwise(0L)).as("n_tp"),
          sum(when(col("y") === -1 && col("p") === 1, 1L)
            .otherwise(0L)).as("n_fp"),
          sum(when(col("y") === -1 && col("p") === -1, 1L)
            .otherwise(0L)).as("n_tn"),
          sum(when(col("y") === 1 && col("p") === -1, 1L)
            .otherwise(0L)).as("n_fn"))
        .select(col("split"), col("n_docs"), col("n_tp"), col("n_fp"),
          col("n_tn"), col("n_fn"),
          ((col("n_tp") + col("n_tn")).cast("double") /
            col("n_docs").cast("double")).as("accuracy"))
        .orderBy(col("split"))
    },
    Some {
      clfOracleCtesOver("") + s""", held AS MATERIALIZED (
          SELECT CASE WHEN bkt < 900 THEN 'val' ELSE 'test' END AS split,
            doc_id, text
          FROM sp WHERE bkt >= 800
        )""" + clfFeatCtes("h", "held") + s""", hsc AS MATERIALIZED (
          SELECT f.doc_id,
            CAST(COALESCE(SUM(f.c * t.tw), 0) AS BIGINT) AS ts,
            CAST(COALESCE(SUM(f.c * w.w), 0) AS BIGINT) AS ss
          FROM fxh f
          LEFT JOIN tw t ON t.b = f.b
          LEFT JOIN w$ClfRounds w ON w.b = f.b
          GROUP BY f.doc_id
        ), hcls AS (
          SELECT h.split,
            CASE WHEN s.ts >= 0 THEN 1 ELSE -1 END AS y,
            CASE WHEN COALESCE(s.ss, 0) > 0 THEN 1 ELSE -1 END AS p
          FROM held h LEFT JOIN hsc s ON s.doc_id = h.doc_id
          WHERE ABS(COALESCE(s.ts, 0)) >= $MarginMin
        )
        SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_tp,
          CAST(SUM(CASE WHEN y = -1 AND p = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_fp,
          CAST(SUM(CASE WHEN y = -1 AND p = -1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_tn,
          CAST(SUM(CASE WHEN y = 1 AND p = -1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_fn,
          CAST(SUM(CASE WHEN y = p THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS accuracy
        FROM hcls GROUP BY split ORDER BY split"""
    })

  /** Per-source distribution drift vs the corpus reference — the
    * ingest-monitoring operator that catches a source whose content
    * profile shifts (template rollout, crawler truncation, encoding
    * breakage) before it poisons a training mix. Statistic: total
    * variation distance between the source's n_chars histogram and the
    * corpus-wide one over [[DriftBins]] equal-width bins.
    *
    * Determinism: TV = ½ Σ_b |c_b/S − r_b/R| is computed as the EXACT
    * integer Σ_b |c_b·R − r_b·S| (c_b·R ≤ 10^6·10^6 fits int64 easily)
    * and divided by 2·S·R once at the double boundary — a
    * deterministic single IEEE division, where a float per-bin sum
    * would be partition-order-dependent. Floor-division binning is
    * identical in Spark (`div`) and DuckDB (`//`) on the non-negative
    * operands here.
    *
    * Scale shape (100 TB): one documents scan → one map-side-combined
    * (source, bin) hash-agg; the reference histogram is |bins| rows
    * and per-source totals are |sources| rows, both broadcast; the TV
    * rollup runs over the |sources|×|bins| grid, never raw rows. The
    * grid is complete by construction (ref = whole corpus ⊇ every
    * source, so every non-empty source bin exists in the reference;
    * source-missing bins enter as c_b = 0 via the grid left join —
    * dropping them would undercount drift exactly where it is worst).
    */
  val DriftBins = 32

  /** The monitor's STATE: per-(source, bin) document counts of a
    * documents frame under fixed bounds — exact int64, so partial
    * counts from independent micro-batches merge by ADDITION into the
    * same state a single batch pass produces (the streaming-twin
    * contract StreamingSpec proves).
    */
  private[graft] def driftSrcBins(docs: DataFrame, mn: Long, mx: Long,
      bins: Int = DriftBins): DataFrame = {
    // clamped on BOTH sides: under fixed deployment bounds a later
    // micro-batch can carry values outside [mn, mx], and an unclamped
    // low side would emit negative bin ids into the state grid (with
    // engine-dependent rounding: Spark's div truncates toward zero,
    // DuckDB's // floors — they disagree on negatives)
    val bin =
      if (mx == mn) lit(0L)
      else greatest(lit(0L), least(lit(bins - 1L),
        expr(s"((n_chars - $mn) * $bins) div (${mx - mn})")))
    // explicit not-null filter mirrors what the grid's left join
    // pushes onto ITS srcBins branch — having it in EVERY consumer
    // makes the exchange subtrees canonicalize identically, so AQE
    // reuses one shuffle (the q43 discipline); the oracle carries
    // the same WHERE
    docs
      .filter(col("source").isNotNull && col("n_chars").isNotNull)
      .select(col("source"), bin.as("b"))
      .groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("cb"))
  }

  /** The monitor's READOUT: TV distance per source from the (source,
    * b, cb) count grid. Runs over |sources|×|bins| rows only — the
    * reference histogram, per-source totals, and corpus total all
    * RE-AGGREGATE the small state table (ref/srcTot as tiny re-aggs
    * whose exchange subtree is the state's own, AQE-reused; rtot as a
    * window over the completed grid). An earlier draft computed
    * ref/srcTot with separate corpus groupBys plus a docs.count() —
    * FOUR corpus passes where the contract promises one.
    */
  private[graft] def driftTv(srcBins: DataFrame): DataFrame = {
    val ref = srcBins.groupBy(col("b")).agg(sum(col("cb")).as("rb"))
    val srcTot = srcBins.groupBy(col("source"))
      .agg(sum(col("cb")).as("stot"))
    val grid = srcTot.crossJoin(broadcast(ref))
      .join(srcBins, Seq("source", "b"), "left")
      .select(col("source"), col("stot"), col("b"), col("rb"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      // grid carries every bin per source, so the per-source sum of
      // rb IS the corpus total — no separate docs.count() pass
      .withColumn("rtot",
        sum(col("rb")).over(Window.partitionBy("source")))
    grid.groupBy(col("source"), col("stot"))
      .agg(sum(abs(col("cb") * col("rtot") - col("rb") * col("stot")))
        .as("tv_scaled"), max(col("rtot")).as("rtot"))
      .select(col("source"), col("stot").as("n_docs"),
        col("tv_scaled").cast(DoubleType)
          ./(lit(2.0) * col("stot").cast(DoubleType) *
            col("rtot").cast(DoubleType))
          .as("tv"))
      .orderBy(col("tv").desc, col("source"))
  }

  val q170 = EngineQuery(
    "q170_distribution_drift",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val r0 = docs.agg(min(col("n_chars")), max(col("n_chars"))).head()
      val (mn, mx) = (r0.getLong(0), r0.getLong(1))
      // ONE corpus-sized aggregation (the state build); the readout
      // re-aggregates the |sources|×|bins| state only
      driftTv(driftSrcBins(docs, mn, mx))
    },
    Some(s"""WITH bounds AS (
              SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents
            ), binned AS (
              SELECT source,
                CASE WHEN b.mx = b.mn THEN 0
                     ELSE GREATEST(0, LEAST(${DriftBins - 1},
                       ((n_chars - b.mn) * $DriftBins) // (b.mx - b.mn)))
                END AS bin
              FROM documents, bounds b
              WHERE source IS NOT NULL AND n_chars IS NOT NULL
            ), ref AS (
              SELECT bin, COUNT(*) AS rb FROM binned GROUP BY bin
            ), rtot AS (SELECT COUNT(*) AS r FROM binned
            ), src_tot AS (
              SELECT source, COUNT(*) AS stot FROM binned GROUP BY source
            ), src_bins AS (
              SELECT source, bin, COUNT(*) AS cb
              FROM binned GROUP BY source, bin
            ), grid AS (
              SELECT t.source, t.stot, f.bin, f.rb,
                COALESCE(s.cb, 0) AS cb
              FROM src_tot t
              CROSS JOIN ref f
              LEFT JOIN src_bins s
                ON s.source = t.source AND s.bin = f.bin
            )
            SELECT g.source, CAST(MAX(g.stot) AS BIGINT) AS n_docs,
              CAST(SUM(ABS(g.cb * rtot.r - g.rb * g.stot)) AS DOUBLE)
                / (2.0 * MAX(g.stot) * MAX(rtot.r)) AS tv
            FROM grid g, rtot
            GROUP BY g.source
            ORDER BY tv DESC, g.source"""))

  /** Embedding-space drift: squared centroid shift of each label's
    * vectors vs the global centroid — q170's monitoring idea lifted to
    * the representation space (an embedding pipeline whose encoder,
    * preprocessing, or upstream mix changes shifts group centroids
    * long before downstream metrics move).
    *
    * Determinism: per-(label, dim) component sums are exact int64
    * fixed-point; the per-dim difference D = sc·N − sg·n is exact
    * int64 (|sc·N| ≤ 1e7·n·N ≈ 4e13 at fixture scale); D² sums as
    * EXACT DECIMAL(38,0) in Spark / HUGEINT in DuckDB — order-free —
    * and ONE boundary division by (n·N·1e7)² produces the double.
    * A float per-dim sum would be partition-order-dependent.
    *
    * Scale shape (100 TB): one embeddings scan → one map-side-combined
    * (label, dim) hash-agg (|labels|·dims rows); the global centroid
    * RE-AGGREGATES that small table (never a second corpus pass); the
    * distance rollup runs over |labels|·dims rows only.
    */
  /** The embedding monitor's STATE: exact int64 fixed-point component
    * sums + vector counts per (label, dim). Additive across
    * micro-batches by construction — partial sums from independent
    * batches merge by ADDITION into the single-pass state
    * (StreamingSpec proves the twin).
    *
    * ONE corpus-sized aggregation; every vector contributes one row
    * per dim, so cnt per (label, pos) IS the label's vector count.
    */
  private[graft] def embedLabelSums(emb: DataFrame): DataFrame = {
    import PortableHash.fixedPoint
    emb.select(col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), col("pos"), fixedPoint(col("v")).as("f"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("f")).as("sc"), count(lit(1)).as("cnt"))
  }

  /** The embedding monitor's READOUT over the (label, pos, sc, cnt)
    * state: squared centroid shift per label vs the global centroid.
    * Label totals and the global centroid are WINDOWS over the small
    * state table (the q43 discipline): one linear lineage, so the
    * corpus aggregates once — the agg+join-back formulation derived it
    * three times because pruning made the exchange subtrees
    * non-identical (no AQE reuse), re-scanning embeddings per consumer.
    * `big` is the corpus vector count (1-row action for the batch gate;
    * derivable from the state itself in the streaming twin).
    */
  private[graft] def embedDrift(lab: DataFrame, big: Long): DataFrame = {
    val d = lab
      .withColumn("n", max(col("cnt")).over(Window.partitionBy("label")))
      .withColumn("sg", sum(col("sc")).over(Window.partitionBy("pos")))
      .select(col("label"), col("n"),
        (col("sc") * big - col("sg") * col("n")).as("dd"))
    d.select(col("label"), col("n"),
        (col("dd").cast("decimal(38,0)") * col("dd").cast("decimal(38,0)"))
          .as("d2"))
      .groupBy(col("label"), col("n"))
      .agg(sum(col("d2")).as("sum_d2"))
      .select(col("label"), col("n").as("n_vecs"),
        (col("sum_d2").cast(DoubleType) /
          ((col("n").cast(DoubleType) * big * 1e7) *
            (col("n").cast(DoubleType) * big * 1e7))).as("dist2"))
      .orderBy(col("dist2").desc, col("label"))
  }

  val q171 = EngineQuery(
    "q171_embedding_drift",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
      embedDrift(embedLabelSums(emb), emb.count())
    },
    Some("""WITH fx AS (
              SELECT label,
                generate_subscripts(embedding, 1) AS pos,
                CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE)*10000000.0)
                  AS BIGINT) AS f
              FROM embeddings
            ), n AS (
              SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
            ), big AS (SELECT COUNT(*) AS b FROM embeddings
            ), lab AS (
              SELECT label, pos, SUM(f) AS sc FROM fx GROUP BY label, pos
            ), gl AS (
              SELECT pos, SUM(sc) AS sg FROM lab GROUP BY pos
            ), d AS (
              SELECT l.label, n.n,
                CAST(l.sc * big.b - g.sg * n.n AS BIGINT) AS dd
              FROM lab l
              JOIN gl g ON g.pos = l.pos
              JOIN n ON n.label = l.label
              CROSS JOIN big
            )
            SELECT d.label, CAST(MAX(d.n) AS BIGINT) AS n_vecs,
              CAST(SUM(CAST(dd AS HUGEINT) * dd) AS DOUBLE) /
                ((CAST(MAX(d.n) AS DOUBLE) * MAX(big.b) * 10000000.0) *
                 (CAST(MAX(d.n) AS DOUBLE) * MAX(big.b) * 10000000.0))
                AS dist2
            FROM d CROSS JOIN big
            GROUP BY d.label
            ORDER BY dist2 DESC, d.label"""))

  /** CORPUS DATASHEET — the per-source governance report card
    * ("Datasheets for Datasets", Gebru et al. 2021) composing three
    * verified families into the one-page summary a data audit starts
    * from: volume (docs, distinct languages, whitespace-token mass),
    * duplication (q45's greedy-loser rule over the q41 MinHash pair
    * space), and quality (q168's classifier — how many docs are
    * featurizable at all, how many the teacher keeps). One row per
    * source; every column is exact-integer so the whole sheet
    * hash-gates.
    *
    * Scale shape: each family contributes its own proven plan (the
    * LSH-bucketed pair space, the broadcast-weights scoring pass) and
    * the sheet itself is two |dups|- and |docs|-sized LEFT joins into
    * ONE per-source hash-agg — no new corpus-sized stage beyond the
    * families' own. At 100 TB this is the daily report every corpus
    * owner runs; its cost is the cost of the checks themselves.
    */
  val q206 = EngineQuery(
    "q206_corpus_datasheet",
    (s, dir) => {
      val t = Tables(s, dir)
      val losers = Dedup.minhashLosers(s, dir)
        .withColumn("is_dup", lit(1L))
      val scored = classifierScores(t.documents)
        .select(col("doc_id"), col("keep"))
      t.documents
        .join(losers, Seq("doc_id"), "left")
        .join(scored, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("lang")).as("n_langs"),
          sum(size(PortableHash.tokens(col("text"))).cast("long"))
            .as("sum_tokens"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dups"),
          count(col("keep")).as("n_scoreable"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
        .orderBy(col("source"))
    },
    Some(Dedup.minhashPairsCtes + s"""
         , losers AS (
             SELECT DISTINCT doc_b AS doc_id FROM pairs WHERE n_bands >= 4
           ), w AS (
             SELECT p AS b,
               ((p+1)*2654435761 % 1000000007) % 2001 - 1000 AS wt
             FROM (SELECT UNNEST(range(0, $ClfBuckets)) p)
           ), ctoks AS (
             SELECT doc_id, string_split(trim(text), ' ') ws
             FROM documents
           ), cth AS (
             SELECT doc_id,
               [coalesce(list_sum([(ascii(w[i])
                   * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                   % 1000000007
                   for i in range(1, length(w)+1)]) % 1000000007, 0)
                for w in ws] AS ths
             FROM ctoks WHERE len(ws) >= 2
           ), cfeats AS (
             SELECT doc_id, UNNEST(list_concat(
               [t % $ClfBuckets for t in ths],
               [(${PortableHash.spanHashSql("ths", 2)}) % $ClfBuckets
                for i in range(1, len(ths))])) AS b
             FROM cth
           ), cscored AS (
             SELECT f.doc_id, CAST(SUM(w.wt) AS BIGINT) AS w_sum
             FROM cfeats f JOIN w ON f.b = w.b
             GROUP BY f.doc_id
           )
           SELECT d.source, COUNT(*) AS n_docs,
             COUNT(DISTINCT d.lang) AS n_langs,
             CAST(SUM(length(string_split(trim(d.text), ' ')))
               AS BIGINT) AS sum_tokens,
             CAST(SUM(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_dups,
             COUNT(sc.doc_id) AS n_scoreable,
             CAST(SUM(CASE WHEN sc.w_sum >= 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_keep
           FROM documents d
           LEFT JOIN losers l ON l.doc_id = d.doc_id
           LEFT JOIN cscored sc ON sc.doc_id = d.doc_id
           GROUP BY d.source ORDER BY d.source"""))

  val all: Seq[EngineQuery] =
    Seq(q59, q64, q157, q158, q168, q170, q171, q176, q177, q206)
}
