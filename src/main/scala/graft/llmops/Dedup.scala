package graft.llmops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.ops.{EngineQuery, SessionScratch, Tables}
import PortableHash._

/** Deduplication operators for large-scale training-data pipelines
  * (SURVEY.md §2.4 [ext]; north star BASELINE.json).
  *
  * Scale design: every variant is shuffle-bounded by its bucket key —
  * exact dedup shuffles on the content hash, MinHash-LSH on (band,
  * signature), SimHash on the fingerprint, n-gram Jaccard on the shingle,
  * embedding near-dup on (label, bucket). No all-pairs comparison ever
  * materializes; at 100 TB each stage is a hash-partitioned groupBy/join.
  */
object Dedup {

  /** Exact dedup: canonical row per distinct text (keep min doc_id).
    * One hash shuffle on the content key — the 100 TB path is
    * groupBy(md5(text)), identical semantics.
    */
  val q40 = EngineQuery(
    "q40_dedup_exact",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"), md5(col("text")).as("text_md5"))
        .orderBy(col("keep_id"))
    },
    Some("""SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies,
              md5(text) AS text_md5
            FROM documents GROUP BY text ORDER BY keep_id"""))

  /** MinHash-LSH candidate pairs (doc_a < doc_b, band-match count) —
    * shared by q41 (the pair gate) and q112 (component clustering over
    * these pairs as edges).
    */
  /** LSH band signatures per document — (doc_id, band, sig), 8 rows per
    * doc. The shared first stage of q41/q45 (full self-dedup) and q46
    * (incremental dedup of new docs against an existing corpus).
    *
    * Memoized per (app, dir) and checkpointed (optimization r15, the
    * pr_edges / q192 / q198 ingest-memo contract): the signature table
    * is exactly what [[DedupIndex]] PERSISTS in production — the ingest
    * half of every MinHash consumer — yet ~10 gates (q41/q45/q112/q223
    * + the curation family via [[minhashLosers]]) re-paid the full
    * corpus scan → shingle explode → 16-minhash agg on every
    * invocation. First call pays; the candidate-pair self-join and
    * every downstream stage stay live per gate. ~8 rows/doc of
    * (id, band, sig) — node-not-corpus-payload cardinality, the same
    * session-residency argument as the PageRank edge memo.
    */
  private[llmops] def bandSignatures(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    SessionScratch.memo("dedup_sigs", s.sparkContext.applicationId, dir)(
      bandSignaturesOf(Tables(s, dir).documents).localCheckpoint())

  /** The signature pipeline over an ARBITRARY (doc_id, text) frame —
    * shared by the full-corpus form above and the persisted signature
    * index ([[DedupIndex]]), whose append path must hash ONLY the
    * newly-arrived documents.
    */
  private[graft] def bandSignaturesOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val toks = docs
        .select(col("doc_id"), tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 3)
      val sh = toks.select(col("doc_id"),
        explode(shingles3(col("ws"))).as("s"))
      // hash per (doc, shingle) row with the native codegen'd expression
      // (CharPolyHash): a pure map stage, no shuffle and no driver-side
      // collection — a distinct+broadcast of the global shingle
      // dictionary would be unbounded at corpus scale
      val g = sh.select(col("doc_id"),
        graft.functions.CharPolyHash.charPolyHash(col("s")).as("gh"))
      // all 16 minhashes as parallel MIN aggregates in ONE hash-agg —
      // no 16-way row explode, no second shuffle; map-side partial MIN
      // means the exchange carries 16 longs per (partition × doc)
      val mh = g.groupBy(col("doc_id"))
        .agg(min(permute(col("gh"), lit(0))).as("h0"),
          (1 until 16).map(j =>
            min(permute(col("gh"), lit(j))).as(s"h$j")): _*)
      mh.select(col("doc_id"),
          explode(array((0 until 8).map(b => struct(
            lit(b).as("band"),
            concat_ws(":", col(s"h${2 * b}").cast("string"),
              col(s"h${2 * b + 1}").cast("string")).as("sig"))): _*))
            .as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  private[llmops] def minhashPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
      val bands = bandSignatures(s, dir)
      val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
      val b = bands.select(col("doc_id").as("doc_b"), col("band"), col("sig"))
      a.join(b, Seq("band", "sig"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_bands"))
  }

  /** q45's greedy dedup resolution, single-sourced: the doc_ids
    * dropped as the HIGHER id of every strong (>= 4 shared bands)
    * candidate pair — THE admission rule every composed pipeline
    * (q178/q181/q185/q200/q206) shares; changing the band threshold or
    * the loser side here changes them all together.
    */
  private[llmops] def minhashLosers(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    SessionScratch.memo("dedup_losers", s.sparkContext.applicationId,
      dir)(
      // memoized per (app, dir) — optimization r15: every consumer of
      // this rule (the curation DAG family ×7 + the day-2 memos)
      // re-ran the band self-join per invocation to derive the SAME
      // deterministic admission list; the list is loser-cardinality
      // (≪ docs). The q41/q45/q223 gates keep their own live pair
      // joins — only the shared upstream DECISION is session-resident.
      minhashPairs(s, dir)
        .filter(col("n_bands") >= 4)
        .select(col("doc_b").as("doc_id"))
        .distinct()
        .localCheckpoint())

  /** Oracle CTE block computing the same candidate pairs (ends with a
    * `pairs` CTE); RECURSIVE so q112 can append a recursive closure.
    */
  private[llmops] val minhashPairsCtes: String =
    """WITH RECURSIVE toks AS (
              SELECT doc_id, string_split(trim(text), ' ') ws FROM documents
            ), sh AS (
              SELECT doc_id, UNNEST(list_distinct(
                [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                 for i in range(1, len(ws)-1)])) s
              FROM toks WHERE len(ws) >= 3
            ), g AS (
              SELECT doc_id,
                list_sum([(ascii(s[i])
                    * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                    % 1000000007
                  for i in range(1, length(s)+1)]) % 1000000007 AS gh
              FROM sh
            ), mh AS (
              SELECT doc_id, j.j,
                MIN(((2*j.j+1)*gh + 7919*j.j) % 1000000007) AS h
              FROM g, (SELECT UNNEST(range(0,16)) j) j
              GROUP BY doc_id, j.j
            ), bands AS (
              SELECT doc_id, j // 2 AS band,
                string_agg(CAST(h AS VARCHAR), ':' ORDER BY j) AS sig
              FROM mh GROUP BY doc_id, j // 2
            ), pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                COUNT(*) AS n_bands
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )"""

  /** MinHash + LSH near-dup candidates: 3-word shingles → 16 portable
    * minhashes → 8 bands of 2 → docs sharing a band signature.
    * Candidate pairs come from the band-bucket self-join (the LSH step) —
    * cost is bounded by bucket sizes, never |docs|² .
    */
  val q41 = EngineQuery(
    "q41_dedup_minhash_lsh",
    (s, dir) => minhashPairs(s, dir).orderBy(col("doc_a"), col("doc_b")),
    Some(minhashPairsCtes +
      """
         SELECT doc_a, doc_b, n_bands FROM pairs ORDER BY 1, 2"""))

  /** SimHash-16 fingerprint per document: token hashes vote per bit,
    * sign of the balance sets the bit. Near-dup docs land on nearby
    * fingerprints (Hamming distance); the fingerprint itself is the
    * shuffle key at scale.
    */
  val q42 = EngineQuery(
    "q42_dedup_simhash",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = t.documents
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
      val wh = toks.select(col("doc_id"),
        graft.functions.CharPolyHash.charPolyHash(col("w")).as("gh"))
      val bits = wh
        .select(col("doc_id"), col("gh"),
          explode(sequence(lit(0), lit(15))).as("b"))
        .groupBy(col("doc_id"), col("b"))
        .agg(sum(when(expr("(gh div (1 << b)) % 2") === 1, 1)
          .otherwise(-1)).as("bal"))
      bits
        .groupBy(col("doc_id"))
        .agg(sum(when(col("bal") >= 0, expr("1 << b")).otherwise(0L))
          .cast(LongType).as("simhash"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (
              SELECT doc_id, UNNEST(string_split(trim(text), ' ')) w
              FROM documents
            ), wh AS (
              SELECT doc_id,
                list_sum([(ascii(w[i])
                    * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                    % 1000000007
                  for i in range(1, length(w)+1)]) % 1000000007 AS gh
              FROM toks WHERE length(w) > 0
            ), bits AS (
              SELECT doc_id, b.b,
                SUM(CASE WHEN (gh // (1 << b.b)) % 2 = 1 THEN 1 ELSE -1 END) AS bal
              FROM wh, (SELECT UNNEST(range(0,16)) b) b
              GROUP BY 1, 2
            )
            SELECT doc_id,
              CAST(SUM(CASE WHEN bal >= 0 THEN (1 << b) ELSE 0 END) AS BIGINT)
                AS simhash
            FROM bits GROUP BY doc_id ORDER BY doc_id"""))

  /** N-gram Jaccard similarity on 3-word shingles, bucketed by
    * (lang, source) so the pair space stays bounded. Output: pairs
    * sharing >= 2 shingles with their exact Jaccard.
    *
    * Hot-shingle bound: a shingle occurring in df documents of one
    * bucket contributes df² pairs to the self-join — quadratic on
    * boilerplate shingles at corpus scale. Shingles with document
    * frequency > [[dfCap]] are dropped from BOTH the intersection and
    * the per-doc set sizes (stopword-shingle removal), capping the
    * pair space per shingle at dfCap² regardless of corpus size. The
    * oracle applies the identical cap.
    */
  val dfCap = 50

  val q43 = EngineQuery(
    "q43_dedup_ngram_jaccard",
    (s, dir) => {
      val t = Tables(s, dir)
      // the explicit isNotNull mirrors what the self-join would push
      // down anyway (and the oracle's JOIN USING semantics) — having it
      // in EVERY consumer makes the exploded-shingle exchange subtree
      // canonicalize identically, so AQE reuses one shuffle for the
      // pair side, its mirror, AND the per-doc set-size aggregate
      val shAll = t.documents
        .filter(col("lang").isNotNull && col("source").isNotNull)
        .select(col("doc_id"), col("lang"), col("source"),
          tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), col("lang"), col("source"),
          explode(shingles3(col("ws"))).as("s"))
      // shingles are distinct per doc, so COUNT(*) per (bucket, shingle)
      // is the document frequency. Computed as a window count over the
      // SAME key the pair self-join shuffles on: one exchange of the
      // shingle rows, reused by both join sides — an agg+join
      // formulation would scan and shuffle the exploded shingles twice.
      val wDf = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"), col("source"), col("s"))
      val sh = shAll
        .withColumn("df", count(lit(1)).over(wDf))
        .filter(col("df") <= dfCap)
        .drop("df")
      val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = sh.select(col("doc_id").as("doc_a"), col("lang"), col("source"), col("s"))
      val b = sh.select(col("doc_id").as("doc_b"), col("lang"), col("source"), col("s"))
      val inter = a.join(b, Seq("lang", "source", "s"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("ni"))
        .filter(col("ni") >= 2)
      inter
        .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("ni"),
          (col("ni").cast(DoubleType) / (col("na") + col("nb") - col("ni")))
            .as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, lang, source, string_split(trim(text), ' ') ws
              FROM documents
            ), sh_all AS (
              SELECT doc_id, lang, source, UNNEST(list_distinct(
                [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                 for i in range(1, len(ws)-1)])) s
              FROM toks WHERE len(ws) >= 3
            ), rare AS (
              SELECT lang, source, s FROM sh_all
              GROUP BY 1, 2, 3 HAVING COUNT(*) <= $dfCap
            ), sh AS (
              SELECT sh_all.* FROM sh_all
              JOIN rare USING (lang, source, s)
            ), cnt AS (
              SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id doc_a, b.doc_id doc_b, COUNT(*) ni
              FROM sh a JOIN sh b ON a.s = b.s AND a.lang = b.lang
                AND a.source = b.source AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING COUNT(*) >= 2
            )
            SELECT doc_a, doc_b, ni,
              CAST(ni AS DOUBLE) / (ca.n + cb.n - ni) AS jaccard
            FROM inter
            JOIN cnt ca ON doc_a = ca.doc_id
            JOIN cnt cb ON doc_b = cb.doc_id
            ORDER BY doc_a, doc_b"""))

  /** Embedding-cosine near-dup: top-20 same-(label, bucket) pairs by
    * exact dot product (vectors are unit-norm, so dot = cosine). The
    * blocking key is (label, LSH bucket) — the bucket comes from q51's
    * sign-random-projection hyperplanes ([[Similarity.srpBuckets]]), so
    * the per-block pair space is bounded by bucket occupancy even when a
    * label covers a large fraction of the corpus: label alone would make
    * the self-join quadratic in the largest label at 100 TB. Near-dup
    * vectors agree on all 8 hyperplane signs with high probability, so
    * blocking on the bucket keeps the pairs dedup cares about.
    */
  val q44 = EngineQuery(
    "q44_dedup_embed_cosine",
    (s, dir) => {
      val t = Tables(s, dir)
      val withBucket = t.embeddings
        .join(Similarity.srpBuckets(t.embeddings), "vec_id")
      val a = withBucket.select(col("vec_id").as("ia"), col("label"),
        col("bucket"), col("embedding").as("ea"))
      val b = withBucket.select(col("vec_id").as("ib"), col("label"),
        col("bucket"), col("embedding").as("eb"))
      // two-phase top-k: cheap double-dot prefilter, then exact
      // fixed-point dots for oracle-identical values. The prefilter
      // keeps every candidate within a dims-scaled EPS of the k-th
      // approximate score (PortableHash.dotEps: quantization gap grows
      // ~2e-7 per dimension), so the exact top-k is contained at any
      // embedding width — a fixed candidate-count cutoff could drop a
      // true winner when many scores cluster at the boundary. kth is a
      // TakeOrdered scalar, broadcast back — no driver round-trip.
      val scored = a.join(b, Seq("label", "bucket"))
        .filter(col("ia") < col("ib"))
        .select(col("ia"), col("ib"), col("ea"), col("eb"),
          fastDot(col("ea"), col("eb")).as("approx"))
      val kth = scored.select(col("approx"))
        .orderBy(col("approx").desc)
        .limit(20)
        .agg(min(col("approx")).as("kth_approx"))
      scored.crossJoin(broadcast(kth))
        .filter(col("kth_approx").isNull ||
          col("approx") >= col("kth_approx") - dotEps(col("ea")))
        .select(col("ia"), col("ib"), exactDot(col("ea"), col("eb")).as("dot"))
        .orderBy(col("dot").desc, col("ia"), col("ib"))
        .limit(20)
    },
    Some("WITH " + Similarity.srpBucketsCtes + """, ex AS (
              SELECT vec_id, label, CAST(UNNEST(embedding) AS DOUBLE) v,
                generate_subscripts(embedding, 1) pos
              FROM embeddings
            ), exb AS (
              SELECT ex.*, b.bucket FROM ex
              JOIN buckets b ON ex.vec_id = b.vec_id
            ), dots AS (
              SELECT a.vec_id ia, b.vec_id ib,
                CAST(SUM(CAST(FLOOR(a.v*10000000.0) AS BIGINT)
                       * CAST(FLOOR(b.v*10000000.0) AS BIGINT)) AS DOUBLE)
                  / 100000000000000.0 AS dot
              FROM exb a JOIN exb b ON a.label = b.label
                AND a.bucket = b.bucket AND a.pos = b.pos
                AND a.vec_id < b.vec_id
              GROUP BY 1, 2
            )
            SELECT ia, ib, dot FROM dots
            ORDER BY dot DESC, ia, ib LIMIT 20"""),
    bench = true)

  /** Near-dup dedup APPLIED: the surviving corpus. Greedy resolution of
    * the q41 candidate pairs — for every strong candidate pair (>= 4 of
    * 8 bands) the higher doc_id is dropped, the lower kept. One
    * anti-join against the loser set with NO broadcast hint: on a
    * dup-heavy corpus the loser set is O(corpus), so a forced broadcast
    * would OOM the executors; AQE broadcasts at runtime when it fits.
    */
  val q45 = EngineQuery(
    "q45_neardup_survivors",
    (s, dir) => {
      val t = Tables(s, dir)
      // the UNSORTED pair builder, not q41.run: q41 appends an ORDER BY
      // for its own gate output, and relying on EliminateSorts to strip
      // it under the anti-join is a silent optimizer dependency
      val losers = minhashPairs(s, dir)
        .filter(col("n_bands") >= 4)
        .select(col("doc_b").as("doc_id"))
        .distinct()
      t.documents
        .join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some(minhashPairsCtes +
      """
         , losers AS (
             SELECT DISTINCT doc_b AS doc_id FROM pairs WHERE n_bands >= 4
           )
           SELECT d.doc_id, d.lang, d.source, d.n_chars
           FROM documents d ANTI JOIN losers l ON d.doc_id = l.doc_id
           ORDER BY d.doc_id"""))

  /** Incremental (cross-corpus) near-dup: dedup NEW documents against an
    * EXISTING corpus without ever pairing existing×existing — the shape
    * of a daily crawl landing next to a 100 TB corpus. Here "existing"
    * is even doc_ids and "new" is odd ones, and the existing side's
    * band signatures are a PERSISTED index artifact ([[DedupIndex]]):
    * the gate's ingest half builds the signature index ON DISK once
    * per (session, dir) — hashing only the existing docs, recording
    * the hash config in a sidecar — and the probe half hashes ONLY the
    * incoming docs and joins them against the stored index on the
    * bucket key. A new doc is dropped when it shares >= 4 of 8 band
    * signatures with ANY existing doc (the q41/q45 threshold).
    * Maintenance (appending accepted docs' signatures so tomorrow's
    * crawl dedups against today's survivors) is [[DedupIndex.append]],
    * proven equivalent to a full rebuild in IndexMaintenanceSpec.
    */
  private[llmops] def existingDedupIndex(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val app = s.sparkContext.applicationId
    val tag = graft.ops.SessionScratch.dirTag(dir)
    val path =
      s"${graft.ops.SessionScratch.base("dedup_index", app)}/di_$tag"
    graft.ops.SessionScratch.once("dedup_index", app, dir) {
      DedupIndex.build(
        Tables(s, dir).documents.filter(col("doc_id") % 2 === 0), path)
    }
    path
  }

  val q46 = EngineQuery(
    "q46_dedup_incremental",
    (s, dir) => {
      val t = Tables(s, dir)
      val path = existingDedupIndex(s, dir)
      DedupIndex.probe(t.documents.filter(col("doc_id") % 2 === 1), path)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some(minhashPairsCtes +
      """
         , cross_dupes AS (
             SELECT DISTINCT CASE WHEN doc_a % 2 = 1 THEN doc_a
                                  ELSE doc_b END AS doc_id
             FROM pairs
             WHERE n_bands >= 4 AND (doc_a % 2) != (doc_b % 2)
           )
           SELECT d.doc_id, d.lang, d.source, d.n_chars
           FROM documents d ANTI JOIN cross_dupes x ON d.doc_id = x.doc_id
           WHERE d.doc_id % 2 = 1
           ORDER BY d.doc_id"""))

  /** The incremental-dedup store with takedowns applied (q215's
    * state): built on the even half, then every doc_id divisible by
    * 10 DELETED ([[DedupIndex.delete]] — tombstoned signatures).
    */
  private[llmops] def existingDeletedDedupIndex(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val app = s.sparkContext.applicationId
    val tag = graft.ops.SessionScratch.dirTag(dir)
    val path =
      s"${graft.ops.SessionScratch.base("dedup_del_index", app)}/dd_$tag"
    graft.ops.SessionScratch.once("dedup_del_index", app, dir) {
      val docs = Tables(s, dir).documents
      DedupIndex.build(docs.filter(col("doc_id") % 2 === 0), path)
      DedupIndex.delete(docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id")), path)
    }
    path
  }

  /** Incremental dedup probe AFTER takedowns — the q208 gate, dedup
    * flavor, hashing the semantic that makes deletes matter for THIS
    * store: a taken-down doc must stop SUPPRESSING future arrivals
    * immediately (its signatures are masked), so a new doc whose only
    * near-dup was a deleted doc is now ADMITTED. The oracle resolves
    * the cross-corpus pairs with the deleted existing-side endpoints
    * excluded — an index that kept masking (or that over-masked and
    * admitted a doc colliding with a live one) hash-mismatches.
    */
  val q215 = EngineQuery(
    "q215_dedup_after_takedown",
    (s, dir) => {
      val t = Tables(s, dir)
      val path = existingDeletedDedupIndex(s, dir)
      DedupIndex.probe(t.documents.filter(col("doc_id") % 2 === 1), path)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some(minhashPairsCtes +
      """
         , cross_dupes AS (
             SELECT DISTINCT CASE WHEN doc_a % 2 = 1 THEN doc_a
                                  ELSE doc_b END AS doc_id
             FROM pairs
             WHERE n_bands >= 4 AND (doc_a % 2) != (doc_b % 2)
               AND (CASE WHEN doc_a % 2 = 0 THEN doc_a
                         ELSE doc_b END) % 10 <> 0
           )
           SELECT d.doc_id, d.lang, d.source, d.n_chars
           FROM documents d ANTI JOIN cross_dupes x ON d.doc_id = x.doc_id
           WHERE d.doc_id % 2 = 1
           ORDER BY d.doc_id"""))

  /** The MULTI-DAY index: built on day-0's corpus (doc_id % 3 == 0),
    * then day-2's batch (% 3 == 1) APPENDED — probed against the index
    * and only the survivors' signatures admitted ([[DedupIndex.append]]).
    * Built once per (session, dir); q196 then probes day-3's batch
    * against the GROWN index.
    */
  private[llmops] def existingDay3Index(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val app = s.sparkContext.applicationId
    val tag = graft.ops.SessionScratch.dirTag(dir)
    val path =
      s"${graft.ops.SessionScratch.base("dedup_index_day3", app)}/d3_$tag"
    graft.ops.SessionScratch.once("dedup_index_day3", app, dir) {
      val docs = Tables(s, dir).documents
      DedupIndex.build(docs.filter(col("doc_id") % 3 === 0), path)
      DedupIndex.append(docs.filter(col("doc_id") % 3 === 1), path)
        .count()
      graft.ops.SessionScratch.evictTransients()
    }
    path
  }

  /** DAY-3 incremental dedup over the MAINTAINED index — the
    * operational loop q46 starts, closed across days and hash-checked
    * end-to-end: day-2's batch was probed and its SURVIVORS' signatures
    * appended (the [[DedupIndex.append]] contract), so day-3's probe
    * must drop a doc that collides with EITHER the original corpus OR
    * a day-2 survivor — and must NOT drop one that collides only with
    * a day-2 REJECT (rejected docs never entered the corpus, so their
    * signatures must not be in the index). The oracle replays both
    * waves of cross-corpus pair resolution from the raw pair table:
    * survivors-of-wave-2 computed first, then wave-3 dropped against
    * base ∪ survivors — an append that admitted a reject's signatures,
    * missed a survivor's, or let in-batch pairs leak into the probe
    * hash-mismatches.
    */
  val q196 = EngineQuery(
    "q196_dedup_day3_increment",
    (s, dir) => {
      val t = Tables(s, dir)
      val path = existingDay3Index(s, dir)
      DedupIndex.probe(t.documents.filter(col("doc_id") % 3 === 2), path)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some(minhashPairsCtes +
      """
         , surv2 AS (
             SELECT d.doc_id FROM documents d
             WHERE d.doc_id % 3 = 1 AND NOT EXISTS (
               SELECT 1 FROM pairs p WHERE p.n_bands >= 4 AND (
                 (p.doc_a = d.doc_id AND p.doc_b % 3 = 0) OR
                 (p.doc_b = d.doc_id AND p.doc_a % 3 = 0)))
           ), idx AS (
             SELECT doc_id FROM documents WHERE doc_id % 3 = 0
             UNION ALL
             SELECT doc_id FROM surv2
           ), drop3 AS (
             SELECT DISTINCT CASE WHEN p.doc_a % 3 = 2 THEN p.doc_a
                                  ELSE p.doc_b END AS doc_id
             FROM pairs p
             WHERE p.n_bands >= 4 AND (
               (p.doc_a % 3 = 2
                  AND p.doc_b IN (SELECT doc_id FROM idx)) OR
               (p.doc_b % 3 = 2
                  AND p.doc_a IN (SELECT doc_id FROM idx)))
           )
           SELECT d.doc_id, d.lang, d.source, d.n_chars
           FROM documents d ANTI JOIN drop3 x ON d.doc_id = x.doc_id
           WHERE d.doc_id % 3 = 2
           ORDER BY d.doc_id"""))

  /** Span-level duplicate detection: fixed-length token-span
    * fingerprints locate REGIONS of duplicated text inside otherwise
    * distinct documents (boilerplate headers, quoted passages) — the
    * failure mode whole-document dedup (q40-q45) cannot see. This is
    * the fixed-gram approximation of exact substring dedup (suffix
    * arrays are not a distributed-friendly structure; 8-token grams
    * with per-doc duplicated-fraction are the standard scale-out
    * substitute).
    *
    * Pipeline: each token hashed ONCE (native codegen CharPolyHash),
    * then every 8-token span folds its 8 precomputed int64 token hashes
    * through a positional polynomial — span hashing costs 8 multiply-
    * adds, not 8 tokens of re-hashing (the naive per-span string hash
    * was 50× slower at sf0.1). One hash-agg counts distinct docs per
    * span; the (hash, doc-count) table joins back on the int64 hash;
    * one per-doc agg. Shuffles carry the 8-byte span hash, never the
    * span text, so bytes-over-the-wire is bounded by token count, not
    * text size.
    */
  val q47 = EngineQuery(
    "q47_dup_span_detection",
    (s, dir) => {
      val t = Tables(s, dir)
      val SpanLen = 8
      val toks = t.documents
        .select(col("doc_id"), tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= SpanLen)
        .select(col("doc_id"), tokenHashes(col("ws")).as("ths"))
      val spans = toks.select(col("doc_id"),
        explode(spanHashesWide(col("ths"), SpanLen)).as("gh"))
      val docsPerSpan = spans.groupBy(col("gh"))
        .agg(count_distinct(col("doc_id")).as("nd"))
      spans.join(docsPerSpan, Seq("gh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
        .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
          (col("n_dup_spans").cast(DoubleType) /
            col("n_spans").cast(DoubleType)).as("dup_frac"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(trim(text), ' ') ws
              FROM documents
            ), th AS (
              SELECT doc_id,
                [coalesce(list_sum([(ascii(w[i])
                    * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                    % 1000000007
                    for i in range(1, length(w)+1)]) % 1000000007, 0)
                 for w in ws] AS ths
              FROM toks WHERE len(ws) >= 8
            ), g AS (
              SELECT doc_id,
                UNNEST([(${spanHashWideSql("ths", 8)})
                        for i in range(1, len(ths)-6)]) AS gh
              FROM th
            ), ds AS (
              SELECT gh, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY gh
            )
            SELECT g.doc_id,
              COUNT(*) AS n_spans,
              CAST(SUM(CASE WHEN ds.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_dup_spans,
              CAST(SUM(CASE WHEN ds.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                / COUNT(*) AS dup_frac
            FROM g JOIN ds ON g.gh = ds.gh
            GROUP BY g.doc_id
            ORDER BY g.doc_id"""),
    bench = true)

  /** Cross-split leakage detection: how much of each TEST document's
    * text already exists in the TRAIN split, at 8-token span
    * granularity — the decontamination audit every train/eval split
    * needs (doc-level dedup misses a test answer pasted inside a long
    * train doc; span fingerprints don't). Splits are q78's hash rule,
    * so the audit composes with the split operator it guards.
    *
    * Scale shape: identical to q47 — the train span INDEX is a distinct
    * int64 hash set (one hash-agg); the probe is ONE hash equi-join of
    * the distinct test spans against it, per-doc rollup last. The probe
    * is a left-outer join with a hit marker rather than a LeftSemi:
    * against a UNIQUE index key it is row-for-row the semi join (zero
    * fanout, same hash-join physics), but one pass yields BOTH the
    * n_spans denominator and the leaked count, so the test spans are
    * derived once — the plan scans `documents` exactly twice (train
    * side + test side) instead of re-deriving the span explode per
    * consumer. Nothing is quadratic; the train side would be a
    * persisted bucketed index in production.
    */
  val q48 = EngineQuery(
    "q48_cross_split_leakage",
    (s, dir) => {
      val t = Tables(s, dir)
      val SpanLen = 8
      val spans = t.documents
        .select(col("doc_id"), splitDraw(col("doc_id")).as("bk"),
          tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= SpanLen)
        .select(col("doc_id"), col("bk"),
          explode(spanHashesWide(tokenHashes(col("ws")), SpanLen)).as("gh"))
      val trainIdx = spans.filter(col("bk") < 800)
        .select(col("gh")).distinct()
      val testSpans = spans.filter(col("bk") >= 900)
        .select(col("doc_id"), col("gh")).distinct()
      testSpans
        .join(trainIdx.withColumn("hit", lit(1)), Seq("gh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("hit") === 1, 1L).otherwise(0L)).as("n_leaked"))
        .select(col("doc_id"), col("n_spans"), col("n_leaked"),
          (col("n_leaked").cast(DoubleType) /
            col("n_spans").cast(DoubleType)).as("leak_frac"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH toks AS (
              SELECT doc_id,
                (doc_id % 1000000007) * 2654435761 % 1000000007 % 1000 AS bk,
                string_split(trim(text), ' ') ws
              FROM documents
            ), th AS (
              SELECT doc_id, bk,
                [coalesce(list_sum([(ascii(w[i])
                    * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                    % 1000000007
                    for i in range(1, length(w)+1)]) % 1000000007, 0)
                 for w in ws] AS ths
              FROM toks WHERE len(ws) >= 8
            ), g AS (
              SELECT doc_id, bk,
                UNNEST([(${spanHashWideSql("ths", 8)})
                        for i in range(1, len(ths)-6)]) AS gh
              FROM th
            ), train_idx AS (
              SELECT DISTINCT gh FROM g WHERE bk < 800
            ), test_spans AS (
              SELECT DISTINCT doc_id, gh FROM g WHERE bk >= 900
            ), leaked AS (
              SELECT t.doc_id, COUNT(*) AS n_leaked
              FROM test_spans t SEMI JOIN train_idx x ON t.gh = x.gh
              GROUP BY t.doc_id
            )
            SELECT t.doc_id, COUNT(*) AS n_spans,
              CAST(COALESCE(MAX(l.n_leaked), 0) AS BIGINT) AS n_leaked,
              CAST(COALESCE(MAX(l.n_leaked), 0) AS DOUBLE) / COUNT(*)
                AS leak_frac
            FROM test_spans t LEFT JOIN leaked l ON t.doc_id = l.doc_id
            GROUP BY t.doc_id
            ORDER BY t.doc_id"""))

  /** Multi-length span dedup (ExactSubstr analog, r6 verdict #4):
    * duplicated-REGION detection approximating Lee et al. 2022's
    * maximal-substring semantics with fixed gram lengths {8, 16, 32}.
    * q47's single length fragments a 50-token duplicated passage into
    * ~43 overlapping 8-gram hits; here every duplicated span of every
    * length becomes a token interval [s, s+L) and per-doc interval
    * UNION (gaps-and-islands over (s, e)) merges them into maximal
    * regions — one region per planted passage, nested shorter hits
    * subsumed by construction. A region's `strength` is the longest
    * gram that witnessed it: 32-witnessed regions are certain
    * duplication; 8-only regions are short (8–15 token) matches.
    *
    * Scale shape: the ONLY corpus-sized stage is one (len, gh)
    * shuffle of the exploded spans, consumed by a constant-memory
    * min/max window (shared-by-2-docs test) — q47's physics with a 3×
    * explode factor, shuffling 8-byte hashes, never text, and no join
    * anywhere. The island Window partitions by doc_id and is bounded
    * by per-doc token count, never corpus size.
    */
  def spanRegions(docs: org.apache.spark.sql.DataFrame,
      lengths: Seq[Int] = Seq(8, 16, 32))
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"), tokenHashes(tokens(col("text"))).as("ths"))
      .filter(size(col("ths")) >= lengths.min)
    val spans = toks.select(col("doc_id"), explode(flatten(array(
        lengths.map(l => transform(spanHashesWide(col("ths"), l), (g, i) =>
          struct(i.as("s"), (i + lit(l)).as("e"), lit(l).as("len"),
            g.as("gh")))): _*))).as("sp"))
    // "shared by >= 2 distinct docs" needs no count-distinct at all:
    // min(doc_id) != max(doc_id) over a (len, gh) window — the q43
    // discipline (per-key stat as a window over the ONE span shuffle,
    // not an agg + join back) taken further: min/max frames are
    // constant-memory, so the corpus-sized span set shuffles exactly
    // once and documents is scanned exactly once (an agg+join
    // formulation re-derived the explode per side — measured ~1.9× the
    // whole query at sf0.1 — because pruning made the two exchange
    // subtrees non-identical, defeating AQE exchange reuse)
    val byKey = Window.partitionBy(col("len"), col("gh"))
    val dup = spans
      .select(col("doc_id"), col("sp.s").as("s"), col("sp.e").as("e"),
        col("sp.len").as("len"), col("sp.gh").as("gh"))
      .withColumn("solo",
        min(col("doc_id")).over(byKey) === max(col("doc_id")).over(byKey))
      .filter(!col("solo"))
      .drop("solo")
    // gaps-and-islands: a new region starts where s clears every
    // preceding interval's end; (s, e) is a total order per doc (two
    // intervals share s only with different lengths, hence different e)
    val ord = Window.partitionBy("doc_id").orderBy("s", "e")
    val isl = dup
      .withColumn("brk",
        when(col("s") > coalesce(max(col("e")).over(
          ord.rowsBetween(Window.unboundedPreceding, -1)), lit(-1)),
          1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("rs"), max(col("e")).as("re"),
        max(col("len")).as("strength"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_regions"),
        sum(col("re") - col("rs")).as("dup_tokens"),
        max(col("re") - col("rs")).cast(LongType).as("max_region"),
        sum(when(col("strength") >= lengths.max, 1L).otherwise(0L))
          .as("n_strong"))
      .orderBy(col("doc_id"))
  }

  private def spanLenCte(l: Int): String =
    s"""g$l AS (
              SELECT doc_id, UNNEST(range(1, len(ths)-${l - 2})) AS s,
                UNNEST([(${spanHashWideSql("ths", l)})
                        for i in range(1, len(ths)-${l - 2})]) AS gh
              FROM th WHERE len(ths) >= $l
            )"""

  val q165 = EngineQuery(
    "q165_multilen_span_dedup",
    (s, dir) => spanRegions(Tables(s, dir).documents),
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(trim(text), ' ') ws
              FROM documents
            ), th AS (
              SELECT doc_id,
                [coalesce(list_sum([(ascii(w[i])
                    * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                    % 1000000007
                    for i in range(1, length(w)+1)]) % 1000000007, 0)
                 for w in ws] AS ths
              FROM toks WHERE len(ws) >= 8
            ), ${spanLenCte(8)}, ${spanLenCte(16)}, ${spanLenCte(32)},
            g AS (
              SELECT doc_id, s, s+8 AS e, 8 AS l, gh FROM g8
              UNION ALL
              SELECT doc_id, s, s+16 AS e, 16 AS l, gh FROM g16
              UNION ALL
              SELECT doc_id, s, s+32 AS e, 32 AS l, gh FROM g32
            ), nd AS (
              SELECT l, gh, COUNT(DISTINCT doc_id) AS nd
              FROM g GROUP BY l, gh
            ), dup AS (
              SELECT g.doc_id, g.s, g.e, g.l
              FROM g JOIN nd ON g.l = nd.l AND g.gh = nd.gh
              WHERE nd.nd >= 2
            ), isl AS (
              SELECT doc_id, s, e, l,
                CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS brk
              FROM dup
            ), isl2 AS (
              SELECT doc_id, s, e, l,
                SUM(brk) OVER (PARTITION BY doc_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS island
              FROM isl
            ), regions AS (
              SELECT doc_id, island, MIN(s) AS rs, MAX(e) AS re,
                MAX(l) AS strength
              FROM isl2 GROUP BY doc_id, island
            )
            SELECT doc_id, COUNT(*) AS n_regions,
              CAST(SUM(re - rs) AS BIGINT) AS dup_tokens,
              CAST(MAX(re - rs) AS BIGINT) AS max_region,
              CAST(SUM(CASE WHEN strength >= 32 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_strong
            FROM regions GROUP BY doc_id ORDER BY doc_id"""))

  /** Dedup-quality EVALUATION harness — q217's "eval as an operator"
    * discipline applied to the dedup family: precision and recall of
    * the q41/q45 MinHash-LSH admission rule (strong pairs, ≥ 4 shared
    * bands) against Jaccard ground truth computed over the
    * dfCap-CAPPED shingle sets — i.e. the truth is exact RELATIVE TO
    * the capped approximation, not to uncapped Jaccard: a pair whose
    * overlap lies entirely in hot (df > dfCap) shingles is outside
    * recall's denominator by construction (SCALING.md round 12
    * measured the metric cap-insensitive on the fixtures: n_true is
    * identical at cap ∈ {10, 50, 200}). Within that universe the pair
    * space is COMPLETE: any pair with capped-J ≥ 0.5 > 0 shares a
    * capped shingle, so the share-a-shingle self-join (bounded per
    * shingle by dfCap², the q43 discipline) enumerates every true
    * pair. The J ≥ 0.5 test is the INTEGER
    * comparison 3·ni ≥ na+nb (no float threshold), so membership —
    * and therefore both metrics — is exact and the sheet hash-gates.
    * This is the tuning loop a dedup owner actually runs when picking
    * bands/rows: precision says how much the LSH admission over-drops,
    * recall says what escapes it.
    *
    * Scale shape: the truth side is one capped shingle self-join (the
    * q43 bound); the prediction side is q41's band-bucket join; the
    * metric joins touch |pairs| rows. Output is ONE summary row.
    */
  val q223 = EngineQuery(
    "q223_dedup_eval_prf",
    (s, dir) => {
      val t = Tables(s, dir)
      val shAll = t.documents
        .select(col("doc_id"), tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(shingles3(col("ws"))).as("s"))
      val wDf = org.apache.spark.sql.expressions.Window
        .partitionBy(col("s"))
      // materialized once (optimization r15): the rare-shingle frame
      // feeds THREE consumers — the per-doc set sizes and both sides
      // of the truth self-join — and without the checkpoint each
      // consumer re-derived the shingle explode + df-window subtree
      // (profiled at 10-24 s of summed task time per invocation at
      // sf0.1/32 cores; ~3x the frame's one-pass cost). Same move as
      // the q159 edge materialization; transient, so the harness
      // releases the blocks after the gate's result is consumed.
      val sh = graft.ops.SessionScratch.transientCheckpoint(
        shAll.withColumn("df", count(lit(1)).over(wDf))
          .filter(col("df") <= dfCap).drop("df"))
      val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val truth = sh.select(col("doc_id").as("doc_a"), col("s"))
        .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("s"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("ni"))
        .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")),
          "doc_a")
        .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")),
          "doc_b")
        .filter(col("ni") * 3 >= col("na") + col("nb"))
        .select(col("doc_a"), col("doc_b"))
      val pred = minhashPairs(s, dir)
        .filter(col("n_bands") >= 4)
        .select(col("doc_a"), col("doc_b"))
      val nPred = pred.agg(count(lit(1)).as("n_pred"))
      val nTrue = truth.agg(count(lit(1)).as("n_true"))
      val nHit = pred.join(truth, Seq("doc_a", "doc_b"))
        .agg(count(lit(1)).as("n_hit"))
      nPred.crossJoin(nTrue).crossJoin(nHit)
        .select(col("n_pred"), col("n_true"), col("n_hit"),
          expr("case when n_pred = 0 then 0L " +
            "else n_hit * 1000000 div n_pred end").as("precision_e6"),
          expr("case when n_true = 0 then 0L " +
            "else n_hit * 1000000 div n_true end").as("recall_e6"))
    },
    Some(minhashPairsCtes +
      s""", rare AS (
           SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= $dfCap
         ), shc AS (
           SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)
         ), cnt AS (
           SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id
         ), inter AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ni
           FROM shc a JOIN shc b
             ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2
         ), truthp AS (
           SELECT doc_a, doc_b FROM inter
           JOIN cnt ca ON doc_a = ca.doc_id
           JOIN cnt cb ON doc_b = cb.doc_id
           WHERE 3*ni >= ca.n + cb.n
         ), predp AS (
           SELECT doc_a, doc_b FROM pairs WHERE n_bands >= 4
         ), np AS (SELECT COUNT(*) AS n_pred FROM predp),
         nt AS (SELECT COUNT(*) AS n_true FROM truthp),
         nh AS (
           SELECT COUNT(*) AS n_hit
           FROM predp JOIN truthp USING (doc_a, doc_b)
         )
         SELECT n_pred, n_true, n_hit,
           CAST(CASE WHEN n_pred = 0 THEN 0
             ELSE n_hit * 1000000 // n_pred END AS BIGINT)
             AS precision_e6,
           CAST(CASE WHEN n_true = 0 THEN 0
             ELSE n_hit * 1000000 // n_true END AS BIGINT) AS recall_e6
         FROM np CROSS JOIN nt CROSS JOIN nh"""))

  /** Benchmark DECONTAMINATION — q48's leakage audit turned into the
    * ENFORCEMENT operator a training pipeline actually runs (Brown et
    * al. 2020 appendix C; the GPT-3 13-gram rule with this engine's
    * 8-token span fingerprints): every TRAIN-split document sharing
    * any 8-token span with any TEST-split document is dropped from the
    * training corpus. q48 measures contamination per test doc; this
    * emits the decontaminated corpus manifest — per source, the train
    * population, the dropped count, the survivors, and an exact-int64
    * membership witness (sum of kept doc_ids mod 1000003 — the q49
    * order_sum pattern, bounded by n·1e6 so it never overflows int64
    * at any corpus size; a raw id sum would wrap in Spark but ERROR in
    * DuckDB past int64) so the gate hashes the kept SET, not just its
    * size.
    *
    * Scale shape: identical to q48 — one (span-hash) shuffle of the
    * exploded spans, the test-side index distinct'd then semi-joined
    * against the train spans (never doc×doc), one per-source rollup.
    * Span-less (<8 token) train docs cannot leak and are kept by
    * construction (they never enter the span join).
    */
  /** Distinct 8-token span fingerprints of a (…, text) frame — the
    * "benchmark index" side of decontamination. Shared by the q224
    * gate and the streaming twin (StreamingSpec).
    */
  private[graft] def spanIndex(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ws = tokens(col("text"))
    docs.select(ws.as("ws"))
      .filter(size(col("ws")) >= 8)
      .select(explode(spanHashesWide(tokenHashes(col("ws")), 8)).as("gh"))
      .distinct()
  }

  /** Rows of `train` (must carry doc_id + text) whose documents share
    * NO 8-token span with the static index `testIdx(gh)` — per-doc
    * stateless, so streaming micro-batches compose trivially (the
    * StreamingSpec twin proves the seam).
    */
  private[graft] def decontaminateSurvivors(
      train: org.apache.spark.sql.DataFrame,
      testIdx: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spans = train
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 8)
      .select(col("doc_id"),
        explode(spanHashesWide(tokenHashes(col("ws")), 8)).as("gh"))
    val dropped = spans.join(testIdx, Seq("gh"), "left_semi")
      .select(col("doc_id")).distinct()
    train.join(dropped, Seq("doc_id"), "left_anti")
  }

  val q224 = EngineQuery(
    "q224_decontaminate_train",
    (s, dir) => {
      val t = Tables(s, dir)
      val base = t.documents
        .select(col("doc_id"), col("source"), col("text"),
          splitDraw(col("doc_id")).as("bk"))
      val testIdx = spanIndex(base.filter(col("bk") >= 900))
      val train = base.filter(col("bk") < 800)
        .select(col("doc_id"), col("source"), col("text"))
      val kept = decontaminateSurvivors(train, testIdx)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept0"),
          sum(col("doc_id") % 1000003L).as("kept_id_sum0"))
      train.groupBy(col("source"))
        .agg(count(lit(1)).as("n_train"))
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("n_train"),
          (col("n_train") - coalesce(col("n_kept0"), lit(0L)))
            .as("n_dropped"),
          coalesce(col("n_kept0"), lit(0L)).as("n_kept"),
          coalesce(col("kept_id_sum0"), lit(0L)).as("kept_id_sum"))
        .orderBy(col("source"))
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, source,
                (doc_id % 1000000007) * 2654435761 % 1000000007 % 1000
                  AS bk,
                string_split(trim(text), ' ') ws
              FROM documents
            ), th AS (
              SELECT doc_id, bk,
                [coalesce(list_sum([(ascii(w[i])
                    * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                    % 1000000007
                    for i in range(1, length(w)+1)]) % 1000000007, 0)
                 for w in ws] AS ths
              FROM toks WHERE len(ws) >= 8
            ), g AS (
              SELECT doc_id, bk,
                UNNEST([(${PortableHash.spanHashWideSql("ths", 8)})
                        for i in range(1, len(ths)-6)]) AS gh
              FROM th
            ), test_idx AS (
              SELECT DISTINCT gh FROM g WHERE bk >= 900
            ), dropped AS (
              SELECT DISTINCT t.doc_id
              FROM g t SEMI JOIN test_idx x ON t.gh = x.gh
              WHERE t.bk < 800
            )
            SELECT t.source, COUNT(*) AS n_train,
              CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
              CAST(COUNT(*) - SUM(CASE WHEN d.doc_id IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              CAST(SUM(CASE WHEN d.doc_id IS NULL THEN t.doc_id % 1000003
                ELSE 0 END) AS BIGINT) AS kept_id_sum
            FROM toks t LEFT JOIN dropped d ON t.doc_id = d.doc_id
            WHERE t.bk < 800
            GROUP BY t.source ORDER BY t.source"""))

  val all: Seq[EngineQuery] =
    Seq(q40, q41, q42, q43, q44, q45, q46, q47, q48, q165, q196,
      q215, q223, q224)
}
