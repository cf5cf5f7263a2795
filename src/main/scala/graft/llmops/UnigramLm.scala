package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{EngineQuery, SessionScratch, Tables}

/** Unigram-LM tokenizer induction (SentencePiece's second algorithm,
  * Kudo 2018, "Subword Regularization") — the other half of the
  * tokenizer-training story next to BPE (q166): instead of greedily
  * growing merges, START from a large candidate-piece vocabulary and
  * let EM keep the pieces that actually carry the corpus.
  *
  * Deterministic, integer-exact variant (the q166/q159 oracle-replay
  * discipline): hard-EM with a Viterbi E-step under a lexicographic
  * objective — segment each word into the FEWEST pieces, breaking ties
  * toward the highest total piece count, then toward the earliest
  * split. The published algorithm scores segmentations by float
  * log-likelihood; a float objective would make tie order
  * engine-dependent (the exact class of divergence the oracle gate
  * exists to catch), so the objective is encoded in one int64 per DP
  * cell: `score = pieces·2^42 − Σ min(cnt, 2^36)`, minimized —
  * piece-count dominates, counts break ties, and every candidate
  * carries its split point in the low 5 bits so the argmin IS the
  * tie-broken backpointer. All arithmetic replays bit-exactly in
  * DuckDB.
  *
  *  - SEED: every substring of length ≤ [[MaxPiece]] of the (capped)
  *    word table, counted with word frequency; the top [[SeedTopK]]
  *    multi-char candidates plus ALL single characters (coverage: any
  *    word can always fall back to chars, so Viterbi is total).
  *  - E-step: Viterbi DP per word — ≤ [[MaxWord]] cells, each the min
  *    over ≤ [[MaxPiece]] candidates looked up in the word's own
  *    piece→count map (built once per word by ONE broadcast join
  *    against the vocab); DP + backtrack run as one native codegen'd
  *    expression per row ([[graft.functions.ViterbiPieces]], r15 —
  *    formerly an unrolled ~34-projection plan whose Catalyst
  *    re-processing dominated q175's steady state).
  *  - M-step: piece counts over the chosen segmentations; multi-char
  *    pieces that no word used are PRUNED (the SentencePiece shrink
  *    step), single chars persist at count 0.
  *  - [[EmRounds]] rounds, then the top pieces by final count.
  *
  * Scale shape (100 TB): the corpus is touched ONCE (the word-frequency
  * hash-agg, Zipf-bounded output — same boundedness as q166); seeding,
  * DP, and both M-steps run on word-table-sized frames. The vocab
  * (≤ SeedTopK + |alphabet| rows) broadcasts into the per-word map
  * build; the DP itself is a native-codegen projection — no shuffle,
  * no UDF, bounded work (MaxWord·MaxPiece lookups/row). EM round count
  * is FIXED, so plan depth is bounded; each round's words frame is
  * localCheckpointed and the previous round released (the BPE
  * discipline).
  */
object UnigramLm {

  /** Words are capped to this many chars before seeding/DP (both
    * engines identically); the DP unrolls exactly this many steps.
    */
  val MaxWord = 16

  /** Max candidate piece length. */
  val MaxPiece = 4

  /** Multi-char seed candidates kept (by count desc, piece asc). */
  val SeedTopK = 120

  /** Hard-EM rounds (segment → recount → prune). */
  val EmRounds = 2

  /** Final vocabulary rows reported by the gate query. */
  val TopOut = 30

  /** Piece-cost base: dominates any capped count sum (16·2^36 < 2^42). */
  val Big = 1L << 42

  /** Count cap inside the DP objective — keeps the packed score exact
    * at any corpus size (counts beyond the cap cannot influence
    * tie-breaks, which is the documented trade for int64 exactness).
    */
  val CntCap = 1L << 36

  // The DP packs (score, split) into ONE int64 cell as `score*32 + i`
  // and relies on three inequalities that are only true for the current
  // constants; editing any of MaxWord/MaxPiece/Big/CntCap without
  // re-checking them would silently corrupt the packed argmin (and the
  // oracle equivalence) rather than fail. Tie them together statically:
  //  - the split point i < MaxWord must fit the low 5 bits (÷32 packing);
  //  - piece-count must dominate the count sum: a segmentation with
  //    fewer pieces must always win, i.e. MaxWord·CntCap < Big;
  //  - the packed value must not overflow: worst score ≈ MaxWord·Big,
  //    times 32 for the packing, must stay under Long.MaxValue.
  require(MaxWord <= 32, "DP packing: split point must fit 5 bits")
  require(MaxWord.toLong * CntCap < Big,
    "DP objective: piece-count term must dominate any capped count sum")
  require(MaxWord.toLong * Big <= Long.MaxValue / 32,
    "DP packing: score*32 must not overflow int64")

  /** Capped word-frequency table of a documents frame: Unicode letter
    * runs (the [[Bpe.WordSplitRe]] segmentation), truncated to
    * [[MaxWord]] chars, re-aggregated.
    */
  private[graft] def cappedWords(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(lower(col("text")), Bpe.WordSplitRe))
        .as("w"))
      .filter(col("w") =!= "")
      .select(substring(col("w"), 1, MaxWord).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** All (piece, freq) substring occurrences of the word table —
    * every start position, lengths 1..[[MaxPiece]].
    */
  private def subPieces(words: DataFrame): DataFrame =
    words.select(col("freq"), explode(expr(
      s"""flatten(transform(sequence(1, length(word)), i ->
          transform(sequence(1, least($MaxPiece, length(word) - i + 1)),
            l -> substring(word, i, l))))""")).as("piece"))

  /** Seed vocabulary: top-[[SeedTopK]] substrings by weighted count
    * plus every single character (coverage floor). Returns an
    * already-localCheckpointed frame: the seed aggregate feeds BOTH
    * union branches, so it is materialized once (without this the full
    * substring explode-and-aggregate ran twice per call — the same
    * re-run cost the chars checkpoint in [[trainOn]] avoids), and its
    * blocks are released as soon as the combined result materializes.
    */
  private[graft] def seedVocab(words: DataFrame): DataFrame = {
    val seed = subPieces(words)
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .localCheckpoint()
    val out = seed.orderBy(col("cnt").desc, col("piece")).limit(SeedTopK)
      .unionByName(seed.filter(length(col("piece")) === 1))
      .distinct()
      .localCheckpoint()
    SessionScratch.releaseCheckpoint(seed)
    out
  }

  /** One hard-EM E-step: Viterbi-segment every word under `vocab`
    * (piece, cnt) and return (word, freq, pieces) with `pieces` the
    * chosen segmentation (emitted back-to-front; order is irrelevant
    * to the M-step and the coverage invariant).
    */
  private[graft] def viterbiSegment(words: DataFrame,
      vocab: DataFrame): DataFrame = {
    // the word's own piece→cnt map: ONE broadcast join against the
    // vocab, grouped back — ≤ MaxWord·MaxPiece entries per word
    val entries = words
      .select(col("word"), col("freq"), explode(expr(
        s"""array_distinct(flatten(transform(sequence(1, length(word)),
            i -> transform(sequence(1,
              least($MaxPiece, length(word) - i + 1)),
              l -> substring(word, i, l)))))""")).as("piece"))
      .join(broadcast(vocab), Seq("piece"))
      .groupBy(col("word"), col("freq"))
      .agg(map_from_entries(collect_list(struct(col("piece"), col("cnt"))))
        .as("m"))
    // the DP itself is ONE native codegen'd expression per row
    // (optimization r15 — graft.functions.ViterbiPieces, a bit-exact
    // port of the formerly unrolled ~34-projection plan): profiling
    // put ~90% of q175's steady-state wall in Catalyst re-processing
    // the unrolled plan per invocation (jobWall 0.17 s of a 1.8-2.0 s
    // gate), and an unrolled DP is exactly the "non-codegen-friendly
    // plan churn" guide §1.2 says to move into per-task work. The
    // oracle still replays the cell-level DP (its CTE chain generates
    // from the SAME MaxWord/MaxPiece/Big/CntCap constants), so q174/
    // q175 gate the port cell-exactly.
    //
    // The E-step still MATERIALIZES its segmentations (word-table-
    // sized): the checkpoint remains the analysis barrier between the
    // per-round plans (trainOn releases each round once the recount
    // materializes) and keeps the M-step's explode off the entries
    // aggregation's lineage.
    SessionScratch.transientCheckpoint(
      entries.select(col("word"), col("freq"),
        graft.functions.ViterbiPieces.viterbiPieces(col("word"), col("m"))
          .as("pieces")))
  }

  /** M-step: piece counts over the chosen segmentations, pruned to the
    * used pieces plus the persistent single-char floor.
    */
  private[graft] def recount(segmented: DataFrame,
      chars: DataFrame): DataFrame = {
    val used = segmented
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    used.unionByName(
      chars.join(used, Seq("piece"), "left_anti")
        .select(col("piece"), lit(0L).as("cnt")))
  }

  /** Train [[EmRounds]] hard-EM rounds; returns the final (piece, cnt)
    * vocabulary. Memoized per (app, dir) — training is the ingest half,
    * same contract as [[Bpe.train]].
    */
  def train(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    SessionScratch.memo("unigram_train", s.sparkContext.applicationId,
      dir) {
      trainOn(cappedWords(Tables(s, dir).documents))
    }

  /** The EM loop over an arbitrary capped (word, freq) frame — public
    * for the spec's hand-computed corpus.
    */
  def trainOn(wordsRaw: DataFrame): DataFrame = {
    var words = wordsRaw.localCheckpoint()
    // seedVocab returns its own checkpoint (it must materialize to
    // release the internal seed aggregate) — no second checkpoint here
    var vocab = seedVocab(words)
    // the single-char floor, read off the already-materialized seed
    // vocab (a second seedVocab call would re-run the whole substring
    // explode-and-aggregate); checkpointed because `vocab` is released
    // round by round while chars must persist across all rounds
    val chars = vocab.filter(length(col("piece")) === 1)
      .select(col("piece")).localCheckpoint()
    for (_ <- 1 to EmRounds) {
      val seg = viterbiSegment(words, vocab)
      val prev = vocab
      vocab = recount(seg, chars).localCheckpoint()
      SessionScratch.releaseCheckpoint(prev)
      SessionScratch.releaseCheckpoint(seg)
    }
    // the final vocab stays pinned — train() memoizes it for the
    // session (the Bpe.trainOn contract), so it must NOT be transient
    SessionScratch.releaseCheckpoint(words)
    SessionScratch.releaseCheckpoint(chars)
    vocab
  }

  // ---- oracle ---------------------------------------------------------
  //
  // Programmatically generated so the (i, j) loops are the SAME loops
  // the Spark side unrolls. Per-word piece lookups go through a map
  // column (DuckDB map extraction yields a LIST; `[1]` is
  // value-or-NULL, mirroring Spark's `element_at`).

  /** Capped word-frequency CTE over a documents relation. */
  private def wordsCte(name: String, docsRel: String) =
    s""", $name AS MATERIALIZED (
        SELECT substr(word, 1, $MaxWord) AS word, COUNT(*) AS freq
        FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '[^\\p{L}]+'))
            AS word
          FROM $docsRel
        ) WHERE word <> '' GROUP BY 1
      )"""

  /** All (word, freq, piece) substring occurrences of a word table. */
  private def subsCte(name: String, wordsRel: String) =
    s""", $name AS MATERIALIZED (
        SELECT word, freq, substr(word, i.i, l.l) AS piece
        FROM $wordsRel,
          UNNEST(generate_series(1, length(word))) AS i(i),
          UNNEST(generate_series(1, $MaxPiece)) AS l(l)
        WHERE i.i + l.l - 1 <= length(word)
      )"""

  /** One Viterbi segmentation pass (forward DP + backtrack) of the
    * words behind `subsRel` under `vocabRel`; the final relation
    * `b{tag}_MaxWord` carries (word, freq, pc1..pcN).
    */
  private def segChain(tag: String, subsRel: String,
      vocabRel: String): String = {
    val wmap = s""", wm$tag AS MATERIALIZED (
        SELECT word, freq,
          map_from_entries(list({'k': piece, 'v': cnt})) AS m
        FROM (
          SELECT DISTINCT s.word, s.freq, s.piece, vv.cnt
          FROM $subsRel s JOIN $vocabRel vv ON vv.piece = s.piece
        ) GROUP BY word, freq
      ), d${tag}_0 AS (SELECT *, CAST(0 AS BIGINT) AS s0 FROM wm$tag)"""
    val fwd = (1 to MaxWord).map { j =>
      val cands = (math.max(0, j - MaxPiece) until j).map { i =>
        val piece = s"substr(word, ${i + 1}, ${j - i})"
        s"""CASE WHEN length(word) >= $j
              AND len(m[$piece]) > 0
            THEN (s$i + $Big - least(m[$piece][1], $CntCap)) * 32 + $i
            END"""
      }.mkString(", ")
      s""", d${tag}_$j AS (
          SELECT *, least($cands) AS e$j,
            least($cands) // 32 AS s$j,
            least($cands) % 32 AS a$j
          FROM d${tag}_${j - 1})"""
    }.mkString
    val bt0 = s""", b${tag}_0 AS (
        SELECT *, CAST(length(word) AS BIGINT) AS p0,
          [${(1 to MaxWord).map("a" + _).mkString(",")}] AS aa
        FROM d${tag}_$MaxWord)"""
    val bt = (1 to MaxWord).map { t =>
      s""", b${tag}_$t AS (
          SELECT *,
            CASE WHEN p${t - 1} > 0
              THEN aa[CAST(p${t - 1} AS INT)] END AS p$t,
            CASE WHEN p${t - 1} > 0
              THEN substr(word, CAST(p$t + 1 AS INT),
                CAST(p${t - 1} - p$t AS INT)) END AS pc$t
          FROM b${tag}_${t - 1})"""
    }.mkString
    wmap + fwd + bt0 + bt
  }

  /** The filtered-non-null pieces list of a segmentation relation. */
  private def piecesList: String =
    s"list_filter([${(1 to MaxWord).map("pc" + _).mkString(",")}], " +
      "x -> x IS NOT NULL)"

  /** Seed + [[EmRounds]] EM rounds over the word table `wcap` (already
    * in scope via [[wordsCte]]): defines `subs`, `seed`, `chars`,
    * `v0`..`v{EmRounds}`.
    */
  private def trainingCtes: String = {
    val head = subsCte("subs", "wcap") + s""", seed AS MATERIALIZED (
        SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM subs GROUP BY piece
      ), chars AS MATERIALIZED (
        SELECT piece FROM seed WHERE length(piece) = 1
      ), v0 AS MATERIALIZED (
        SELECT piece, cnt FROM (
          SELECT piece, cnt FROM seed
          ORDER BY cnt DESC, piece LIMIT $SeedTopK
        ) UNION
        SELECT piece, cnt FROM seed WHERE length(piece) = 1
      )"""
    val rounds = (1 to EmRounds).map { r =>
      segChain(s"$r", "subs", s"v${r - 1}") + s""", seg$r AS MATERIALIZED (
          SELECT freq, unnest($piecesList) AS piece
          FROM b${r}_$MaxWord
        ), used$r AS MATERIALIZED (
          SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
          FROM seg$r GROUP BY piece
        ), v$r AS MATERIALIZED (
          SELECT piece, cnt FROM used$r
          UNION ALL
          SELECT c.piece, CAST(0 AS BIGINT) AS cnt
          FROM chars c ANTI JOIN used$r u ON c.piece = u.piece
        )"""
    }.mkString
    head + rounds
  }

  /** q174's oracle: train on the full corpus, emit the top vocab.
    * (`_one` is a 1-row anchor CTE so every generated CTE can start
    * with a comma uniformly.)
    */
  private[graft] def oracleSql: String =
    "WITH _one AS (SELECT 1)" + wordsCte("wcap", "documents") +
      trainingCtes + s"""
      SELECT piece, cnt, length(piece) AS piece_len
      FROM v$EmRounds
      ORDER BY cnt DESC, piece LIMIT $TopOut"""

  /** Gate row: the final unigram-LM vocabulary — every EM round
    * (seeding, both Viterbi segmentations, both recounts) replayed
    * bit-exactly by the oracle.
    */
  val q174 = EngineQuery(
    "q174_unigram_lm_vocab",
    (s, dir) => train(s, dir)
      .select(col("piece"), col("cnt"),
        length(col("piece")).cast("long").as("piece_len"))
      .orderBy(col("cnt").desc, col("piece"))
      .limit(TopOut),
    Some(oracleSql))

  /** Vocab trained on the q172 TRAIN split only — the ingest half of
    * the held-out eval (q175), same memo contract as
    * [[Bpe.heldoutTrain]].
    */
  def heldoutTrain(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    SessionScratch.memo("unigram_train_holdout",
      s.sparkContext.applicationId, dir) {
      trainOn(cappedWords(Tables(s, dir).documents
        .filter(Sampling.groupSplit(col("source")) === "train")))
    }

  /** HELD-OUT unigram-LM eval — q173's story for the second tokenizer:
    * vocab hard-EM-trained on the q172 train split, then val/test
    * sources segmented by the SAME Viterbi DP. A held-out word the
    * vocabulary cannot cover (a character never seen in training, so
    * even the single-char floor misses) segments to ZERO pieces — it
    * surfaces as one `<unk>` token and is counted in `n_unk` instead
    * of silently vanishing from the denominator (the q173 no-dropout
    * contract; the join back to per-source counts is a LEFT join for
    * the same reason).
    *
    * Scale shape: the held-out corpus contributes one (split, source,
    * word) hash-agg; the DP runs once per DISTINCT held-out word
    * (word-table-sized), and rejoins by broadcast.
    */
  val q175 = EngineQuery(
    "q175_unigram_heldout_fertility",
    (s, dir) => {
      val vocab = heldoutTrain(s, dir)
      val held = Tables(s, dir).documents
        .withColumn("split", Sampling.groupSplit(col("source")))
        .filter(col("split") =!= "train")
      // materialized once: hw feeds BOTH the distinct-word DP input
      // and the final rollup join — without the checkpoint the
      // held-out corpus would be scanned and word-aggregated twice
      // (once in the DP's eager materialization, once at gate
      // execution)
      val hw = SessionScratch.transientCheckpoint(held
        .select(col("split"), col("source"),
          explode(split(lower(col("text")), Bpe.WordSplitRe)).as("w"))
        .filter(col("w") =!= "")
        .select(col("split"), col("source"),
          substring(col("w"), 1, MaxWord).as("word"))
        .groupBy(col("split"), col("source"), col("word"))
        .agg(count(lit(1)).as("n")))
      val hwd = hw.groupBy(col("word")).agg(sum(col("n")).as("freq"))
      val enc = viterbiSegment(hwd, vocab)
        .select(col("word"), size(col("pieces")).as("np"))
      val unk = col("np").isNull || col("np") === 0
      hw.join(broadcast(enc), Seq("word"), "left")
        .select(col("split"), col("source"), col("n"),
          when(unk, lit(1L)).otherwise(col("np").cast("long"))
            .as("n_toks"),
          unk.as("unk"))
        .groupBy(col("split"), col("source"))
        .agg(sum(col("n")).as("n_words"),
          sum(col("n") * col("n_toks")).as("n_tokens"),
          sum(when(col("unk"), col("n")).otherwise(lit(0L)))
            .as("n_unk"))
        .select(col("split"), col("source"), col("n_words"),
          col("n_tokens"), col("n_unk"),
          (col("n_tokens").cast("double") /
            col("n_words").cast("double")).as("tokens_per_word"))
        .orderBy(col("split"), col("source"))
    },
    Some {
      val bucket = PortableHash.splitDrawSql(
        PortableHash.charHashSql("source"))
      s"""WITH _one AS (SELECT 1), sp AS (
            SELECT source, text, $bucket AS bkt FROM documents
          ), tdocs AS (
            SELECT source, text FROM sp WHERE bkt < 800
          ), hdocs AS (
            SELECT CASE WHEN bkt < 900 THEN 'val' ELSE 'test' END
              AS split, source, text
            FROM sp WHERE bkt >= 800
          )""" + wordsCte("wcap", "tdocs") + trainingCtes + s""", hw AS (
            SELECT split, source, substr(word, 1, $MaxWord) AS word,
              COUNT(*) AS n
            FROM (
              SELECT split, source,
                unnest(regexp_split_to_array(lower(text), '[^\\p{L}]+'))
                  AS word
              FROM hdocs
            ) WHERE word <> '' GROUP BY 1, 2, 3
          ), hwd AS (
            SELECT word, CAST(SUM(n) AS BIGINT) AS freq
            FROM hw GROUP BY word
          )""" + subsCte("subsh", "hwd") +
        segChain("h", "subsh", s"v$EmRounds") + s""", ench AS (
            SELECT word, len($piecesList) AS np FROM bh_$MaxWord
          )
          SELECT h.split, h.source,
            CAST(SUM(h.n) AS BIGINT) AS n_words,
            CAST(SUM(h.n * CASE WHEN e.np IS NULL OR e.np = 0
              THEN 1 ELSE e.np END) AS BIGINT) AS n_tokens,
            CAST(SUM(CASE WHEN e.np IS NULL OR e.np = 0
              THEN h.n ELSE 0 END) AS BIGINT) AS n_unk,
            CAST(SUM(h.n * CASE WHEN e.np IS NULL OR e.np = 0
              THEN 1 ELSE e.np END) AS DOUBLE)
              / CAST(SUM(h.n) AS DOUBLE) AS tokens_per_word
          FROM hw h LEFT JOIN ench e ON e.word = h.word
          GROUP BY 1, 2 ORDER BY 1, 2"""
    })

  val all: Seq[EngineQuery] = Seq(q174, q175)
}
