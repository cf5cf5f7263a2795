package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{EngineQuery, SessionScratch, Tables}

/** WordPiece vocabulary induction — the THIRD tokenizer-training family
  * next to BPE (q166, merge by raw pair count) and unigram-LM (q174,
  * prune by segmentation objective): WordPiece (Schuster & Nakajima
  * 2012; the BERT tokenizer's trainer) merges the pair maximizing the
  * LIKELIHOOD RATIO `count(ab) / (count(a) * count(b))` — the merge
  * that most increases a unigram language model's corpus likelihood —
  * instead of the raw count. The mechanical loop (segmentations, pair
  * counting, merge application) is shared with BPE ([[Bpe.initSymbols]]
  * / [[Bpe.applyMerge]] — same delimited representation, same
  * leftmost-nonoverlapping replace), so the two trainers differ in
  * exactly one place: the objective.
  *
  * Determinism contract (the q166/q174 discipline): the score is the
  * FIXED-POINT integer `(count(ab) * 10^12) div (count(a) * count(b))`
  * computed in DECIMAL(38,0)/HUGEINT (exact at any corpus size — a
  * 100 TB corpus's token counts overflow the int64 product), truncating
  * division (all quantities positive, so truncation == floor on both
  * engines), ties broken by (score desc, lhs, rhs). Every round is
  * therefore bit-replayable: the oracle unrolls [[Rounds]] rounds of
  * pair-count + unit-count + scored argmax + replace.
  *
  * 100 TB shape: identical to BPE training — the corpus is touched ONCE
  * (the word-frequency aggregate; Zipf bounds the distinct-word table),
  * each round is two vocabulary-sized hash-aggs (pairs, units) + a
  * 1-row argmax + a projection; nothing corpus-sized is ever resident.
  */
object WordPiece {

  /** Fixed merge-round count — the oracle unrolls exactly this many.
    * Fewer than BPE's 12: each WordPiece oracle round carries an extra
    * unit-count aggregation, and 8 rounds already walk the score
    * regime where the likelihood objective diverges from raw counts.
    */
  val Rounds = 8

  /** Fixed-point score scale: score = (cnt·Scale) div (cl·cr). 10^12
    * keeps ~12 significant digits of the ratio — collisions after the
    * floor are resolved by the (lhs, rhs) tie-break identically on
    * both engines, so a coarser scale would still be deterministic,
    * just less discriminating.
    */
  val Scale = 1000000000000L

  final case class Merge(merge_rank: Long, lhs: String, rhs: String,
      cnt: Long, score_fp: Long)

  /** Trained result: the merge table plus the final encoded vocabulary
    * `(word, s, freq)` (the [[Bpe.Trained]] carrier shape — q195's
    * held-out eval needs the trained word list for `n_unseen`).
    */
  final case class Trained(merges: Seq[Merge], vocab: DataFrame)

  /** Train [[Rounds]] likelihood-ratio merges over a `(word, freq)`
    * table. Same loop shape as [[Bpe.trainOn]]: per round one pair
    * hash-agg + one unit hash-agg + a 1-row driver argmax + a
    * chained-replace projection, vocabulary localCheckpointed and the
    * previous round's blocks released.
    */
  def trainOn(words: DataFrame, rounds: Int): Trained = {
    var w = words
      .select(col("word"), Bpe.initSymbols(col("word")).as("s"),
        col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    for (i <- 1 to rounds) {
      val tok = w.select(col("freq"),
        split(expr("trim(BOTH char(31) FROM s)"), Bpe.Sep + Bpe.Sep)
          .as("t"))
      val pairs = tok
        .filter(size(col("t")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(t) - 1), " +
            "i -> struct(element_at(t, i) AS l, element_at(t, i + 1) AS r))"
        )).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
      val units = tok
        .select(col("freq"), explode(col("t")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("freq")).as("ucnt"))
      val top = pairs
        .join(units.select(col("sym").as("l"), col("ucnt").as("ul")),
          Seq("l"))
        .join(units.select(col("sym").as("r"), col("ucnt").as("ur")),
          Seq("r"))
        .select(col("l"), col("r"), col("cnt"),
          // DECIMAL(38,0) products, integral (truncating) division —
          // exact at any corpus size, positive so floor == truncate
          expr(s"(cast(cnt as decimal(38,0)) * $Scale) div " +
            "(cast(ul as decimal(38,0)) * ur)").as("score_fp"))
        .orderBy(col("score_fp").desc, col("l"), col("r"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"WordPiece: vocabulary collapsed before round $i — corpus too " +
          s"small for $rounds merges")
      val (l, r, c, sc) = (top(0).getString(0), top(0).getString(1),
        top(0).getLong(2), top(0).getLong(3))
      merges += Merge(i.toLong, l, r, c, sc)
      val prev = w
      w = w.select(col("word"), Bpe.applyMerge(col("s"), l, r).as("s"),
          col("freq"))
        .localCheckpoint()
      SessionScratch.releaseCheckpoint(prev)
    }
    Trained(merges.result(), w)
  }

  /** Memoized full-corpus training (the [[Bpe.train]] contract). */
  def train(s: SparkSession, dir: String): Trained =
    SessionScratch.memo("wordpiece_train",
      s.sparkContext.applicationId, dir) {
      trainOn(Bpe.wordFreq(s, dir), Rounds)
    }

  /** Merges trained on the q172 TRAIN split only — the ingest half of
    * the held-out eval (q195). Same memo contract as
    * [[Bpe.heldoutTrain]].
    */
  def heldoutTrain(s: SparkSession, dir: String): Trained =
    SessionScratch.memo("wordpiece_train_holdout",
      s.sparkContext.applicationId, dir) {
      trainOn(Bpe.wordFreqOf(graft.ops.Tables(s, dir).documents
        .filter(Sampling.groupSplit(col("source")) === "train")), Rounds)
    }

  /** WordPiece merges applied through [[Bpe.encodeWord]]'s chained-
    * replace projection — the representation is shared (merged symbol
    * = lhs+rhs under the same delimiters), so application is the SAME
    * zero-join codegen'd fold; only the training objective differs.
    */
  def encodeWith(word: org.apache.spark.sql.Column,
      merges: Seq[Merge]): org.apache.spark.sql.Column =
    Bpe.encodeWord(word,
      merges.map(m => Bpe.Merge(m.merge_rank, m.lhs, m.rhs, m.cnt)))

  /** The unrolled oracle chain over documents relation `docsRel` (no
    * leading WITH — the [[Bpe.oracleChainBody]] contract): BPE's wf/w0
    * header (same segmentation representation), then per round pair
    * counts, unit counts, the HUGEINT-exact scored argmax, and the
    * replace.
    */
  private[llmops] def oracleChainBody(docsRel: String): String = {
    val header = s"""wf AS MATERIALIZED (
          SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '[^\\p{L}]+'))
              AS word
            FROM $docsRel
          ) WHERE word <> '' GROUP BY word
        ), w0 AS MATERIALIZED (
          SELECT word,
            chr(31) ||
              regexp_replace(word, '(.)', '\\1' || chr(31) || chr(31), 'g')
              || '_' || chr(31) AS s,
            freq
          FROM wf
        )"""
    val rounds = (1 to Rounds).map { i =>
      s""", p$i AS MATERIALIZED (
          SELECT ts[u.g] AS l, ts[u.g + 1] AS r,
            CAST(SUM(freq) AS BIGINT) AS cnt
          FROM (SELECT string_split(trim(s, chr(31)),
                         chr(31) || chr(31)) AS ts, freq
                FROM w${i - 1}) tok,
               UNNEST(generate_series(1, len(tok.ts) - 1)) AS u(g)
          GROUP BY 1, 2
        ), u$i AS MATERIALIZED (
          SELECT ts[u.g] AS sym, CAST(SUM(freq) AS BIGINT) AS cnt
          FROM (SELECT string_split(trim(s, chr(31)),
                         chr(31) || chr(31)) AS ts, freq
                FROM w${i - 1}) tok,
               UNNEST(generate_series(1, len(tok.ts))) AS u(g)
          GROUP BY 1
        ), b$i AS MATERIALIZED (
          SELECT CAST($i AS BIGINT) AS merge_rank, p.l, p.r, p.cnt,
            CAST((CAST(p.cnt AS HUGEINT) * $Scale)
              // (CAST(ul.cnt AS HUGEINT) * ur.cnt) AS BIGINT) AS score_fp
          FROM p$i p
          JOIN u$i ul ON ul.sym = p.l
          JOIN u$i ur ON ur.sym = p.r
          ORDER BY score_fp DESC, p.l, p.r LIMIT 1
        ), w$i AS MATERIALIZED (
          SELECT w.word,
            replace(w.s,
              chr(31) || b.l || chr(31) || chr(31) || b.r || chr(31),
              chr(31) || b.l || b.r || chr(31)) AS s,
            w.freq
          FROM w${i - 1} w CROSS JOIN b$i b
        )"""
    }.mkString
    header + rounds
  }

  private def oracleSql: String = {
    val union = (1 to Rounds).map(i => s"SELECT * FROM b$i")
      .mkString(" UNION ALL ")
    "WITH " + oracleChainBody("documents") + s"""
        SELECT merge_rank, l AS lhs, r AS rhs, cnt, score_fp FROM ($union)
        ORDER BY merge_rank"""
  }

  /** WordPiece merge-table training over `documents`: [[Rounds]]
    * likelihood-ratio rounds, every round's scored argmax replayed
    * bit-exactly by the oracle.
    */
  val q193 = EngineQuery(
    "q193_wordpiece_induction",
    (s, dir) => {
      val merged = train(s, dir).merges
      s.createDataFrame(merged)
        .select(col("merge_rank"), col("lhs"), col("rhs"), col("cnt"),
          col("score_fp"))
        .orderBy(col("merge_rank"))
    },
    Some(oracleSql))

  /** HELD-OUT WordPiece eval — q173's train→apply→eval discipline for
    * the third tokenizer family, completing the pattern (BPE
    * q166/q173, unigram-LM q174/q175, WordPiece q193/q195): merges
    * trained on q172's TRAIN split only, then val/test documents
    * (whole sources the training never saw) encoded by APPLYING the
    * merge table through the shared chained-replace projection
    * ([[encodeWith]] — zero joins in the encode path, no OOV dropout
    * possible). `n_unseen` counts held-out word occurrences absent
    * from the trained vocabulary — the population a vocab join would
    * silently drop.
    *
    * Scale shape: q173's exactly — training on the Zipf-bounded
    * train-split word table, one (split, source, word) hash-agg on the
    * eval side, the [[Rounds]]-replace encode as a pure projection,
    * one broadcast LEFT join against the vocab word list.
    */
  val q195 = EngineQuery(
    "q195_wordpiece_heldout_fertility",
    (s, dir) => {
      import org.apache.spark.sql.types.DoubleType
      val tr = heldoutTrain(s, dir)
      val words = Tables(s, dir).documents
        .withColumn("split", Sampling.groupSplit(col("source")))
        .filter(col("split") =!= "train")
        .select(col("split"), col("source"),
          explode(split(lower(col("text")), Bpe.WordSplitRe)).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("split"), col("source"), col("word"))
        .agg(count(lit(1)).as("n"))
      val enc = words
        .withColumn("es", encodeWith(col("word"), tr.merges))
        .withColumn("n_toks", expr(
          "(length(es) - length(replace(es, concat(char(31), char(31)), " +
            "''))) div 2 + 1"))
      val vocabWords = tr.vocab.select(col("word"))
        .withColumn("seen", lit(1))
      enc.join(broadcast(vocabWords), Seq("word"), "left")
        .groupBy(col("split"), col("source"))
        .agg(sum(col("n")).as("n_words"),
          sum(col("n") * col("n_toks")).as("n_tokens"),
          sum(when(col("seen").isNull, col("n")).otherwise(lit(0L)))
            .as("n_unseen"))
        .select(col("split"), col("source"), col("n_words"),
          col("n_tokens"), col("n_unseen"),
          (col("n_tokens").cast(DoubleType) /
            col("n_words").cast(DoubleType)).as("tokens_per_word"))
        .orderBy(col("split"), col("source"))
    },
    Some {
      val bucket = PortableHash.splitDrawSql(
        PortableHash.charHashSql("source"))
      val encChain = (1 to Rounds).map { i =>
        s""", e$i AS MATERIALIZED (
            SELECT split, source, word, n,
              replace(s,
                chr(31) || b.l || chr(31) || chr(31) || b.r || chr(31),
                chr(31) || b.l || b.r || chr(31)) AS s
            FROM e${i - 1} CROSS JOIN b$i b
          )"""
      }.mkString
      s"""WITH sp AS (
            SELECT source, text, $bucket AS bkt FROM documents
          ), tdocs AS (
            SELECT source, text FROM sp WHERE bkt < 800
          ), hdocs AS (
            SELECT CASE WHEN bkt < 900 THEN 'val' ELSE 'test' END AS split,
              source, text
            FROM sp WHERE bkt >= 800
          ), ${oracleChainBody("tdocs")}, vocab AS (
            SELECT DISTINCT word FROM w$Rounds
          ), hw AS (
            SELECT split, source, word, COUNT(*) AS n FROM (
              SELECT split, source,
                unnest(regexp_split_to_array(lower(text), '[^\\p{L}]+'))
                  AS word
              FROM hdocs
            ) WHERE word <> '' GROUP BY 1, 2, 3
          ), e0 AS (
            SELECT split, source, word, n,
              chr(31) ||
                regexp_replace(word, '(.)', '\\1' || chr(31) || chr(31), 'g')
                || '_' || chr(31) AS s
            FROM hw
          )$encChain, enc AS (
            SELECT split, source, word, n,
              (length(s) - length(replace(s, chr(31) || chr(31), ''))) // 2
                + 1 AS n_toks
            FROM e$Rounds
          )
          SELECT e.split, e.source,
            CAST(SUM(e.n) AS BIGINT) AS n_words,
            CAST(SUM(e.n * e.n_toks) AS BIGINT) AS n_tokens,
            CAST(SUM(CASE WHEN v.word IS NULL THEN e.n ELSE 0 END)
              AS BIGINT) AS n_unseen,
            CAST(SUM(e.n * e.n_toks) AS DOUBLE)
              / CAST(SUM(e.n) AS DOUBLE) AS tokens_per_word
          FROM enc e LEFT JOIN vocab v ON e.word = v.word
          GROUP BY 1, 2 ORDER BY 1, 2"""
    })

  val all: Seq[EngineQuery] = Seq(q193, q195)
}
