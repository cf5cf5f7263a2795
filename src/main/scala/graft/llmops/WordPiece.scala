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

  /** Train [[Rounds]] likelihood-ratio merges over a `(word, freq)`
    * table. Same loop shape as [[Bpe.trainOn]]: per round one pair
    * hash-agg + one unit hash-agg + a 1-row driver argmax + a
    * chained-replace projection, vocabulary localCheckpointed and the
    * previous round's blocks released.
    */
  def trainOn(words: DataFrame, rounds: Int): Seq[Merge] = {
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
    merges.result()
  }

  /** Memoized full-corpus training (the [[Bpe.train]] contract). */
  def train(s: SparkSession, dir: String): Seq[Merge] =
    SessionScratch.memo("wordpiece_train",
      s.sparkContext.applicationId, dir) {
      trainOn(Bpe.wordFreq(s, dir), Rounds)
    }

  /** The unrolled oracle: BPE's wf/w0 header (same segmentation
    * representation), then per round pair counts, unit counts, the
    * HUGEINT-exact scored argmax, and the replace.
    */
  private def oracleSql: String = {
    val header = s"""WITH wf AS MATERIALIZED (
          SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '[^\\p{L}]+'))
              AS word
            FROM documents
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
    val union = (1 to Rounds).map(i => s"SELECT * FROM b$i")
      .mkString(" UNION ALL ")
    header + rounds + s"""
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
      val merged = train(s, dir)
      s.createDataFrame(merged)
        .select(col("merge_rank"), col("lhs"), col("rhs"), col("cnt"),
          col("score_fp"))
        .orderBy(col("merge_rank"))
    },
    Some(oracleSql))

  val all: Seq[EngineQuery] = Seq(q193)
}
