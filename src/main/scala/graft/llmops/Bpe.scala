package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.ops.{EngineQuery, SessionScratch, Tables}

/** BPE vocabulary induction — the tokenizer-training operator of the
  * LLM-data pipeline (Sennrich et al. 2016, "Neural Machine Translation
  * of Rare Words with Subword Units"). The reference pipeline feeds an
  * LLM (sql_generator.py builds prompts for one); training the tokenizer
  * that LLM consumes is the genuinely missing tokenizer-side operator in
  * the corpus-curation story (r6 verdict #5).
  *
  * The classic algorithm, kept exactly: train on the WORD-FREQUENCY
  * table (never the raw corpus — the published implementations all
  * collapse the corpus to `{word: count}` first), represent each word as
  * a symbol sequence (characters + an end-of-word marker), then for a
  * fixed number of rounds (a) count adjacent symbol pairs weighted by
  * word frequency, (b) pick the most frequent pair (deterministic
  * tie-break: count desc, then left/right symbol ascending), (c) replace
  * every occurrence with the merged symbol.
  *
  * Determinism discipline (the q159 Pregel playbook): all counts are
  * exact int64; the merge REPLACE step is `replace(str, search, repl)` —
  * leftmost, non-overlapping, continue-after-replacement — which is the
  * same greedy application order the reference BPE uses, and the SAME
  * builtin in Spark and DuckDB, so the oracle replays every round
  * bit-exactly as an unrolled CTE chain. Symbol sequences travel as
  * U+001F-delimited strings (`␟a␟␟b␟␟c␟␟_␟`): each symbol is wrapped
  * in the separator, so the pattern `␟l␟␟r␟ → ␟lr␟` can only match at
  * symbol boundaries, and overlapping candidates (`aaa` under a merge
  * `(a,a)`) resolve left-greedily in both engines.
  *
  * Scale shape (100 TB): ONE full-corpus pass builds the word-frequency
  * table (map-side-combined hash-agg, output bounded by the true
  * vocabulary — Zipf, not corpus size). Every round then runs on the
  * vocab-sized table: a pair-explode (≤ word length rows per word) +
  * hash-agg, a 1-row `TakeOrderedAndProject` driver pull (the KMeans
  * centroid discipline — driver state is one row per round), and a
  * projection with `localCheckpoint` so round i+1 does not replay
  * round i's lineage (the q159 edge-list move). Round count is FIXED,
  * so plan depth is bounded.
  */
object Bpe {

  /** Symbol-boundary separator: U+001F never occurs in [a-z_] symbols. */
  val Sep = "\u001f"
  private val Sep2 = Sep + Sep

  /** End-of-word marker symbol (Sennrich et al.'s `</w>`). */
  val Eow = "_"

  /** Fixed merge-round count — the oracle unrolls exactly this many. */
  val Rounds = 12

  final case class Merge(merge_rank: Long, lhs: String, rhs: String,
      cnt: Long)

  final case class Trained(merges: Seq[Merge], vocab: DataFrame)

  /** Word-frequency table: lowercase alphabetic words of `documents` —
    * the single full-corpus pass of the whole operator.
    */
  private[graft] def wordFreq(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Train [[Rounds]] BPE merges; returns the merge table plus the final
    * encoded vocabulary `(word, s, freq)` with `s` the ␟-delimited symbol
    * sequence after all merges. Memoized per (app, dir): training is the
    * ingest half shared by q166 (the merge table) and q167 (corpus
    * encoding) — same [[SessionScratch.memo]] contract as the PageRank
    * edge lists.
    */
  def train(s: SparkSession, dir: String): Trained =
    SessionScratch.memo("bpe_train", s.sparkContext.applicationId, dir) {
      trainOn(wordFreq(s, dir), Rounds)
    }

  /** The training loop itself, over an arbitrary `(word, freq)` frame —
    * public so specs can hand it a known corpus (and DeterminismSpec a
    * fresh, unmemoized run in a sibling session).
    */
  def trainOn(words: DataFrame, rounds: Int): Trained = {
      var w = words
        .select(col("word"),
          concat(lit(Sep),
            regexp_replace(col("word"), "(.)", "$1" + Sep2),
            lit(Eow), lit(Sep)).as("s"),
          col("freq"))
        .localCheckpoint()
      val merges = Seq.newBuilder[Merge]
      for (i <- 1 to rounds) {
        val pairs = w
          .select(col("freq"),
            split(expr("trim(BOTH char(31) FROM s)"), Sep2).as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("freq"), explode(expr(
            "transform(sequence(1, size(t) - 1), " +
              "i -> struct(element_at(t, i) AS l, element_at(t, i + 1) AS r))"
          )).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("cnt"))
        val top = pairs.orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        require(top.nonEmpty,
          s"BPE: vocabulary collapsed before round $i — corpus too small " +
            s"for $rounds merges")
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(i.toLong, l, r, c)
        val prev = w
        w = w.select(col("word"),
            replace(col("s"), lit(Sep + l + Sep2 + r + Sep),
              lit(Sep + l + r + Sep)).as("s"),
            col("freq"))
          .localCheckpoint()
        // round i's blocks are dead once round i+1 is materialized —
        // without this every round stays pinned for the session (~13×
        // the necessary resident vocab storage on a real vocabulary)
        SessionScratch.releaseCheckpoint(prev)
      }
      Trained(merges.result(), w)
    }

  /** The shared oracle prefix: word-frequency table + [[Rounds]] unrolled
    * merge rounds. `AS MATERIALIZED` is load-bearing — each `w{i}` is
    * referenced twice (pair counting and the next replace), so without
    * it DuckDB's CTE inlining doubles the expression tree per round.
    */
  private def oracleChain: String = {
    val header = """WITH wf AS MATERIALIZED (
          SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+'))
              AS word
            FROM documents
          ) WHERE word <> '' GROUP BY word
        ), w0 AS MATERIALIZED (
          SELECT word,
            chr(31) ||
              regexp_replace(word, '(.)', '\1' || chr(31) || chr(31), 'g')
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
        ), b$i AS MATERIALIZED (
          SELECT CAST($i AS BIGINT) AS merge_rank, l, r, cnt
          FROM p$i ORDER BY cnt DESC, l, r LIMIT 1
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

  /** BPE merge-table training: [[Rounds]] rounds over `documents`,
    * output = the learned merge table in training order, every round
    * replayed bit-exactly by the oracle.
    */
  val q166 = EngineQuery(
    "q166_bpe_vocab_induction",
    (s, dir) => {
      val merged = train(s, dir).merges
      s.createDataFrame(merged)
        .select(col("merge_rank"), col("lhs"), col("rhs"), col("cnt"))
        .orderBy(col("merge_rank"))
    },
    Some {
      val union = (1 to Rounds).map(i => s"SELECT * FROM b$i")
        .mkString(" UNION ALL ")
      oracleChain + s"""
          SELECT merge_rank, l AS lhs, r AS rhs, cnt FROM ($union)
          ORDER BY merge_rank"""
    },
    bench = true)

  /** Tokenizer fertility per source: encode the corpus with the trained
    * merges and report tokens-per-word / chars-per-token — the metric a
    * tokenizer team reads to compare vocabularies across data sources.
    * Per-word token count is pure string arithmetic on the delimited
    * form (symbols = ␟␟-boundaries + 1); the corpus side is one
    * (source, word) hash-agg joined to the vocab-bounded encoding table
    * (broadcast — the table is true-vocabulary-sized at any corpus
    * scale, the same boundedness argument as q157's DSIR weight table).
    */
  val q167 = EngineQuery(
    "q167_bpe_encode_fertility",
    (s, dir) => {
      val enc = train(s, dir).vocab
        .select(col("word"), expr(
          "(length(s) - length(replace(s, concat(char(31), char(31)), '')))" +
            " div 2 + 1").as("n_toks"))
      val words = Tables(s, dir).documents
        .select(col("source"),
          explode(split(lower(col("text")), "[^a-z]+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("source"), col("word"))
        .agg(count(lit(1)).as("n"))
      words.join(broadcast(enc), Seq("word"))
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_words"),
          sum(col("n") * col("n_toks")).as("n_tokens"),
          sum(col("n") * length(col("word"))).as("n_chars"))
        .select(col("source"), col("n_words"), col("n_tokens"),
          col("n_chars"),
          (col("n_tokens").cast(DoubleType) /
            col("n_words").cast(DoubleType)).as("tokens_per_word"),
          (col("n_chars").cast(DoubleType) /
            col("n_tokens").cast(DoubleType)).as("chars_per_token"))
        .orderBy(col("source"))
    },
    Some {
      oracleChain + s""", enc AS MATERIALIZED (
          SELECT word,
            (length(s) - length(replace(s, chr(31) || chr(31), ''))) // 2
              + 1 AS n_toks
          FROM w$Rounds
        ), dw AS (
          SELECT source, word, COUNT(*) AS n FROM (
            SELECT source,
              unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
            FROM documents
          ) WHERE word <> '' GROUP BY 1, 2
        )
        SELECT d.source,
          CAST(SUM(d.n) AS BIGINT) AS n_words,
          CAST(SUM(d.n * e.n_toks) AS BIGINT) AS n_tokens,
          CAST(SUM(d.n * length(d.word)) AS BIGINT) AS n_chars,
          CAST(SUM(d.n * e.n_toks) AS DOUBLE)
            / CAST(SUM(d.n) AS DOUBLE) AS tokens_per_word,
          CAST(SUM(d.n * length(d.word)) AS DOUBLE)
            / CAST(SUM(d.n * e.n_toks) AS DOUBLE) AS chars_per_token
        FROM dw d JOIN enc e ON d.word = e.word
        GROUP BY d.source ORDER BY d.source"""
    })

  val all: Seq[EngineQuery] = Seq(q166, q167)
}
