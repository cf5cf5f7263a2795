package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.ops.{EngineQuery, Tables}
import PortableHash._

/** Text-analysis operators over `documents` (SURVEY.md §2.8 [ext]):
  * language-ID, quality scoring, token counting, fingerprinting. All
  * per-row (no shuffle) except the stopword counts, which are one
  * explode + groupBy(doc_id) — linear and partition-local at scale.
  */
object TextAnalysis {

  private val lexEn = Seq("the", "a", "of", "and", "to")
  private val lexEs = Seq("el", "la", "de", "que", "y")
  private val lexDe = Seq("der", "die", "das", "und", "ist")
  private val lexFr = Seq("le", "les", "et", "en", "une")

  private def inList(c: Column, words: Seq[String]): Column =
    sum(when(c.isin(words: _*), 1).otherwise(0))

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ",", ")")

  /** Language-ID by stopword-lexicon voting (n-gram heuristic family):
    * count lexicon hits per language, argmax with a fixed priority order.
    */
  val q60 = EngineQuery(
    "q60_text_langid",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = t.documents
        .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("w"))
      val scores = toks.groupBy(col("doc_id"), col("lang")).agg(
        inList(col("w"), lexEn).as("s_en"),
        inList(col("w"), lexEs).as("s_es"),
        inList(col("w"), lexDe).as("s_de"),
        inList(col("w"), lexFr).as("s_fr"))
      scores
        .withColumn("predicted",
          when(col("s_en") >= greatest(col("s_es"), col("s_de"), col("s_fr")), "en")
            .when(col("s_es") >= greatest(col("s_de"), col("s_fr")), "es")
            .when(col("s_de") >= col("s_fr"), "de")
            .otherwise("fr"))
        .select(col("doc_id"), col("s_en"), col("s_es"), col("s_de"),
          col("s_fr"), col("predicted"), col("lang").as("labeled"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH toks AS (
               SELECT doc_id, lang, UNNEST(string_split(trim(text), ' ')) w
               FROM documents
             ), scores AS (
               SELECT doc_id, lang,
                 CAST(SUM(CASE WHEN w IN ${sqlList(lexEn)} THEN 1 ELSE 0 END)
                   AS BIGINT) AS s_en,
                 CAST(SUM(CASE WHEN w IN ${sqlList(lexEs)} THEN 1 ELSE 0 END)
                   AS BIGINT) AS s_es,
                 CAST(SUM(CASE WHEN w IN ${sqlList(lexDe)} THEN 1 ELSE 0 END)
                   AS BIGINT) AS s_de,
                 CAST(SUM(CASE WHEN w IN ${sqlList(lexFr)} THEN 1 ELSE 0 END)
                   AS BIGINT) AS s_fr
               FROM toks GROUP BY doc_id, lang
             )
             SELECT doc_id, s_en, s_es, s_de, s_fr,
               CASE WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
                    WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
                    WHEN s_de >= s_fr THEN 'de'
                    ELSE 'fr' END AS predicted,
               lang AS labeled
             FROM scores ORDER BY doc_id"""))

  /** Quality scoring from surface statistics (length / punctuation /
    * casing / word-shape ratios). Pure per-row arithmetic — identical
    * doubles on both engines, no rounding needed.
    */
  val q61 = EngineQuery(
    "q61_text_quality",
    (s, dir) => {
      val t = Tables(s, dir)
      val txt = col("text")
      val nChars = length(txt)
      val nWords = TextStats.nWords(txt)
      val nLetters = length(trim(txt)) - TextStats.nSpaces(txt)
      val nUpper = nChars - length(regexp_replace(txt, "[A-Z]", ""))
      val punctRatio = TextStats.punctRatio(txt)
      val avgWordLen = when(nWords === 0, 0.0)
        .otherwise(nLetters.cast(DoubleType) / nWords)
      val score = least(lit(1.0), nWords.cast(DoubleType) / 100.0) *
        (lit(1.0) - punctRatio)
      t.documents
        .select(col("doc_id"), nChars.as("n_chars"), nWords.as("n_words"),
          nUpper.as("n_upper"), TextStats.nPunct(txt).as("n_punct"),
          avgWordLen.as("avg_word_len"), punctRatio.as("punct_ratio"),
          score.as("quality_score"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
              length(text) AS n_chars,
              CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE length(trim(text))
                        - length(regexp_replace(trim(text), ' ', '', 'g')) + 1
              END AS n_words,
              length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
                AS n_upper,
              length(text) - length(regexp_replace(text, '[.,!?]', '', 'g'))
                AS n_punct,
              CASE WHEN length(trim(text)) = 0 THEN 0.0
                   ELSE CAST(length(regexp_replace(trim(text), ' ', '', 'g'))
                        AS DOUBLE)
                        / (length(trim(text))
                           - length(regexp_replace(trim(text), ' ', '', 'g')) + 1)
              END AS avg_word_len,
              CASE WHEN length(text) = 0 THEN 0.0
                   ELSE CAST(length(text)
                        - length(regexp_replace(text, '[.,!?]', '', 'g'))
                        AS DOUBLE) / length(text)
              END AS punct_ratio,
              least(1.0, (CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE length(trim(text))
                        - length(regexp_replace(trim(text), ' ', '', 'g')) + 1
                   END) / 100.0)
              * (1.0 - CASE WHEN length(text) = 0 THEN 0.0
                   ELSE CAST(length(text)
                        - length(regexp_replace(text, '[.,!?]', '', 'g'))
                        AS DOUBLE) / length(text) END) AS quality_score
            FROM documents ORDER BY doc_id"""))

  /** Token counting: whitespace tokens (arithmetic — immune to split-edge
    * differences), BPE-ish regex token estimate, distinct token count.
    */
  val q62 = EngineQuery(
    "q62_text_token_count",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .select(col("doc_id"),
          TextStats.nWords(col("text")).as("n_ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).as("n_bpe_tokens"),
          size(array_distinct(tokens(col("text")))).as("n_distinct_tokens"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
              CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE length(trim(text))
                        - length(regexp_replace(trim(text), ' ', '', 'g')) + 1
              END AS n_ws_tokens,
              len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                AS n_bpe_tokens,
              len(list_distinct(string_split(trim(text), ' ')))
                AS n_distinct_tokens
            FROM documents ORDER BY doc_id"""))

  /** Document fingerprinting: md5 of normalized text + the portable
    * rolling hash (char-polynomial) — both content-addressable keys for
    * downstream exact dedup at scale.
    */
  val q63 = EngineQuery(
    "q63_text_fingerprint",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .select(col("doc_id"),
          TextStats.fingerprintMd5(col("text")).as("fp_md5"),
          graft.functions.CharPolyHash
            .charPolyHash(TextStats.normalized(col("text"))).as("fp_roll"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
              md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp_md5,
              CAST(list_sum(
                  [(ascii(regexp_replace(lower(trim(text)), ' +', ' ', 'g')[i])
                    * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                    % 1000000007
                  for i in range(1,
                    length(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))+1)])
                % 1000000007 AS BIGINT) AS fp_roll
            FROM documents ORDER BY doc_id"""))

  /** PII redaction — the curation stage every training-data pipeline
    * runs before packing: scrub emails and phone-shaped tokens with
    * typed placeholders, carry the redaction count for audit. Pure
    * per-row regexp projection: zero shuffle, scales linearly, and the
    * patterns are deliberately RE2-safe (character classes + bounded
    * quantifiers, no backtracking constructs) so Spark's Java regex and
    * DuckDB's RE2 agree token-for-token — asserted by the oracle. The
    * fixture documents carry no contact strings, so the gate input is
    * synthesized deterministically from customer rows (name-derived
    * email + key-derived phone), making redactions actually fire.
    */
  val q73 = EngineQuery(
    "q73_pii_redaction",
    (s, dir) => {
      val t = Tables(s, dir)
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\b555-[0-9]{4}\\b"
      val text = concat(col("c_name"), lit(" <"),
        regexp_replace(lower(col("c_name")), "#", "."),
        lit("@example.com> tel 555-"),
        lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
        lit(" segment "), col("c_mktsegment"))
      val redacted = regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"), phoneRe, "[PHONE]")
      t.customer.select(
        col("c_custkey"),
        redacted.as("redacted"),
        (length(text) - length(regexp_replace(text, emailRe, "")))
          .as("email_chars"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey,
              regexp_replace(
                regexp_replace(
                  c_name || ' <' || regexp_replace(lower(c_name), '#', '.')
                    || '@example.com> tel 555-'
                    || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                    || ' segment ' || c_mktsegment,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                  '[EMAIL]', 'g'),
                '\b555-[0-9]{4}\b', '[PHONE]', 'g') AS redacted,
              CAST(length(c_name || ' <'
                    || regexp_replace(lower(c_name), '#', '.')
                    || '@example.com> tel 555-'
                    || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                    || ' segment ' || c_mktsegment)
                - length(regexp_replace(
                    c_name || ' <' || regexp_replace(lower(c_name), '#', '.')
                      || '@example.com> tel 555-'
                      || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                      || ' segment ' || c_mktsegment,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                    '', 'g')) AS INT) AS email_chars
            FROM customer ORDER BY c_custkey"""))

  /** BM25-style full-text search (k1=1.2, b=0.75, rational idf) for a
    * fixed term query —
    * the retrieval scorer behind contamination checks and search-quality
    * evals over a training corpus. Plan shape at 100 TB: one corpus scan
    * explodes tokens into a (doc, term) hash-agg restricted to the query
    * terms (map-side filter, so the shuffle carries only matching rows);
    * document frequencies are a |terms|-row aggregate broadcast back;
    * scoring is pure per-row double math; top-k is
    * TakeOrderedAndProject — no global sort.
    *
    * Determinism: every double expression is written with identical
    * shape/order on both engines (per-row IEEE ops are exact); the
    * per-term scores are summed in a FIXED column order, never a
    * row-order-dependent SUM. The idf is the RATIONAL BM25 idf
    * (N - df + 0.5)/(df + 0.5) without the usual log: JVM Math.log and
    * DuckDB's libm ln disagree by 1 ulp on some inputs (observed:
    * ...696 vs ...698), and the gate hash-compares bits. Per-term
    * ranking is unchanged (log is monotone); multi-term totals weight
    * rare terms more sharply than log-BM25.
    */
  /** Query terms shared by q74 (BM25 ranking) and q79 (hybrid rerank). */
  private val bm25Terms = Seq("spark", "join", "window")

  /** BM25-scored documents for [[bm25Terms]] — (doc_id, score), unordered.
    * The shared retrieval stage of q74/q79; see q74 for the scale shape.
    */
  private def bm25Scored(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
      val t = Tables(s, dir)
      val terms = bm25Terms
      val toks = t.documents
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .filter(col("w").isin(terms: _*))
      val tf = toks.groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val stats = t.documents.agg(
        count(lit(1)).as("n_docs"),
        (sum(TextStats.nWords(col("text")).cast(LongType)).cast(DoubleType) /
          count(lit(1))).as("avgdl"))
      val dl = t.documents.select(col("doc_id"),
        TextStats.nWords(col("text")).cast(LongType).as("dl"))
      val scored = tf
        .join(broadcast(df), Seq("w"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          ((col("n_docs") - col("df")).cast(DoubleType) + lit(0.5)) /
            (col("df").cast(DoubleType) + lit(0.5)))
        .withColumn("tfn",
          (col("tf").cast(DoubleType) * lit(2.2)) /
            (col("tf").cast(DoubleType) + lit(1.2) *
              (lit(0.25) + lit(0.75) *
                (col("dl").cast(DoubleType) / col("avgdl")))))
        .withColumn("c", col("idf") * col("tfn"))
      // fixed-order sum of per-term contributions (never SUM over rows)
      val termAggs = terms.map(tm =>
        max(when(col("w") === tm, col("c"))).as(s"c_$tm"))
      val perTerm = scored.groupBy(col("doc_id"))
        .agg(termAggs.head, termAggs.tail: _*)
      perTerm
        .select(col("doc_id") +: terms.map(tm =>
          coalesce(col(s"c_$tm"), lit(0.0)).as(s"s_$tm")): _*)
        .withColumn("score",
          col("s_spark") + col("s_join") + col("s_window"))
        .select(col("doc_id"), col("score"))
  }

  /** Oracle CTE block ending in `bm25(doc_id, score)` — shared q74/q79. */
  private val bm25Ctes = bm25CtesOver("TRUE")

  /** q74's BM25 replay parameterized by a corpus predicate — q210
    * scores over `documents` minus the taken-down docs, with N/avgdl
    * from the remaining corpus (exactly what TextIndex.delete's
    * lockstep stats adjustment claims).
    */
  private def bm25CtesOver(pred: String): String = s"""WITH toks AS (
              SELECT doc_id, UNNEST(string_split(trim(text), ' ')) AS w
              FROM documents WHERE $pred
            ), tf AS (
              SELECT doc_id, w, COUNT(*) AS tf FROM toks
              WHERE w IN ('spark', 'join', 'window') GROUP BY doc_id, w
            ), df AS (
              SELECT w, COUNT(*) AS df FROM tf GROUP BY w
            ), stats AS (
              SELECT COUNT(*) AS n_docs,
                CAST(SUM(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE length(trim(text))
                       - length(regexp_replace(trim(text), ' ', '', 'g')) + 1
                  END AS BIGINT)) AS DOUBLE) / COUNT(*) AS avgdl
              FROM documents WHERE $pred
            ), dl AS (
              SELECT doc_id,
                CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE length(trim(text))
                       - length(regexp_replace(trim(text), ' ', '', 'g')) + 1
                  END AS BIGINT) AS dl
              FROM documents WHERE $pred
            ), scored AS (
              SELECT tf.doc_id, tf.w,
                ((CAST(s.n_docs - df.df AS DOUBLE) + 0.5)
                     / (CAST(df.df AS DOUBLE) + 0.5))
                * ((CAST(tf.tf AS DOUBLE) * 2.2)
                   / (CAST(tf.tf AS DOUBLE) + 1.2
                      * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / s.avgdl))))
                  AS c
              FROM tf JOIN df ON tf.w = df.w
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN stats s
            ), per_term AS (
              SELECT doc_id,
                MAX(CASE WHEN w = 'spark' THEN c END) AS c_spark,
                MAX(CASE WHEN w = 'join' THEN c END) AS c_join,
                MAX(CASE WHEN w = 'window' THEN c END) AS c_window
              FROM scored GROUP BY doc_id
            ), bm25 AS (
              SELECT doc_id,
                COALESCE(c_spark, 0.0) + COALESCE(c_join, 0.0)
                  + COALESCE(c_window, 0.0) AS score
              FROM per_term
            )"""

  val q74 = EngineQuery(
    "q74_bm25_search",
    (s, dir) => bm25Scored(s, dir)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(15),
    Some(bm25Ctes +
      """
         SELECT doc_id, score FROM bm25
         ORDER BY score DESC, doc_id LIMIT 15"""))

  /** The persisted text index built+maintained once per (session, dir):
    * postings of the even-id half (the "existing corpus"), odd half
    * APPENDED as the arriving delta — the `existingDedupIndex` pattern
    * applied to retrieval.
    *
    * READ-ONLY after this builder returns (the Similarity
    * `existingIvfIndex` contract): shared by q184/q218/q228/q232/q233,
    * and q233's audit oracle states its exact end state (generation 0,
    * healthy, zero garbage). Mutation experiments clone — the takedown
    * gate (q210) ingests its own store for exactly this reason.
    */
  private[llmops] def existingTextIndex(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val app = s.sparkContext.applicationId
    val tag = graft.ops.SessionScratch.dirTag(dir)
    val path =
      s"${graft.ops.SessionScratch.base("text_index", app)}/ti_$tag"
    graft.ops.SessionScratch.once("text_index", app, dir) {
      val docs = Tables(s, dir).documents
      TextIndex.build(docs.filter(col("doc_id") % 2 === 0), path)
      TextIndex.append(docs.filter(col("doc_id") % 2 === 1), path)
      // the documented contract above made mechanical — see
      // IndexMaintenance.markSharedReadonly
      IndexMaintenance.markSharedReadonly(s, path,
        "q184,q218,q228,q232,q233")
    }
    path
  }

  /** BM25 over the PERSISTED, INCREMENTALLY-MAINTAINED text index
    * (q74's operational form; the round-10 extension of the maintained-
    * index family to retrieval): the index is built on half the corpus
    * and the other half APPENDED — postings, exact-integer corpus
    * stats, df-from-postings — and the search answers off the stored
    * posting lists with the term filter pushed to the index scan. The
    * oracle is q74's full-corpus replay VERBATIM: after maintenance the
    * index must reproduce the from-scratch computation bit-exactly, so
    * a stale stats sidecar, a missed append, a double-counted posting,
    * or a df drifting from the postings all hash-mismatch.
    */
  val q184 = EngineQuery(
    "q184_bm25_persisted_index",
    (s, dir) => TextIndex.search(s, existingTextIndex(s, dir),
      bm25Terms, topk = 15),
    Some(bm25Ctes +
      """
         SELECT doc_id, score FROM bm25
         ORDER BY score DESC, doc_id LIMIT 15"""))

  /** A SEPARATE persisted text index for the takedown gate (deleting
    * from [[existingTextIndex]] would corrupt q184's view): full-corpus
    * build, then every doc_id divisible by 10 DELETED
    * ([[TextIndex.delete]] — tombstoned postings + lockstep stats
    * adjustment, no rewrite).
    */
  private def existingDeletedTextIndex(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val app = s.sparkContext.applicationId
    val tag = graft.ops.SessionScratch.dirTag(dir)
    val path =
      s"${graft.ops.SessionScratch.base("text_del_index", app)}/td_$tag"
    graft.ops.SessionScratch.once("text_del_index", app, dir) {
      val docs = Tables(s, dir).documents
      TextIndex.build(docs, path)
      TextIndex.delete(
        docs.filter(col("doc_id") % 10 === 0).select(col("doc_id")),
        path)
    }
    path
  }

  /** BM25 search after TAKEDOWNS — the retrieval side of the q208
    * delete contract, with the part IVF doesn't have: BM25's scores
    * depend on CORPUS-LEVEL state (N, avgdl, df), so a delete that
    * only masked rows would still score with the old statistics. The
    * oracle replays q74's BM25 over `documents` minus the deleted ids
    * — N and avgdl over the REMAINING corpus, df from the remaining
    * postings — so a stale stats sidecar, an unmasked df, or a
    * tombstone that missed the tf rows each hash-mismatch.
    */
  val q210 = EngineQuery(
    "q210_bm25_after_takedown",
    (s, dir) => TextIndex.search(s, existingDeletedTextIndex(s, dir),
      bm25Terms, topk = 15),
    Some(bm25CtesOver("doc_id % 10 <> 0") +
      """
         SELECT doc_id, score FROM bm25
         ORDER BY score DESC, doc_id LIMIT 15"""))

  /** Bigram language-model quality score (the deterministic analog of
    * CCNet-style perplexity filtering): score each document by the mean
    * CORPUS frequency of its word bigrams — documents full of word
    * sequences that occur nowhere else (mojibake, boilerplate noise,
    * wrong-language fragments) score low.
    *
    * Scale shape: bigram explode is a pure map stage; the "language
    * model" is one hash-agg over the int64 bigram hash (vocab²-bounded,
    * never corpus-bounded); scoring is a hash join on that 8-byte key +
    * one per-doc agg. All sums exact int64, division only at the
    * boundary — the score is bit-identical across engines.
    */
  val q76 = EngineQuery(
    "q76_bigram_lm_quality",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = t.documents
        .select(col("doc_id"), tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), tokenHashes(col("ws")).as("ths"))
      val bigrams = toks.select(col("doc_id"),
        explode(spanHashes(col("ths"), 2)).as("gh"))
      val lm = bigrams.groupBy(col("gh")).agg(count(lit(1)).as("freq"))
      bigrams.join(lm, Seq("gh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("freq")).as("sum_freq"))
        .select(col("doc_id"), col("n_bigrams"), col("sum_freq"),
          (col("sum_freq").cast(DoubleType) /
            col("n_bigrams").cast(DoubleType)).as("avg_freq"))
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
              FROM toks WHERE len(ws) >= 2
            ), g AS (
              SELECT doc_id,
                UNNEST([(${spanHashSql("ths", 2)})
                        for i in range(1, len(ths))]) AS gh
              FROM th
            ), lm AS (
              SELECT gh, COUNT(*) AS freq FROM g GROUP BY gh
            )
            SELECT g.doc_id,
              COUNT(*) AS n_bigrams,
              CAST(SUM(lm.freq) AS BIGINT) AS sum_freq,
              CAST(SUM(lm.freq) AS DOUBLE) / COUNT(*) AS avg_freq
            FROM g JOIN lm ON g.gh = lm.gh
            GROUP BY g.doc_id
            ORDER BY g.doc_id"""),
    bench = true)

  /** The persisted bigram-LM built+maintained once per (session, dir):
    * counts of the even-id half, odd half APPENDED as delta partials.
    */
  private def existingNgramIndex(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val app = s.sparkContext.applicationId
    val tag = graft.ops.SessionScratch.dirTag(dir)
    val path =
      s"${graft.ops.SessionScratch.base("ngram_index", app)}/ni_$tag"
    graft.ops.SessionScratch.once("ngram_index", app, dir) {
      val docs = Tables(s, dir).documents
      NgramIndex.build(docs.filter(col("doc_id") % 2 === 0), path)
      NgramIndex.append(docs.filter(col("doc_id") % 2 === 1), path)
    }
    path
  }

  /** Quality scoring over the PERSISTED, LOG-STRUCTURED bigram LM
    * (q76's operational form): the model is built on half the corpus
    * and the other half appended as PARTIAL count rows — the additive
    * LSM pattern, merged at read time and by compaction. The oracle is
    * q76's full-corpus replay VERBATIM: the maintained partials must
    * aggregate to exactly the from-scratch model, so a lost partial
    * file, a double append, or a merge bug all hash-mismatch.
    */
  val q186 = EngineQuery(
    "q186_ngram_lm_persisted",
    (s, dir) => NgramIndex.score(Tables(s, dir).documents,
      existingNgramIndex(s, dir)),
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
              FROM toks WHERE len(ws) >= 2
            ), g AS (
              SELECT doc_id,
                UNNEST([(${spanHashSql("ths", 2)})
                        for i in range(1, len(ths))]) AS gh
              FROM th
            ), lm AS (
              SELECT gh, COUNT(*) AS freq FROM g GROUP BY gh
            )
            SELECT g.doc_id,
              COUNT(*) AS n_bigrams,
              CAST(SUM(lm.freq) AS BIGINT) AS sum_freq,
              CAST(SUM(lm.freq) AS DOUBLE) / COUNT(*) AS avg_freq
            FROM g JOIN lm ON g.gh = lm.gh
            GROUP BY g.doc_id
            ORDER BY g.doc_id"""))

  /** Hybrid retrieval: BM25 keyword candidates re-ranked by embedding
    * cosine — the standard two-stage search a training-data pipeline
    * runs for contamination audits and eval-set curation. Stage 1
    * (q74's scorer) bounds the candidate set to top-20; stage 2 joins
    * just those 20 rows against the embedding store and re-ranks by
    * exact fixed-point cosine to the query vector (vec_id 0).
    *
    * Scale shape: the expensive semantic math runs on |candidates|
    * rows, never |corpus|; the candidate set broadcasts into the
    * embedding join; the query vector is a 1-row broadcast.
    */
  val q79 = EngineQuery(
    "q79_hybrid_search",
    (s, dir) => {
      val t = Tables(s, dir)
      val cand = bm25Scored(s, dir)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
        .withColumnRenamed("score", "bm25")
      val qv = broadcast(t.embeddings.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe")))
      broadcast(cand)
        .join(t.embeddings, col("doc_id") === col("vec_id"))
        .crossJoin(qv)
        .select(col("doc_id"), col("bm25"),
          exactDot(col("embedding"), col("qe")).as("cos"))
        .orderBy(col("cos").desc, col("doc_id"))
        .limit(10)
    },
    Some(bm25Ctes +
      """
         , cand AS (
             SELECT doc_id, score AS bm25 FROM bm25
             ORDER BY score DESC, doc_id LIMIT 20
           ), ex AS (
             SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) v,
               generate_subscripts(embedding, 1) pos
             FROM embeddings
           ), qv AS (SELECT * FROM ex WHERE vec_id = 0),
           dots AS (
             SELECT c.vec_id AS doc_id,
               CAST(SUM(CAST(FLOOR(q.v*10000000.0) AS BIGINT)
                      * CAST(FLOOR(c.v*10000000.0) AS BIGINT)) AS DOUBLE)
                 / 100000000000000.0 AS cos
             FROM ex c
             JOIN qv q ON c.pos = q.pos
             JOIN cand ON cand.doc_id = c.vec_id
             GROUP BY c.vec_id
           )
           SELECT d.doc_id, cand.bm25, d.cos
           FROM dots d JOIN cand ON cand.doc_id = d.doc_id
           ORDER BY d.cos DESC, d.doc_id LIMIT 10"""))

  /** Repetition quality signals (the Gopher-rules family): per-document
    * repeated-token fraction, top-token share, and top-bigram share —
    * the cheap statistical filters that catch keyword-stuffed/looping
    * machine text before any model-based scoring.
    *
    * Scale shape: token stats ride one (doc, token) hash-agg; the
    * bigram share reuses the q76 span-hash machinery (int64 keys, one
    * (doc, bigram) hash-agg). Both aggregations are map-side combined;
    * everything else is per-row arithmetic. Ratios are exact-int
    * divisions taken in doubles at the boundary.
    */
  val q58 = EngineQuery(
    "q58_repetition_signals",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = t.documents
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      val tokStats = toks.groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          max(col("c")).as("top_tok"))
      val bg = t.documents
        .select(col("doc_id"), tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"),
          explode(spanHashes(tokenHashes(col("ws")), 2)).as("gh"))
      val bgTop = bg.groupBy(col("doc_id"), col("gh"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_bg"), sum(col("c")).as("n_bg"))
      tokStats.join(bgTop, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          (lit(1.0) - col("n_distinct").cast(DoubleType) /
            col("n_tokens").cast(DoubleType)).as("repeat_frac"),
          (col("top_tok").cast(DoubleType) /
            col("n_tokens").cast(DoubleType)).as("top_token_share"),
          (coalesce(col("top_bg"), lit(0L)).cast(DoubleType) /
            coalesce(col("n_bg"), lit(1L)).cast(DoubleType))
            .as("top_bigram_share"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, UNNEST(string_split(trim(text), ' ')) w
              FROM documents
            ), tc AS (
              SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY 1, 2
            ), ts AS (
              SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                COUNT(*) AS n_distinct, MAX(c) AS top_tok
              FROM tc GROUP BY doc_id
            ), tw AS (
              SELECT doc_id, string_split(trim(text), ' ') ws
              FROM documents
            ), th AS (
              SELECT doc_id,
                [coalesce(list_sum([(ascii(w[i])
                    * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                    % 1000000007
                    for i in range(1, length(w)+1)]) % 1000000007, 0)
                 for w in ws] AS ths
              FROM tw WHERE len(ws) >= 2
            ), g AS (
              SELECT doc_id,
                UNNEST([(${spanHashSql("ths", 2)})
                        for i in range(1, len(ths))]) AS gh
              FROM th
            ), bc AS (
              SELECT doc_id, gh, COUNT(*) AS c FROM g GROUP BY 1, 2
            ), bs AS (
              SELECT doc_id, MAX(c) AS top_bg,
                CAST(SUM(c) AS BIGINT) AS n_bg
              FROM bc GROUP BY doc_id
            )
            SELECT ts.doc_id, ts.n_tokens, ts.n_distinct,
              1.0 - CAST(ts.n_distinct AS DOUBLE)
                  / CAST(ts.n_tokens AS DOUBLE) AS repeat_frac,
              CAST(ts.top_tok AS DOUBLE) / CAST(ts.n_tokens AS DOUBLE)
                AS top_token_share,
              CAST(COALESCE(bs.top_bg, 0) AS DOUBLE)
                / CAST(COALESCE(bs.n_bg, 1) AS DOUBLE) AS top_bigram_share
            FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
            ORDER BY ts.doc_id"""))

  /** Per-source n-gram diversity (the corpus-level distinct-n metric —
    * the deterministic analog of Self-BLEU diversity auditing): for each
    * source, the fraction of its trigram OCCURRENCES that are distinct
    * trigram TYPES. Template farms, boilerplate mirrors, and
    * low-diversity machine generation collapse this ratio corpus-wide
    * even when each individual document looks fine to the per-doc
    * repetition rules (q58 is within-doc; this is ACROSS docs of one
    * source).
    *
    * Scale shape: trigram explode is a pure map stage over the scan;
    * type counting is one map-side-combined (source, gh) hash-agg
    * followed by a |sources|-bounded rollup — no distinct over the raw
    * explode (countDistinct would carry every occurrence into the
    * shuffle; pre-aggregating to types first shuffles each (source,
    * trigram) key once). All counts exact int64; the ratio is one IEEE
    * division at the boundary.
    */
  val q160 = EngineQuery(
    "q160_source_ngram_diversity",
    (s, dir) => {
      val t = Tables(s, dir)
      val tri = t.documents
        .select(col("source"), tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("source"), tokenHashes(col("ws")).as("ths"))
        .select(col("source"),
          explode(spanHashes(col("ths"), 3)).as("gh"))
      tri.groupBy(col("source"), col("gh"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_trigrams"),
          count(lit(1)).as("n_types"))
        .select(col("source"), col("n_trigrams"), col("n_types"),
          (col("n_types").cast(DoubleType) /
            col("n_trigrams").cast(DoubleType)).as("diversity"))
        .orderBy(col("source"))
    },
    Some(s"""WITH tw AS (
              SELECT source, string_split(trim(text), ' ') ws
              FROM documents
            ), th AS (
              SELECT source,
                [coalesce(list_sum([(ascii(w[i])
                    * (((i*i % 1000000007)*2654435761 + i*97) % 1000000007))
                    % 1000000007
                    for i in range(1, length(w)+1)]) % 1000000007, 0)
                 for w in ws] AS ths
              FROM tw WHERE len(ws) >= 3
            ), g AS (
              SELECT source,
                UNNEST([(${spanHashSql("ths", 3)})
                        for i in range(1, len(ths)-1)]) AS gh
              FROM th
            ), tc AS (
              SELECT source, gh, COUNT(*) AS c FROM g GROUP BY 1, 2
            )
            SELECT source, CAST(SUM(c) AS BIGINT) AS n_trigrams,
              COUNT(*) AS n_types,
              CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                AS diversity
            FROM tc GROUP BY source
            ORDER BY source"""))

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the OTHER standard
    * hybrid-retrieval combiner next to q79's cascade: instead of
    * re-ranking BM25 candidates by cosine (which can only ever return
    * docs the keyword stage found), RRF fuses the two systems' top-20
    * lists symmetrically — rrf(d) = Σ_sys 1/(60 + rank_sys(d)) — so a
    * doc either system ranks highly can win. Scores are exact
    * integers (1e12 div (60+rank)), so the fused ranking hash-gates.
    *
    * Scale shape: each arm ends in a TakeOrdered top-20 (never a
    * global window over the corpus); the rank windows run over the
    * 20-row lists; the fusion is a full-outer join of two 20-row
    * frames. The cosine arm's scan is |corpus|·1-query broadcast dots
    * — q50's exact-baseline shape.
    */
  val q218 = EngineQuery(
    "q218_rrf_fusion",
    (s, dir) => {
      val t = Tables(s, dir)
      val wb = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))
      val rb = bm25Scored(s, dir)
        .orderBy(col("score").desc, col("doc_id")).limit(20)
        .withColumn("rb", row_number().over(wb))
        .select(col("doc_id"), col("rb"))
      val qv = broadcast(t.embeddings.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe")))
      val wc = org.apache.spark.sql.expressions.Window
        .orderBy(col("cos").desc, col("doc_id"))
      val rc = t.embeddings.filter(col("vec_id") =!= 0)
        .crossJoin(qv)
        .select(col("vec_id").as("doc_id"),
          exactDot(col("embedding"), col("qe")).as("cos"))
        .orderBy(col("cos").desc, col("doc_id")).limit(20)
        .withColumn("rc", row_number().over(wc))
        .select(col("doc_id"), col("rc"))
      rb.join(rc, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("rb"), lit(0)).cast(LongType).as("bm25_rank"),
          coalesce(col("rc"), lit(0)).cast(LongType).as("cos_rank"),
          (coalesce(expr("1000000000000 div (60 + rb)"), lit(0L))
            + coalesce(expr("1000000000000 div (60 + rc)"), lit(0L)))
            .as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },
    Some(bm25Ctes +
      """
         , rb AS (
             SELECT doc_id, r AS rb FROM (
               SELECT doc_id, row_number() OVER (
                 ORDER BY score DESC, doc_id) r FROM bm25) x
             WHERE r <= 20
           ), ex AS (
             SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) v,
               generate_subscripts(embedding, 1) pos
             FROM embeddings
           ), qv AS (SELECT * FROM ex WHERE vec_id = 0),
           dots AS (
             SELECT c.vec_id AS doc_id,
               CAST(SUM(CAST(FLOOR(q.v*10000000.0) AS BIGINT)
                      * CAST(FLOOR(c.v*10000000.0) AS BIGINT)) AS DOUBLE)
                 / 100000000000000.0 AS cos
             FROM ex c JOIN qv q ON c.pos = q.pos
             WHERE c.vec_id != 0
             GROUP BY c.vec_id
           ), rc AS (
             SELECT doc_id, r AS rc FROM (
               SELECT doc_id, row_number() OVER (
                 ORDER BY cos DESC, doc_id) r FROM dots) x
             WHERE r <= 20
           )
           SELECT COALESCE(rb.doc_id, rc.doc_id) AS doc_id,
             CAST(COALESCE(rb.rb, 0) AS BIGINT) AS bm25_rank,
             CAST(COALESCE(rc.rc, 0) AS BIGINT) AS cos_rank,
             CAST(COALESCE(1000000000000 // (60 + rb.rb), 0)
               + COALESCE(1000000000000 // (60 + rc.rc), 0) AS BIGINT)
               AS rrf
           FROM rb FULL OUTER JOIN rc ON rb.doc_id = rc.doc_id
           ORDER BY rrf DESC, doc_id LIMIT 10"""))

  /** RRF over the PERSISTED stores — q218's fusion read operationally:
    * the keyword arm answers off the maintained BM25 postings index
    * (q184's store, term filter pushed to the index scan) and the
    * semantic arm off the maintained IVF index (q180's store,
    * probe-bounded candidates) — the production hybrid-serving shape,
    * where neither arm re-tokenizes nor re-scans the corpus at query
    * time. Ranks fuse by the same exact-integer 1e12 div (60+rank)
    * rule. With q202 (cross-store refine) this is the second
    * cross-store read-path composition: two independently MAINTAINED
    * artifacts must agree with their from-scratch twins for the fused
    * ranking to hash-match.
    *
    * The semantic arm is the INDEX's ranking (top-2 probed cells), so
    * the oracle replays the even-half training + probe for query
    * vector 0 — a stale append or drifted centroid shifts a fused
    * rank and mismatches.
    */
  val q228 = EngineQuery(
    "q228_rrf_persisted",
    (s, dir) => {
      val t = Tables(s, dir)
      val wb = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))
      val rb = TextIndex.search(s, existingTextIndex(s, dir),
        bm25Terms, topk = 20)
        .withColumn("rb", row_number().over(wb))
        .select(col("doc_id"), col("rb"))
      val qv = t.embeddings.filter(col("vec_id") === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("eq"))
      val rc = IvfIndex.search(qv,
        Similarity.existingIvfIndex(s, dir), topk = 20)
        .select(col("cid").as("doc_id"), col("rn").as("rc"))
      rb.join(rc, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("rb"), lit(0)).cast(LongType).as("bm25_rank"),
          coalesce(col("rc"), lit(0)).cast(LongType).as("cos_rank"),
          (coalesce(expr("1000000000000 div (60 + rb)"), lit(0L))
            + coalesce(expr("1000000000000 div (60 + rc)"), lit(0L)))
            .as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },
    Some(Similarity.kmeansTrainCtes(4, "vec_id % 2 = 0") +
      """, probes AS (
           SELECT qid, cell FROM (
             SELECT vec_id AS qid, cell, row_number() OVER (
               PARTITION BY vec_id ORDER BY fdot DESC, cell) crn
             FROM d3 WHERE vec_id = 0) x
           WHERE crn <= 2
         ), icand AS (
           SELECT p.qid, a.vec_id AS member_id FROM probes p
           JOIN a3 a ON a.cell = p.cell AND a.vec_id != p.qid
         ), idots AS (
           SELECT c.qid, c.member_id,
             CAST(SUM(CAST(FLOOR(q.v*10000000.0) AS BIGINT)
                    * CAST(FLOOR(m.v*10000000.0) AS BIGINT)) AS DOUBLE)
               / 100000000000000.0 AS sim
           FROM icand c
           JOIN ex q ON q.vec_id = c.qid
           JOIN ex m ON m.vec_id = c.member_id AND m.pos = q.pos
           GROUP BY 1, 2
         ), rc AS (
           SELECT member_id AS doc_id, rn AS rc FROM (
             SELECT *, row_number() OVER (PARTITION BY qid
               ORDER BY sim DESC, member_id) rn FROM idots) x
           WHERE rn <= 20
         ), """ + bm25Ctes.stripPrefix("WITH ") +
      """
         , rb AS (
             SELECT doc_id, r AS rb FROM (
               SELECT doc_id, row_number() OVER (
                 ORDER BY score DESC, doc_id) r FROM bm25) x
             WHERE r <= 20
           )
           SELECT COALESCE(rb.doc_id, rc.doc_id) AS doc_id,
             CAST(COALESCE(rb.rb, 0) AS BIGINT) AS bm25_rank,
             CAST(COALESCE(rc.rc, 0) AS BIGINT) AS cos_rank,
             CAST(COALESCE(1000000000000 // (60 + rb.rb), 0)
               + COALESCE(1000000000000 // (60 + rc.rc), 0) AS BIGINT)
               AS rrf
           FROM rb FULL OUTER JOIN rc ON rb.doc_id = rc.doc_id
           ORDER BY rrf DESC, doc_id LIMIT 10"""))

  /** THREE-system RRF over the persisted stores — q228 extended with
    * the third maintained read path (round-12 verdict #7): the keyword
    * arm off the BM25 postings index (q184's store), the cell-probed
    * semantic arm off the IVF index (q180's store), and the walked
    * semantic arm off the kNN-graph index (q199's store) fuse their
    * top-20 lists by the same exact-integer 1e12 div (60+rank) rule —
    * the serving layer is now family-complete: every maintained
    * retrieval artifact feeds one fused ranking, and all three must
    * agree with their from-scratch twins for the hash to match.
    *
    * Scale shape: each arm is its own store's proven probe-bounded
    * read (postings term fetch / |cell|·nprobe candidates /
    * |queries|·beam·degree walk); the fusion is two full-outer joins
    * of ≤20-row frames. Nothing re-tokenizes or re-scans the corpus.
    */
  val q232 = EngineQuery(
    "q232_rrf_three_system",
    (s, dir) => {
      val t = Tables(s, dir)
      val wb = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))
      val rb = TextIndex.search(s, existingTextIndex(s, dir),
        bm25Terms, topk = 20)
        .withColumn("rb", row_number().over(wb))
        .select(col("doc_id"), col("rb"))
      val qv = t.embeddings.filter(col("vec_id") === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("eq"))
      val rc = IvfIndex.search(qv,
        Similarity.existingIvfIndex(s, dir), topk = 20)
        .select(col("cid").as("doc_id"), col("rn").as("rc"))
      val rg = GraphIndex.search(qv,
        Similarity.existingGraphIndex(s, dir), topk = 20)
        .select(col("cid").as("doc_id"), col("rn").as("rg"))
      rb.join(rc, Seq("doc_id"), "full_outer")
        .join(rg, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("rb"), lit(0)).cast(LongType).as("bm25_rank"),
          coalesce(col("rc"), lit(0)).cast(LongType).as("cos_rank"),
          coalesce(col("rg"), lit(0)).cast(LongType).as("graph_rank"),
          (coalesce(expr("1000000000000 div (60 + rb)"), lit(0L))
            + coalesce(expr("1000000000000 div (60 + rc)"), lit(0L))
            + coalesce(expr("1000000000000 div (60 + rg)"), lit(0L)))
            .as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },
    Some(Similarity.kmeansTrainCtes(4, "vec_id % 2 = 0") +
      Similarity.evenOddGraphCtes +
      Similarity.beamWalkCtes("vec_id = 0") +
      """, rg AS (
           SELECT cid AS doc_id, rn AS rg FROM (
             SELECT qid, cid, row_number() OVER (PARTITION BY qid
               ORDER BY sim DESC, cid) rn FROM s2) x
           WHERE rn <= 20
         ), probes AS (
           SELECT qid, cell FROM (
             SELECT vec_id AS qid, cell, row_number() OVER (
               PARTITION BY vec_id ORDER BY fdot DESC, cell) crn
             FROM d3 WHERE vec_id = 0) x
           WHERE crn <= 2
         ), icand AS (
           SELECT p.qid, a.vec_id AS member_id FROM probes p
           JOIN a3 a ON a.cell = p.cell AND a.vec_id != p.qid
         ), idots AS (
           SELECT c.qid, c.member_id,
             CAST(SUM(CAST(FLOOR(q.v*10000000.0) AS BIGINT)
                    * CAST(FLOOR(m.v*10000000.0) AS BIGINT)) AS DOUBLE)
               / 100000000000000.0 AS sim
           FROM icand c
           JOIN ex q ON q.vec_id = c.qid
           JOIN ex m ON m.vec_id = c.member_id AND m.pos = q.pos
           GROUP BY 1, 2
         ), rc AS (
           SELECT member_id AS doc_id, rn AS rc FROM (
             SELECT *, row_number() OVER (PARTITION BY qid
               ORDER BY sim DESC, member_id) rn FROM idots) x
           WHERE rn <= 20
         ), """ + bm25Ctes.stripPrefix("WITH ") +
      """
         , rb AS (
             SELECT doc_id, r AS rb FROM (
               SELECT doc_id, row_number() OVER (
                 ORDER BY score DESC, doc_id) r FROM bm25) x
             WHERE r <= 20
           )
           SELECT COALESCE(rb.doc_id, rc.doc_id, rg.doc_id) AS doc_id,
             CAST(COALESCE(rb.rb, 0) AS BIGINT) AS bm25_rank,
             CAST(COALESCE(rc.rc, 0) AS BIGINT) AS cos_rank,
             CAST(COALESCE(rg.rg, 0) AS BIGINT) AS graph_rank,
             CAST(COALESCE(1000000000000 // (60 + rb.rb), 0)
               + COALESCE(1000000000000 // (60 + rc.rc), 0)
               + COALESCE(1000000000000 // (60 + rg.rg), 0) AS BIGINT)
               AS rrf
           FROM rb
           FULL OUTER JOIN rc ON rb.doc_id = rc.doc_id
           FULL OUTER JOIN rg
             ON COALESCE(rb.doc_id, rc.doc_id) = rg.doc_id
           ORDER BY rrf DESC, doc_id LIMIT 10"""))

  val all: Seq[EngineQuery] =
    Seq(q58, q60, q61, q62, q63, q73, q74, q76, q79, q160, q184, q186,
      q210, q218, q228, q232)
}
