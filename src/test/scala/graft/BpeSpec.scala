package graft

import org.apache.spark.sql.functions._

import graft.llmops.Bpe
import graft.ops.Tables

/** BPE vocabulary induction (q166/q167): the merge table on a known
  * corpus must match a hand-computed BPE run, the greedy replace step
  * must resolve overlapping candidates left-first, and the corpus-level
  * fertility metrics must respect the arithmetic identities that hold
  * for any merge table.
  */
class BpeSpec extends SparkTestBase {

  private def tokensOf(s: String): Seq[String] =
    s.stripPrefix(Bpe.Sep).stripSuffix(Bpe.Sep).split(Bpe.Sep + Bpe.Sep).toSeq

  test("merge table matches a hand-computed BPE on the classic corpus") {
    import spark.implicits._
    // Sennrich et al.'s worked example: low×5, lower×2, newest×6,
    // widest×3 (with EOW '_'). Hand-derived, count desc then (l, r) asc:
    //   round 1: (e,s)=9  ties (s,t)=9 (t,_)=9 broken by left symbol
    //   round 2: (es,t)=9 ties (t,_)=9
    //   round 3: (est,_)=9
    //   round 4: (l,o)=7  ties (o,w)=7
    //   round 5: (lo,w)=7
    //   round 6: (e,w)=6  ties (n,e)=6 (w,est_)=6
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("word", "freq")
    val got = Bpe.trainOn(words, 6).merges
      .map(m => (m.lhs, m.rhs, m.cnt))
    val expected = Seq(("e", "s", 9L), ("es", "t", 9L), ("est", "_", 9L),
      ("l", "o", 7L), ("lo", "w", 7L), ("e", "w", 6L))
    assert(got == expected)
  }

  test("merge application is greedy left-first on overlapping runs") {
    import spark.implicits._
    // 'aaaa' under the merge (a,a): greedy left-to-right pairs up as
    // (aa)(aa); 'aaa' as (aa)a — never a(aa). One training round on a
    // corpus whose only pair is (a,a) exercises exactly that replace.
    val tr = Bpe.trainOn(Seq(("aaaa", 2L), ("aaa", 1L)).toDF("word", "freq"),
      rounds = 1)
    assert(tr.merges.map(m => (m.lhs, m.rhs, m.cnt)) == Seq(("a", "a", 8L)))
    val enc = tr.vocab.select(col("word"), col("s")).collect()
      .map(r => r.getString(0) -> tokensOf(r.getString(1))).toMap
    assert(enc("aaaa") == Seq("aa", "aa", "_"))
    assert(enc("aaa") == Seq("aa", "a", "_"))
  }

  test("q166: chosen pair counts are non-increasing across rounds") {
    // merging the argmax pair can only shrink or preserve every other
    // pair's count, and pairs it creates are bounded by its own count —
    // so the training-order count column must be non-increasing
    val rows = graft.llmops.Bpe.q166.run(spark, sfDir).collect()
    assert(rows.length == Bpe.Rounds)
    val cnts = rows.map(_.getLong(3))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      s"counts increased across rounds: ${cnts.mkString(",")}")
    // merged symbols are concatenations of corpus letters + EOW
    // (\p{L} — segmentation is Unicode-aware)
    rows.foreach { r =>
      assert((r.getString(1) + r.getString(2)).matches("[\\p{L}_]+"))
    }
  }

  test("q167: fertility identities hold against the raw corpus") {
    val out = graft.llmops.Bpe.q167.run(spark, sfDir).collect()
    assert(out.nonEmpty)
    // independent per-source word/char totals from the raw corpus
    val raw = Tables(spark, sfDir).documents
      .select(col("source"),
        explode(split(lower(col("text")), Bpe.WordSplitRe)).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("nw"), sum(length(col("word"))).as("nc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    out.foreach { r =>
      val (src, nWords, nTokens, nChars) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert((nWords, nChars) == raw(src), s"$src word/char totals drifted")
      // every word is ≥1 token and ≤ chars+1 tokens (unmerged worst case)
      assert(nTokens >= nWords && nTokens <= nChars + nWords)
      assert(r.getDouble(4) == nTokens.toDouble / nWords.toDouble)
      assert(r.getDouble(5) == nChars.toDouble / nTokens.toDouble)
    }
  }

  test("q166/q167 share one memoized training run per (app, dir)") {
    val t1 = Bpe.train(spark, sfDir)
    val t2 = Bpe.train(spark, sfDir)
    assert(t1 eq t2)
  }

  test("unicode segmentation: non-Latin documents contribute words") {
    import spark.implicits._
    // planted multilingual docs — under the old [^a-z]+ split the
    // non-Latin rows produced ZERO words (silent corpus loss)
    val docs = Seq("Füße größer 3kg", "한국어 텍스트 corpus",
      "Ёлка и ёжик", "plain ascii text").toDF("text")
    val wf = Bpe.wordFreqOf(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wf.contains("füße") && wf.contains("größer"))
    assert(wf.contains("한국어") && wf.contains("텍스트"))
    assert(wf.contains("ёлка") && wf.contains("ёжик"))
    assert(wf.contains("plain") && wf("corpus") == 1L)
    // digits/punct are separators, never symbols
    assert(!wf.keys.exists(_.exists(c => !c.isLetter)))
  }

  /** Reference merge application: the same leftmost, non-overlapping,
    * continue-after-replacement semantics as `replace` in both engines
    * (java.lang.String.replace matches it exactly).
    */
  private def handApply(word: String, merges: Seq[Bpe.Merge]): Seq[String] = {
    val sep = Bpe.Sep
    val init = sep + word.flatMap(c => c.toString + sep + sep) +
      Bpe.Eow + sep
    val fin = merges.sortBy(_.merge_rank).foldLeft(init) { (s, m) =>
      s.replace(sep + m.lhs + sep + sep + m.rhs + sep,
        sep + m.lhs + m.rhs + sep)
    }
    fin.stripPrefix(sep).stripSuffix(sep).split(sep + sep).toSeq
  }

  test("encodeWord on an UNSEEN word equals hand-applied merges") {
    import spark.implicits._
    val tr = Bpe.trainOn(Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("word", "freq"), 6)
    // none of these words were in the training corpus; 'slowest'
    // exercises est_/lo merges inside a novel word, 'xyz' no merges at
    // all, 'newlow' two merge families adjacent
    val unseen = Seq("slowest", "xyz", "newlow", "lowestlow")
    val got = unseen.toDF("word")
      .select(col("word"), Bpe.encodeWord(col("word"), tr.merges).as("s"))
      .collect().map(r => r.getString(0) -> tokensOf(r.getString(1))).toMap
    unseen.foreach { w =>
      assert(got(w) == handApply(w, tr.merges),
        s"'$w': ${got(w)} != ${handApply(w, tr.merges)}")
    }
    assert(got("xyz") == Seq("x", "y", "z", "_"))
  }

  test("encodeWord reproduces the trained encoding on every seen word") {
    import spark.implicits._
    // merge application composes the same replaces training applied, so
    // on the training vocabulary the two paths must agree exactly
    val tr = Bpe.trainOn(Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("word", "freq"), 6)
    val diff = tr.vocab
      .select(col("word"), col("s"),
        Bpe.encodeWord(col("word"), tr.merges).as("s2"))
      .filter(col("s") =!= col("s2"))
      .count()
    assert(diff == 0L)
  }

  test("q167 encode path: chained-replace equals the trained vocab on " +
    "the full fixture corpus, and the gate plans zero joins") {
    // the proof the q167 rewire rests on: for every word the training
    // saw, applying the merges in rank order reproduces the trained
    // symbol sequence exactly — so replacing the old vocab inner join
    // with encodeWord cannot change a single gate value, while removing
    // the OOV-dropout bug class (an unseen word now encodes instead of
    // silently vanishing from the fertility denominator)
    val tr = Bpe.train(spark, sfDir)
    val diff = tr.vocab
      .select(col("word"), col("s"),
        Bpe.encodeWord(col("word"), tr.merges).as("s2"))
      .filter(col("s") =!= col("s2"))
      .count()
    assert(diff == 0L, "encodeWord diverged from the trained vocabulary")
    // and the encode really is a pure projection now — no join anywhere
    val plan = Bpe.q167.run(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Join"), s"q167 should be join-free:\n$plan")
  }

  test("q173: held-out fertility covers only non-train sources") {
    val rows = Bpe.q173.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val splits = rows.map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("val", "test")), s"got splits $splits")
    // held-out sources are disjoint from the train split by the q172
    // rule; every fertility is at least 1 token per word
    rows.foreach { r =>
      assert(r.getLong(2) > 0L)
      assert(r.getLong(3) >= r.getLong(2))
      assert(r.getLong(4) >= 0L && r.getLong(4) <= r.getLong(2))
      assert(r.getDouble(5) >= 1.0)
    }
  }
}
