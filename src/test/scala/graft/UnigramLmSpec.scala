package graft

import org.apache.spark.sql.functions._

import graft.llmops.UnigramLm

/** Unigram-LM tokenizer induction (q174): the hard-EM rounds on a
  * hand-computable corpus must match the worked derivation, every
  * Viterbi segmentation must exactly cover its word, and the gate
  * output must respect the vocabulary invariants.
  */
class UnigramLmSpec extends SparkTestBase {

  test("hard-EM on a hand-computed corpus matches the derivation") {
    import spark.implicits._
    // corpus {abab×3, ab×2}. Seed counts: a=8, b=8, ab=8, ba=3, aba=3,
    // bab=3, abab=3. Round 1: both words segment as ONE piece
    // (fewest-pieces objective; 'abab' ∈ vocab at len 4) → counts
    // abab=3, ab=2; multi-char pieces ba/aba/bab are pruned, singles
    // persist at 0. Round 2 reproduces the same segmentations.
    val words = Seq(("abab", 3L), ("ab", 2L)).toDF("word", "freq")
    val got = UnigramLm.trainOn(words)
      .orderBy(col("cnt").desc, col("piece"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("abab", 3L), ("ab", 2L), ("a", 0L), ("b", 0L)))
  }

  test("fewest-pieces ties break toward the earliest split point") {
    import spark.implicits._
    // corpus {abcde×1}: every substring seeds with count 1, so ALL
    // four 2-piece segmentations of the 5-char word tie on (pieces=2,
    // sum=2). The packed candidate encoding (score·32 + i, minimized)
    // makes the DP pick the SMALLEST split point at the final cell:
    // hand-derived dp gives a5 = 1, so the backtrack emits
    // ['bcde', 'a'] (back-to-front) — any other tie order would be an
    // engine-dependent hash mismatch waiting to happen.
    val words = Seq(("abcde", 1L)).toDF("word", "freq")
    val seg = UnigramLm.viterbiSegment(words,
        UnigramLm.seedVocab(words))
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(seg("abcde") == Seq("bcde", "a"))
  }

  test("every fixture word is exactly covered by its segmentation") {
    val words = UnigramLm.cappedWords(
      graft.ops.Tables(spark, sfDir).documents)
    val v = UnigramLm.seedVocab(words)
    val bad = UnigramLm.viterbiSegment(words, v)
      .filter(array_join(reverse(col("pieces")), "") =!= col("word"))
      .count()
    assert(bad == 0L, s"$bad words not exactly covered")
  }

  test("held-out words outside the vocab's coverage surface as UNK") {
    import spark.implicits._
    // vocab trained on 'abc' only: 'xyz' shares NO substring with the
    // vocab (absent from the DP entirely -> np NULL after the left
    // join), 'axz' shares only 'a' so the DP cannot complete (pieces
    // = [] -> np 0). Both must read as one <unk> token in q175's
    // accounting rather than dropping out of the denominator.
    val v = UnigramLm.trainOn(Seq(("abc", 5L)).toDF("word", "freq"))
    val seg = UnigramLm.viterbiSegment(
        Seq(("xyz", 1L), ("axz", 1L), ("abc", 1L)).toDF("word", "freq"), v)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(!seg.contains("xyz"))
    assert(seg("axz").isEmpty)
    assert(seg("abc").nonEmpty &&
      seg("abc").reverse.mkString("") == "abc")
  }

  test("q175: held-out fertility covers only non-train sources") {
    val rows = UnigramLm.q175.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("val", "test")))
    rows.foreach { r =>
      val (nw, nt, nu) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nw > 0 && nt >= nw && nu >= 0 && nu <= nw)
      assert(r.getDouble(5) >= 1.0)
    }
  }

  test("q174: output invariants hold") {
    val rows = UnigramLm.q174.run(spark, sfDir).collect()
    assert(rows.length == UnigramLm.TopOut)
    val cnts = rows.map(_.getLong(1))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val (piece, cnt, len) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(len == piece.length && len >= 1 && len <= UnigramLm.MaxPiece)
      // pruning: multi-char pieces survive only through USAGE
      assert(len == 1 || cnt > 0, s"unused multi-char piece '$piece'")
    }
  }
}
