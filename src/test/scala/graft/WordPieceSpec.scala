package graft

import org.apache.spark.sql.functions._

import graft.llmops.{Bpe, WordPiece}

/** WordPiece induction (q193) — the likelihood-ratio trainer must match
  * an INDEPENDENT plain-Scala replay (BigInt-exact scores, same
  * tie-break, same leftmost-nonoverlapping merge application) and must
  * demonstrably optimize a different objective than BPE.
  */
class WordPieceSpec extends SparkTestBase {

  /** Independent reference implementation over an in-memory corpus:
    * segmentations as token vectors, pair/unit counts by direct scan,
    * score = floor((cnt · Scale) / (cl · cr)) in BigInt, argmax by
    * (score desc, lhs, rhs), merge applied by sequential left-to-right
    * scan (the continue-after-replacement semantics BpeSpec pins for
    * `applyMerge`).
    */
  private def replay(words: Map[String, Long], rounds: Int)
      : Seq[(String, String, Long, Long)] = {
    var segs: Map[String, (Vector[String], Long)] = words.map {
      case (w, f) => w -> (w.map(_.toString).toVector :+ Bpe.Eow, f)
    }
    val out = Seq.newBuilder[(String, String, Long, Long)]
    for (_ <- 1 to rounds) {
      val pairCnt = scala.collection.mutable.Map[(String, String), Long]()
      val unitCnt = scala.collection.mutable.Map[String, Long]()
      segs.values.foreach { case (ts, f) =>
        ts.foreach(t => unitCnt(t) = unitCnt.getOrElse(t, 0L) + f)
        ts.indices.dropRight(1).foreach { i =>
          val k = (ts(i), ts(i + 1))
          pairCnt(k) = pairCnt.getOrElse(k, 0L) + f
        }
      }
      val scored = pairCnt.toSeq.map { case ((l, r), c) =>
        val s = (BigInt(c) * WordPiece.Scale) /
          (BigInt(unitCnt(l)) * BigInt(unitCnt(r)))
        (l, r, c, s.toLong)
      }
      val (l, r, c, s) = scored.minBy { case (pl, pr, _, ps) =>
        (-ps, pl, pr)
      }
      out += ((l, r, c, s))
      segs = segs.map { case (w, (ts, f)) =>
        val nt = Vector.newBuilder[String]
        var i = 0
        while (i < ts.length) {
          if (i + 1 < ts.length && ts(i) == l && ts(i + 1) == r) {
            nt += (l + r); i += 2
          } else { nt += ts(i); i += 1 }
        }
        w -> (nt.result(), f)
      }
    }
    out.result()
  }

  private def corpusDf(words: Map[String, Long]) = {
    import spark.implicits._
    words.toSeq.toDF("word", "freq")
  }

  test("trainOn matches the independent BigInt replay on a crafted corpus") {
    val words = Map("aaab" -> 100L, "xy" -> 5L, "abxy" -> 7L,
      "banana" -> 3L, "bandana" -> 2L)
    val got = WordPiece.trainOn(corpusDf(words), 6)
      .merges.map(m => (m.lhs, m.rhs, m.cnt, m.score_fp))
    val want = replay(words, 6)
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("the likelihood objective diverges from BPE's count objective") {
    // (a,a) dominates by COUNT (200 vs 12) but 'a' is promiscuous
    // (unit count 307), so its likelihood ratio is ~40x smaller than
    // (x,y), whose occurrences are exclusive to each other
    val words = Map("aaab" -> 100L, "xy" -> 5L, "abxy" -> 7L)
    val wp = WordPiece.trainOn(corpusDf(words), 1).merges.head
    val bpe = Bpe.trainOn(corpusDf(words), 1).merges.head
    assert((bpe.lhs, bpe.rhs) == ("a", "a"), s"BPE picked ${bpe.lhs}+${bpe.rhs}")
    assert((wp.lhs, wp.rhs) == ("x", "y"),
      s"WordPiece picked ${wp.lhs}+${wp.rhs}")
  }

  test("q195: held-out fertility covers only non-train sources and " +
    "never drops unseen words from the denominator") {
    import graft.llmops.{Sampling, WordPiece}
    val rows = WordPiece.q195.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every reported source must be a non-train source under q172's rule
    val sources = rows.map(_.getString(1))
    val splits = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), Sampling.groupSplit(col("source")).as("sp"))
      .distinct().collect().map(r => r.getString(0) -> r.getString(1))
      .toMap
    sources.foreach(src => assert(splits(src) != "train", src))
    rows.foreach { r =>
      val (nWords, nTokens, nUnseen) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      // unseen words ENCODE (tokens >= words always; a vocab join
      // would have dropped them and broken this inequality)
      assert(nTokens >= nWords && nUnseen >= 0 && nUnseen <= nWords)
      assert(r.getDouble(5) >= 1.0)
    }
  }

  test("q193 over the fixture: full rank sequence, positive scores, " +
    "merged symbols well-formed") {
    val rows = WordPiece.q193.run(spark, sfDir).collect()
    assert(rows.length == WordPiece.Rounds)
    assert(rows.map(_.getLong(0)).toSeq == (1L to WordPiece.Rounds).toSeq)
    rows.foreach { r =>
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty)
      assert(r.getLong(3) > 0 && r.getLong(4) > 0)
      assert(!r.getString(1).contains(Bpe.Sep) &&
        !r.getString(2).contains(Bpe.Sep))
    }
  }
}
