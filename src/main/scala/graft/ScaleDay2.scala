package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llmops.{Bpe, BpeModel, ClfModel, Curation, CurationDag,
  Dedup, DedupIndex, Sampling}

/** Dev tool: measured evidence for q187's headline claim — the DAY-2
  * increment's per-run cost scales with the BATCH, not the corpus.
  * ScaleIndex proves the claim for each index artifact in isolation
  * (append vs rebuild); this measures it for the COMPOSED pipeline the
  * artifacts exist to serve.
  *
  * The experiment holds the BATCH fixed and grows the CORPUS: for each
  * corpus scale (1x, 8x — key-shifted copies of the sf fixture), the
  * day-0 artifacts are built untimed (signature index + BPE model +
  * student classifier on the base), then three day-2 strategies run
  * over the SAME fixed batch:
  *
  *   - incremental: [[CurationDag.day2Increment]] — probe the persisted
  *     index, split + score the batch survivors, encode with the frozen
  *     model. Touches the existing corpus only through the index
  *     parquet and the Rounds-row model read.
  *   - incremental packed: [[CurationDag.day2Packed]] — the complete
  *     q191 chain through frozen-student keep/drop and the pack window.
  *   - naive: the from-scratch day-2 a shop without maintained
  *     artifacts runs — re-resolve dedup over base+batch, re-split,
  *     re-score ALL survivors, RETRAIN the tokenizer on the union's
  *     train split, re-encode.
  *
  * The claim is the SHAPE: the incremental forms stay flat as the
  * corpus grows 8x (the probe is a bucket-bounded equi-join against
  * the index; everything else sees only the batch), while naive grows
  * with the corpus — at 100 TB "naive" is a full-corpus job per day.
  *
  * An untimed warm-up cycle at 1x runs first so JIT/codegen is not
  * attributed to the first timed point, and every strategy is timed
  * min-of-2 (single-shot readings on this host drift up to 2x between
  * ambient-noise windows).
  *
  * Usage: runMain graft.ScaleDay2 [sfDir]
  * Output: one JSON line per corpus scale.
  */
object ScaleDay2 {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Min-of-2 (the Bench discipline) — single-shot readings on this
    * host drift up to 2x between ambient-noise windows, which is
    * larger than the effects being measured. Checkpoint eviction runs
    * BETWEEN and AFTER the timed runs, never inside them: attributing
    * eviction overhead to a strategy would inflate exactly the
    * incremental numbers this harness exists to show are flat.
    */
  private def timedMin2(f: => Unit): Double = {
    val a = timed(f); ops.SessionScratch.evictTransients()
    val b = timed(f); ops.SessionScratch.evictTransients()
    math.min(a, b)
  }

  private def fresh(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_scaleday2_$tag").toString

  /** `factor` key-shifted copies written to parquet (the ScaleIndex
    * amplification shape — the corpus is read off disk like a real one).
    */
  private def amplify(df: DataFrame, idCol: String, factor: Int,
      dest: String): DataFrame = {
    val spark = df.sparkSession
    val shift = df.agg(max(col(idCol))).head().getLong(0) + 1
    val copies = spark.range(factor).select(col("id").as("_k"))
    df.crossJoin(broadcast(copies))
      .select(df.columns.map {
        case `idCol` => (col(idCol) + col("_k") * shift).as(idCol)
        case c       => col(c)
      }.toSeq: _*)
      .write.mode("overwrite").parquet(dest)
    spark.read.parquet(dest)
  }

  /** Day-0 artifacts for a base corpus: signature index, BPE model, and
    * student classifier, all trained on the base. Returns the loaded
    * (merges, weights).
    */
  private def day0(base: DataFrame,
      root: String): (Seq[Bpe.Merge], DataFrame) = {
    val s = base.sparkSession
    DedupIndex.build(base, s"$root/dedup")
    val train = base
      .filter(Sampling.groupSplit(col("source")) === "train")
      .select(col("doc_id"), col("text"))
    val nTrain = train.count()
    BpeModel.save(s, Bpe.trainOn(Bpe.wordFreqOf(train.select(col("text"))),
      Bpe.Rounds), s"$root/bpe", nTrain)
    ClfModel.save(s, Curation.trainClassifierOn(s, train).w,
      s"$root/clf", nTrain)
    (BpeModel.load(s, s"$root/bpe"), ClfModel.load(s, s"$root/clf"))
  }

  /** The naive from-scratch day-2: everything q187 reads off persisted
    * artifacts, recomputed over base+batch.
    */
  private def naiveFull(base: DataFrame, batch: DataFrame): Unit = {
    val union = base.unionByName(batch)
    val sigs = ops.SessionScratch.transientCheckpoint(
      Dedup.bandSignaturesOf(union))
    val losers = sigs
      .select(col("doc_id").as("doc_a"), col("band"), col("sig"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("band"),
        col("sig")), Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      .filter(col("n_bands") >= DedupIndex.MatchBands)
      .select(col("doc_b").as("doc_id")).distinct()
    val survivors = ops.SessionScratch.transientCheckpoint(
      union.join(losers, Seq("doc_id"), "left_anti"))
    val train = survivors
      .withColumn("split", Sampling.groupSplit(col("source")))
      .filter(col("split") === "train")
    Curation.classifierScores(survivors).count()
    // tokenizer RETRAIN on the union's train split — the cost the
    // frozen persisted model exists to avoid
    val merges = Bpe.trainOn(
      Bpe.wordFreqOf(train.select(col("text"))), Bpe.Rounds).merges
    train
      .select(explode(split(lower(col("text")), Bpe.WordSplitRe))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .withColumn("es", Bpe.encodeWord(col("word"), merges))
      .agg(sum(length(col("es")))).head()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    // fixed batch: every 10th id; base: the rest, amplified per scale
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val nBatch = batch.count()

    // untimed warm-up cycle at 1x: JIT/codegen for all three strategies
    locally {
      val w = fresh("warm")
      val base = docs.filter(col("doc_id") % 10 =!= 0)
      val (merges, clfW) = day0(base, w)
      ops.SessionScratch.evictTransients()
      CurationDag.day2Increment(batch, s"$w/dedup", merges).count()
      ops.SessionScratch.evictTransients()
      CurationDag.day2Packed(batch, s"$w/dedup", merges, clfW).count()
      ops.SessionScratch.evictTransients()
      naiveFull(base, batch)
      ops.SessionScratch.evictTransients()
    }

    Seq(1, 8).foreach { f =>
      val root = fresh(s"x$f")
      val base = amplify(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", f, s"$root/docs_base")
      val nBase = base.count()
      var merges: Seq[Bpe.Merge] = Nil
      var clfW: DataFrame = null
      val day0Sec = timed {
        val a = day0(base, root); merges = a._1; clfW = a._2
      }
      // release the training-time feature checkpoints (corpus-sized at
      // 8x) so day-2 timings measure the strategies, not day-0 memory
      // pressure
      ops.SessionScratch.evictTransients()
      val incSec = timedMin2 {
        CurationDag.day2Increment(batch, s"$root/dedup", merges).count()
      }
      val packSec = timedMin2 {
        CurationDag.day2Packed(batch, s"$root/dedup", merges, clfW)
          .count()
      }
      val naiveSec = timedMin2 {
        naiveFull(base, batch)
      }
      println(f"""{"dag":"day2_increment","corpus_scale":$f,""" +
        f""""n_base":$nBase,"n_batch":$nBatch,""" +
        f""""day0_build_sec":$day0Sec%.2f,""" +
        f""""incremental_sec":$incSec%.2f,""" +
        f""""incremental_packed_sec":$packSec%.2f,""" +
        f""""naive_full_sec":$naiveSec%.2f,""" +
        f""""incremental_vs_naive":${incSec / naiveSec}%.2f}""")
    }
    spark.stop()
  }
}
