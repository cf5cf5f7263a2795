package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llmops.{IvfIndex, PortableHash, Sampling}

/** Dev tool: measured scaling evidence for the round-12 second-wave
  * families (evaluation, governance, mixing).
  *
  * Three claims, each measured rather than asserted:
  *
  * 1. ANN-eval panel scaling (q217/q222's shape): the EXACT-TRUTH side
  *    costs |panel|·|corpus| (the brute-force scan), the INDEX side
  *    costs |panel|·|probed cells| — so the ratio between them is the
  *    corpus/candidate ratio, and at 100 TB an eval job samples its
  *    query panel while the maintained-index side stays cheap. Measured
  *    at panel ∈ {10, 100, 1000} over the same store.
  *
  * 2. q223's dfCap is THE knob bounding the Jaccard-truth pair space:
  *    pairs per shingle grow with min(df, cap)², so raising the cap
  *    buys truth completeness on hot shingles at a quadratic price.
  *    Measured at cap ∈ {10, 50, 200}: join time + the pair-space row
  *    counts (n_inter, n_true).
  *
  * 3. q221's waterfill cost is the ONE corpus scan — the windowed
  *    closed-form allocation runs over the |sources|-row table only.
  *    Measured at 20 vs 640 sources (each source split 32 ways by a
  *    doc-id hash): same corpus, 32× the allocation table, expect a
  *    flat total.
  *
  * Usage: runMain graft.ScaleEval [fixtureDir]   (default sf0.1)
  * Output: one JSON line per measured point.
  */
object ScaleEval {

  private def bruteTruth(spark: SparkSession, dir: String, n: Int)
      : DataFrame = {
    val t = ops.Tables(spark, dir)
    val q = t.embeddings.filter(col("vec_id") < n)
      .select(col("vec_id").as("qid"), col("embedding").as("eq"))
    val c = t.embeddings
      .select(col("vec_id").as("cid"), col("embedding").as("ec"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid"))
    broadcast(q).join(c, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        PortableHash.exactDot(col("eq"), col("ec")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 8)
  }

  private def jaccardTruth(spark: SparkSession, dir: String, cap: Int)
      : (Long, Long) = {
    val t = ops.Tables(spark, dir)
    val shAll = t.documents
      .select(col("doc_id"), PortableHash.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"),
        explode(PortableHash.shingles3(col("ws"))).as("s"))
    val wDf = Window.partitionBy(col("s"))
    val sh = shAll.withColumn("df", count(lit(1)).over(wDf))
      .filter(col("df") <= cap).drop("df")
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("doc_a"), col("s"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("s"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("ni"))
    val joined = inter
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")),
        "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")),
        "doc_b")
    val nInter = joined.count()
    val nTrue = joined
      .filter(col("ni") * 3 >= col("na") + col("nb")).count()
    (nInter, nTrue)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def timeIt(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      ops.SessionScratch.evictTransients()
      sec
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // 1. panel scaling: truth side vs index side. The store lives
    // under SessionScratch.base so the shutdown hook cleans it up even
    // when a later measurement throws (the crash-safe cleanup pattern,
    // instead of a hand-rolled inline delete).
    val store = ops.SessionScratch.base("scaleeval_ivf",
      spark.sparkContext.applicationId) + "/ivf"
    val em = ops.Tables(spark, dir).embeddings
    IvfIndex.build(em.filter(col("vec_id") % 2 === 0), store, k = 4)
    IvfIndex.append(em.filter(col("vec_id") % 2 === 1), store)
    Seq(10, 100, 1000).foreach { n =>
      val qs = em.filter(col("vec_id") < n)
        .select(col("vec_id").as("qid"), col("embedding").as("eq"))
      val truthSec = (1 to 2).map(_ =>
        timeIt(noop(bruteTruth(spark, dir, n)))).min
      val idxSec = (1 to 2).map(_ =>
        timeIt(noop(IvfIndex.search(qs, store)))).min
      println(f"""{"op":"ann_eval_panel","panel":$n,""" +
        f""""truth_sec":$truthSec%.2f,"index_sec":$idxSec%.2f,""" +
        f""""ratio":${truthSec / idxSec}%.2f}""")
    }

    // 2. dfCap sensitivity of the Jaccard truth join
    Seq(10, 50, 200).foreach { cap =>
      var counts = (0L, 0L)
      val sec = (1 to 2).map(_ =>
        timeIt { counts = jaccardTruth(spark, dir, cap) }).min
      println(f"""{"op":"jaccard_truth_cap","df_cap":$cap,""" +
        f""""sec":$sec%.2f,"n_inter":${counts._1},""" +
        f""""n_true":${counts._2}}""")
    }

    // 3. waterfill at 32x the source count (same corpus)
    val docs = ops.Tables(spark, dir).documents
    Seq("sources_20" -> col("source"),
      "sources_640" -> concat(col("source"), lit("_"),
        (col("doc_id") % 32).cast("string"))).foreach {
      case (label, srcCol) =>
        val sec = (1 to 2).map(_ =>
          timeIt(noop(Sampling.waterfillOver(docs, srcCol)))).min
        println(f"""{"op":"waterfill","point":"$label",""" +
          f""""sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
