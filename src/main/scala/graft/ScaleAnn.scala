package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measured recall/latency curves for the ANN family's two
  * tuning knobs — IVF `nprobe` (how many cells a query inspects) and
  * the graph walk's `beam` width. The registry gates pin ONE operating
  * point each (nprobe=2, beam=4) bit-exactly against the oracle; this
  * harness measures the TRADEOFF AROUND those points, because at 100 TB
  * the knob settings are the lever an operator actually turns: nprobe
  * trades candidate-scan IO (|cell|·nprobe rows) for recall, beam
  * trades walk fan-out (|queries|·beam·degree rows per round) for
  * recall. Ground truth is the exact brute-force top-8 over the same
  * 10-query probe set the gates use.
  *
  * Usage: runMain graft.ScaleAnn [sfDir]
  * Output: one JSON line per (index, knob, value).
  */
object ScaleAnn {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def fresh(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_scaleann_$tag").toString

  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("qid"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }

  private def recall(got: Map[Long, Set[Long]],
      exact: Map[Long, Set[Long]]): Double = {
    val rs = exact.map { case (q, ex) =>
      (got.getOrElse(q, Set.empty) & ex).size.toDouble / ex.size }
    rs.sum / rs.size
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

    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = embs.count()
    val queries = embs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("eq"))

    // ground truth: the q50 exact top-8 over the full corpus
    val exact = topSets(llmops.Similarity.q50.run(spark, sfDir))

    // each index is built ONCE (k=16, the production-shaped cell
    // count); the knob is swept over the same store — it changes only
    // the search, never the artifact. An untimed warm-up search runs
    // first so JIT/codegen is not attributed to the first knob value.
    def sweep(index: String, knob: String, values: Seq[Int],
        warm: () => Unit, search: Int => DataFrame): Unit = {
      warm(); ops.SessionScratch.evictTransients()
      values.foreach { v =>
        val (got, sec) = timed {
          val r = topSets(search(v))
          ops.SessionScratch.evictTransients()
          r
        }
        println(f"""{"index":"$index%s","knob":"$knob%s","value":$v,""" +
          f""""n":$n,"recall_at_8":${recall(got, exact)}%.3f,""" +
          f""""search_sec":$sec%.2f}""")
      }
    }

    val ivfPath = fresh("ivf")
    llmops.IvfIndex.build(embs, ivfPath, k = 16)
    sweep("ivf", "nprobe", Seq(1, 2, 4, 8),
      () => { llmops.IvfIndex.search(queries, ivfPath).count(); () },
      np => llmops.IvfIndex.search(queries, ivfPath, nprobe = np))

    val gPath = fresh("graph")
    llmops.GraphIndex.build(embs, gPath, k = 16)
    sweep("knn_graph", "beam", Seq(2, 4, 8, 16),
      () => { llmops.GraphIndex.search(queries, gPath).count(); () },
      b => llmops.GraphIndex.search(queries, gPath, beam = b))
    // the SECOND graph knob: expansion rounds at the gate's beam=4 —
    // the beam sweep saturates once every beam-reachable 1-hop
    // neighborhood is visited; more ROUNDS extend the walk's horizon
    // instead of its width (the HNSW ef-vs-depth distinction)
    sweep("knn_graph", "rounds", Seq(1, 2, 3, 4),
      () => { llmops.GraphIndex.search(queries, gPath).count(); () },
      r => llmops.GraphIndex.search(queries, gPath, rounds = r))
    // one composed point: wider AND deeper
    sweep("knn_graph", "beam8_rounds", Seq(2, 3),
      () => { llmops.GraphIndex.search(queries, gPath).count(); () },
      r => llmops.GraphIndex.search(queries, gPath, beam = 8, rounds = r))
    // the knob that actually moves the ceiling: build-time OUT-DEGREE
    // (the DiskANN/Vamana R parameter). beam and rounds only widen or
    // deepen the walk INSIDE the reachable component; degree grows the
    // component itself. One store per degree (it is a build artifact —
    // the config records it and appends extend at the recorded R).
    Seq(4, 8, 16).foreach { d =>
      val p = fresh(s"graph_d$d")
      val (_, buildSec) = timed {
        llmops.GraphIndex.build(embs, p, k = 16, degree = d)
      }
      llmops.GraphIndex.search(queries, p).count() // warm-up
      ops.SessionScratch.evictTransients()
      val (got, sec) = timed {
        val r = topSets(llmops.GraphIndex.search(queries, p))
        ops.SessionScratch.evictTransients()
        r
      }
      println(f"""{"index":"knn_graph","knob":"degree","value":$d,""" +
        f""""n":$n,"recall_at_8":${recall(got, exact)}%.3f,""" +
        f""""build_sec":$buildSec%.2f,"search_sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
