package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measured evidence that persisted-index MAINTENANCE cost
  * scales with the DELTA, not the corpus (the IndexMaintenanceSpec
  * proves correctness; this measures the operational claim that makes
  * the artifacts worth persisting at all).
  *
  * For each index: build on the base corpus (90%), then time appending
  * the 10% delta vs rebuilding the whole index from scratch. At 100 TB
  * the rebuild is a full-corpus job and the append is a delta-sized
  * one; at fixture scale the ratio already shows, bounded below by
  * fixed job overhead.
  *
  * Usage: runMain graft.ScaleIndex [sfDir]
  */
object ScaleIndex {
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

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def fresh(tag: String): String = java.nio.file.Files
      .createTempDirectory(s"graft_scaleidx_$tag").toString

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // warm both inputs so IO caches are comparable
    docs.count(); embs.count()

    // ---- dedup signature index ----------------------------------------
    val dBase = docs.filter(col("doc_id") % 10 =!= 0)
    val dDelta = docs.filter(col("doc_id") % 10 === 0)
    val dPath = fresh("dedup")
    val dBuild = timed(llmops.DedupIndex.build(dBase, dPath))
    val dAppend = timed {
      llmops.DedupIndex.append(dDelta, dPath).count()
      ops.SessionScratch.evictTransients()
    }
    val dRebuild = timed(llmops.DedupIndex.build(docs, fresh("dedup_rb")))
    println(f"""{"index":"dedup_signatures","n_base":${dBase.count()},""" +
      f""""n_delta":${dDelta.count()},"build_base_sec":$dBuild%.2f,""" +
      f""""append_delta_sec":$dAppend%.2f,"rebuild_full_sec":$dRebuild%.2f,""" +
      f""""append_vs_rebuild":${dAppend / dRebuild}%.2f}""")

    // ---- IVF index ----------------------------------------------------
    val vBase = embs.filter(col("vec_id") % 10 =!= 0)
    val vDelta = embs.filter(col("vec_id") % 10 === 0)
    val vPath = fresh("ivf")
    val vBuild = timed(llmops.IvfIndex.build(vBase, vPath, k = 16))
    val vAppend = timed(llmops.IvfIndex.append(vDelta, vPath))
    val vRebuild = timed(llmops.IvfIndex.build(embs, fresh("ivf_rb"), k = 16))
    println(f"""{"index":"ivf_ann","n_base":${vBase.count()},""" +
      f""""n_delta":${vDelta.count()},"build_base_sec":$vBuild%.2f,""" +
      f""""append_delta_sec":$vAppend%.2f,"rebuild_full_sec":$vRebuild%.2f,""" +
      f""""append_vs_rebuild":${vAppend / vRebuild}%.2f}""")
    spark.stop()
  }
}
