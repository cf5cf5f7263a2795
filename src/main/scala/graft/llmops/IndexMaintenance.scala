package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.SessionScratch

/** PERSISTED, INCREMENTALLY-MAINTAINED index artifacts for the two
  * continuously-running curation operators (SURVEY.md §2.4 [ext];
  * north star BASELINE.json) — the operational story behind q46
  * (incremental dedup) and q54 (IVF ANN) at 100 TB:
  *
  * a daily crawl lands next to an existing corpus, and the per-run cost
  * must scale with the DELTA, not the corpus. That requires the
  * existing side's derived state — MinHash band signatures for dedup,
  * trained centroids + cell assignments for ANN — to be a MAINTAINED
  * on-disk artifact, not a session memo: build once at initial ingest,
  * then each append processes only the new arrivals under the
  * RECORDED configuration and appends their rows to the index.
  *
  * This is the `zorderMaintain` pattern (ops/Layout.scala) applied to
  * the llmops indexes, with the same two invariants carried by
  * mechanism rather than comment:
  *
  *  - a `_*_config` sidecar records the parameters the index was built
  *    under (hash family / band layout for dedup; k, iters, fixed-point
  *    scale for IVF). Maintenance VERIFIES the sidecar before touching
  *    the index — appending signatures hashed under a different config
  *    (or vectors assigned under re-trained centroids) would silently
  *    produce an index whose rows are incomparable across files, the
  *    exact failure `zorderMaintain` prevents by reusing recorded
  *    bounds. Sidecar writes are atomic (temp + rename).
  *  - append NEVER rewrites base files: new rows land as appended
  *    parquet files, so the base index is untouched and concurrent
  *    readers keep a consistent view (IndexMaintenanceSpec asserts the
  *    base file set is byte-identical after maintenance).
  *
  * IvfIndex deliberately does NOT retrain on append: new vectors are
  * assigned under the RECORDED centroids (the production IVF contract —
  * FAISS's `add` after `train`). Cell balance degrades as the
  * distribution drifts; the monitoring operator for that is q171
  * (embedding drift), and the remediation is an explicit rebuild.
  */
object IndexMaintenance {

  /** Atomic sidecar publish: write-to-temp + rename (the
    * Layout.zorderWrite discipline) — the sidecar either exists
    * complete or not at all.
    */
  private[graft] def writeSidecar(s: SparkSession, dir: String,
      name: String, content: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".$name.tmp.${java.util.UUID.randomUUID()}")
    val fs = p.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(
        s"IndexMaintenance: failed to publish sidecar $name at $dir")
  }

  private[graft] def readSidecar(s: SparkSession, dir: String,
      name: String): Option[String] = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** Verify a recorded config matches what this build of the code would
    * produce; descriptive failure naming the index and the remediation.
    */
  private[llmops] def requireConfig(s: SparkSession, dir: String,
      name: String, expected: String, what: String): Unit =
    readSidecar(s, dir, name) match {
      case None =>
        throw new IllegalStateException(
          s"$what at $dir has no $name sidecar — the index was not " +
            "created by build() or its initial ingest did not complete. " +
            "Maintenance cannot proceed (rows produced under an " +
            "unknown configuration are incomparable); rebuild the " +
            "index from scratch.")
      case Some(found) if found.trim != expected =>
        throw new IllegalStateException(
          s"$what at $dir was built under config [${found.trim}] but " +
            s"this code produces [$expected]. Appending would mix " +
            "incomparable rows in one index; rebuild the index under " +
            "the current config.")
      case _ => ()
    }
}

/** The persisted MinHash-LSH signature index behind incremental dedup
  * (q46's operational form). Layout at `path`:
  * `signatures/` (doc_id, band, sig) parquet + `_dedup_index_config`.
  */
object DedupIndex {

  /** The signature recipe this build produces — recorded at build,
    * verified at every append/probe. Any change to the MinHash
    * pipeline (permutation count, band layout, token hash) must bump
    * this string, which turns silent index corruption into a
    * descriptive rebuild-required error.
    */
  val Config: String =
    "minhash=16;bands=8;rows_per_band=2;tokhash=charpoly-1000000007;" +
      "match_bands>=4;v=1"

  /** Band-match floor for "duplicate" — the q41/q45/q46 threshold. */
  val MatchBands = 4

  private def sigDir(path: String) = s"$path/signatures"

  /** Initial build: signatures of the accepted corpus + config sidecar.
    * One corpus scan (the q41 signature pipeline), written
    * hash-distributed on the LSH bucket key so probe joins read
    * co-bucketed files.
    */
  def build(docs: DataFrame, path: String): Unit = {
    val s = docs.sparkSession
    Dedup.bandSignaturesOf(docs)
      .write.mode("overwrite").parquet(sigDir(path))
    IndexMaintenance.writeSidecar(s, path, "_dedup_index_config", Config)
  }

  /** The stored signature table (config-verified). */
  def signatures(s: SparkSession, path: String): DataFrame = {
    IndexMaintenance.requireConfig(s, path, "_dedup_index_config",
      Config, "Dedup signature index")
    s.read.parquet(sigDir(path))
  }

  /** READ-ONLY probe: the rows of `newDocs` that survive dedup against
    * the index — a new doc is dropped when it shares >= [[MatchBands]]
    * of 8 band signatures with ANY indexed doc. Cost shape: hash ONLY
    * `newDocs` (delta-sized explode + hash-agg), one bucket-bounded
    * (band, sig) equi-join against the index parquet, one anti-join.
    * Existing×existing pairs never materialize; the corpus is never
    * re-hashed.
    */
  def probe(newDocs: DataFrame, path: String): DataFrame =
    probeWithSigs(newDocs, Dedup.bandSignaturesOf(newDocs), path)

  private def probeWithSigs(newDocs: DataFrame, newSigs: DataFrame,
      path: String): DataFrame = {
    val s = newDocs.sparkSession
    val idx = signatures(s, path)
      .select(col("doc_id").as("doc_e"), col("band"), col("sig"))
    val dropped = newSigs.join(idx, Seq("band", "sig"))
      .groupBy(col("doc_id"), col("doc_e"))
      .agg(count(lit(1)).as("n_bands"))
      .filter(col("n_bands") >= MatchBands)
      .select(col("doc_id"))
      .distinct()
    newDocs.join(dropped, Seq("doc_id"), "left_anti")
  }

  /** MAINTENANCE: probe `newDocs` against the index, append the
    * SURVIVORS' signatures (accepted docs only — dropped docs never
    * enter the corpus, so their signatures must not enter the index),
    * and return the surviving rows. The new docs are hashed exactly
    * once: the signature frame is checkpointed and feeds both the
    * probe join and the appended subset. Base index files are never
    * rewritten.
    */
  def append(newDocs: DataFrame, path: String): DataFrame = {
    val newSigs = SessionScratch.transientCheckpoint(
      Dedup.bandSignaturesOf(newDocs))
    val survivors = SessionScratch.transientCheckpoint(
      probeWithSigs(newDocs, newSigs, path))
    newSigs.join(survivors.select(col("doc_id")), Seq("doc_id"),
        "left_semi")
      .write.mode("append").parquet(sigDir(path))
    survivors
  }
}

/** The persisted IVF ANN index behind q54's operational form. Layout at
  * `path`: `centroids/` (cell, centroid) + `assignments/` (member_id,
  * cell, em) parquet + `_ivf_index_config`.
  */
object IvfIndex {

  /** Lloyd iterations at initial training (the q52/q54 recipe). */
  val Iters = 2

  private def config(k: Int): String =
    s"kind=ivf-spherical-kmeans;k=$k;iters=$Iters;fixed_point=1e7;" +
      "seed=first-k-by-id;v=1"

  private def centDir(path: String) = s"$path/centroids"
  private def asgDir(path: String) = s"$path/assignments"

  /** Initial build: train k centroids on the corpus (the expensive,
    * corpus-sized step), persist centroids AND the corpus assignment
    * table, record the config. After this, appends never retrain.
    */
  def build(embeddings: DataFrame, path: String, k: Int): Unit = {
    val s = embeddings.sparkSession
    import s.implicits._
    val cents = KMeans.fit(s, embeddings, k = k, iters = Iters)
    cents.map(c => (c.cell, c.centroid.toSeq)).toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(centDir(path))
    KMeans.assign(embeddings, cents)
      .select(col("vec_id").as("member_id"), col("cell"),
        col("embedding").as("em"))
      .write.mode("overwrite").parquet(asgDir(path))
    IndexMaintenance.writeSidecar(s, path, "_ivf_index_config", config(k))
  }

  /** The recorded centroids (k-bounded collect; config-verified — the
    * k in the sidecar must match the stored table).
    */
  def centroids(s: SparkSession, path: String): Seq[KMeans.Centroid] = {
    import s.implicits._
    val cents = s.read.parquet(centDir(path))
      .select(col("cell"), col("centroid"))
      .as[(Long, Seq[Double])]
      .collect()
      .map { case (cell, v) => KMeans.Centroid(cell, v.toArray) }
      .toSeq
    IndexMaintenance.requireConfig(s, path, "_ivf_index_config",
      config(cents.size), "IVF index")
    cents.sortBy(_.cell)
  }

  /** MAINTENANCE: assign ONLY the new vectors under the RECORDED
    * centroids (no retraining — the FAISS train-then-add contract) and
    * append their assignment rows. Cost shape: one delta-sized argmax
    * projection + one delta-sized append; the corpus assignment table
    * is never read or rewritten.
    */
  def append(newVecs: DataFrame, path: String): Unit = {
    val s = newVecs.sparkSession
    val cents = centroids(s, path)
    KMeans.assign(newVecs, cents)
      .select(col("vec_id").as("member_id"), col("cell"),
        col("embedding").as("em"))
      .write.mode("append").parquet(asgDir(path))
  }

  /** Search the MAINTAINED index: the q54 probe shape (top-`nprobe`
    * cells by exact fixed-point centroid dot, per-query top-`topk` by
    * exact cosine) with the assignment table read off parquet. The
    * candidate set per query is |cell|·nprobe, never |corpus|.
    */
  def search(queries: DataFrame, path: String, nprobe: Int = 2,
      topk: Int = 8): DataFrame = {
    val s = queries.sparkSession
    import s.implicits._
    val centDf = centroids(s, path)
      .map(c => (c.cell, c.centroid.toSeq)).toDF("ccell", "ec")
    Similarity.ivfSearchOver(queries, s.read.parquet(asgDir(path)),
      centDf, nprobe, topk)
  }
}
