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
    * complete or not at all. The rename is an overwrite-capable
    * FileContext rename, so RE-publishing over an existing sidecar is
    * one atomic replace too (a delete-then-rename would open a crash
    * window where the index has valid data but no sidecar, forcing a
    * spurious full rebuild).
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
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.getUri, conf)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Delete a sidecar — the RETRACTION half of the publish protocol:
    * removing the config marker takes the store detectably offline
    * (every read path fails with the descriptive rebuild error) until
    * a subsequent build re-publishes it.
    */
  private[graft] def retractSidecar(s: SparkSession, dir: String,
      name: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    // the retraction must be VERIFIED: if the delete silently fails and
    // the old config stays live, a subsequent rebuild recreates exactly
    // the undetected torn-rebuild window (new data readable under the
    // old config) that retract-then-rebuild exists to close
    val deleted = fs.delete(p, false)
    require(deleted || !fs.exists(p),
      s"could not retract sidecar $p: delete failed and the file " +
        "still exists — aborting before the rebuild can pair new data " +
        "with the stale config")
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

  // ---- shared read-only stores (_shared_readonly marker) ------------------
  //
  // Session stores built by the shared existing*Index/Model builders
  // are pinned by MANY gates' oracles at their exact ingest recipe; a
  // gate-specific append/delete/bump on one breaks hashes far from the
  // mutation site (the round-13 q233 postmortem class). The builders
  // therefore stamp a `_shared_readonly` marker naming the owning
  // gates, and every mutation chokepoint (manifest publish, tombstone
  // add, provenance bump) refuses on it AT THE MUTATION SITE with the
  // clone guidance — turning a far-from-cause hash mismatch into an
  // immediate descriptive failure. Reads, fsck, and vacuum (repair of
  // provably-uncommitted garbage — it cannot change committed state)
  // stay allowed.

  private[llmops] val SharedReadonlyName = "_shared_readonly"

  /** Stamp a store read-only, recording the gates whose oracles pin it
    * (called by the shared builders as the LAST step of their one-time
    * ingest, after every legitimate build/append/bump of their own).
    */
  private[graft] def markSharedReadonly(s: SparkSession, path: String,
      owners: String): Unit =
    writeSidecar(s, path, SharedReadonlyName, s"owners=$owners;v=1")

  /** Refuse `op` on a store stamped [[markSharedReadonly]]. */
  private[llmops] def requireMutable(s: SparkSession, path: String,
      op: String): Unit =
    readSidecar(s, path, SharedReadonlyName).foreach { body =>
      val owners = "(^|;)owners=([^;]*)".r.findFirstMatchIn(body.trim)
        .map(_.group(2)).getOrElse("unrecorded")
      throw new IllegalStateException(
        s"store at $path is a SHARED session store marked read-only " +
          s"(owning gates: $owners) — a $op would silently shift " +
          "those gates' pinned oracles far from the mutation site. " +
          "Clone the store into a dedicated path first (the q210 " +
          "pattern) and mutate the clone.")
    }

  // ---- manifested data-file store ----------------------------------------
  //
  // `write.mode("append").parquet(dir)` has no commit marker: a crash
  // mid-append leaves partial part-files that a later directory read
  // silently absorbs — for the dedup index that means over-dropping
  // every future doc that collides with a torn signature row. The fix
  // is the zorder-sidecar discipline applied to the FILE SET: a
  // manifest sidecar atomically records the exact (name, length) set
  // that constitutes the store (plus which generation directory holds
  // it), appends publish the manifest only AFTER their parquet write,
  // and every read first verifies listing == manifest — so a torn
  // append (or a torn compaction) is DETECTED and reported as
  // rebuild-required, never silently read.
  //
  // The generation token exists for compaction: rewriting many small
  // appended files into few cannot be atomic inside one directory, so
  // compact() writes generation N+1 as a fresh directory and the
  // manifest publish IS the atomic swap; the superseded generation is
  // deleted best-effort afterwards (a crash between the two leaves
  // only unreferenced garbage, never a half-swapped store).

  /** (name, length) of every data file directly under `dir`. */
  private[llmops] def listDataFiles(s: SparkSession, dir: String)
      : Set[(String, Long)] = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => st.getPath.getName -> st.getLen).toSet
  }

  /** Record `subdir`'s CURRENT data-file set as the store's contents —
    * the atomic commit point of an append or a compaction swap.
    */
  private[llmops] def publishManifest(s: SparkSession, path: String,
      name: String, subdir: String): Unit = {
    // every mutation that COMMITS (append, compaction swap, republish)
    // flows through this publish — the one chokepoint that makes the
    // read-only stamp mechanical rather than documentation
    requireMutable(s, path, s"manifest publish ($name)")
    val files = listDataFiles(s, s"$path/$subdir")
    val body = (s"dir=$subdir" +:
      files.toSeq.sorted.map { case (n, l) => s"$n:$l" }).mkString("\n")
    writeSidecar(s, path, name, body)
  }

  /** Verify listing == manifest and return the absolute data directory
    * of the current generation. Descriptive failures for a missing
    * manifest, a torn append (unlisted files present), and lost files.
    */
  private[llmops] def verifiedDir(s: SparkSession, path: String,
      name: String, what: String): String = {
    val m = readSidecar(s, path, name).getOrElse(
      throw new IllegalStateException(
        s"$what at $path has no $name manifest — the store was not " +
          "created by build() or its initial ingest did not complete; " +
          "rebuild the index."))
    val lines = m.trim.split("\n").toSeq
    val subdir = lines.head.stripPrefix("dir=")
    val recorded = lines.tail.filter(_.nonEmpty).map { ln =>
      val i = ln.lastIndexOf(':')
      (ln.substring(0, i), ln.substring(i + 1).toLong)
    }.toSet
    val actual = listDataFiles(s, s"$path/$subdir")
    if (actual != recorded) {
      val extra = (actual -- recorded).map(_._1).toSeq.sorted
      val missing = (recorded -- actual).map(_._1).toSeq.sorted
      throw new IllegalStateException(
        s"$what at $path fails manifest verification: " +
          (if (extra.nonEmpty)
            s"${extra.size} file(s) present but not committed " +
              s"(torn append? e.g. ${extra.take(3).mkString(", ")}) "
          else "") +
          (if (missing.nonEmpty)
            s"${missing.size} committed file(s) missing or resized " +
              s"(e.g. ${missing.take(3).mkString(", ")}) "
          else "") +
          "— reading would return wrong rows; rebuild the index.")
    }
    s"$path/$subdir"
  }

  /** Compact the manifested store under its RECORDED config: rewrite
    * the current generation's many appended files into ~targetBytes
    * files in generation N+1, atomically swap via the manifest
    * publish, then best-effort delete the old generation. Returns
    * (filesBefore, filesAfter).
    *
    * Plain stores (row set preserved) delegate the sizing +
    * round-robin rewrite to [[graft.etl.Compaction]]. LOG-STRUCTURED
    * stores whose rows are additive PARTIALS (the [[NgramIndex]]
    * counts) pass `merge` — the compaction then also AGGREGATES the
    * partials (the LSM merge step), sized from the pre-merge bytes as
    * an upper bound.
    */
  private[llmops] def compactStore(s: SparkSession, path: String,
      name: String, what: String, targetBytes: Long,
      merge: Option[DataFrame => DataFrame] = None): (Int, Int) = {
    requireMutable(s, path, "compaction")
    val cur = verifiedDir(s, path, name, what)
    val curSub = cur.substring(path.length + 1)
    val gen = "-g(\\d+)$".r.findFirstMatchIn(curSub)
      .map(_.group(1).toInt).getOrElse(0)
    val base = "-g(\\d+)$".r.replaceAllIn(curSub, "")
    val nextSub = s"$base-g${gen + 1}"
    val before = listDataFiles(s, cur).size
    merge match {
      case None =>
        graft.etl.Compaction.compact(s, cur, s"$path/$nextSub",
          targetBytes)
      case Some(m) =>
        val bytes = listDataFiles(s, cur).map(_._2).sum
        val n = math.max(1,
          math.ceil(bytes.toDouble / targetBytes).toInt)
        m(s.read.parquet(cur)).repartition(n)
          .write.mode("overwrite").parquet(s"$path/$nextSub")
    }
    publishManifest(s, path, name, nextSub)
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(cur), true)
    (before, listDataFiles(s, s"$path/$nextSub").size)
  }

  // ---- tombstoned deletes (lazy delete; compaction drops) -----------------
  //
  // Production corpora DELETE as well as append (takedowns, opt-outs,
  // licence expiry). Rewriting a 100 TB index per takedown is not an
  // option, so deletes are TOMBSTONES: a second manifested store under
  // the same root records the deleted ids, every read path masks them
  // (one anti-join against a deletes-sized table), and the next
  // compaction physically drops the masked rows and clears the
  // tombstones — the standard LSM / FAISS remove_ids / DiskANN
  // lazy-delete discipline. The tombstone store inherits the full
  // manifest crash contract: a torn delete-append is detected at read,
  // vacuumable, and never silently absorbed.

  private[llmops] def tombManifest(manifestName: String): String =
    manifestName + "_tombs"

  /** Stable fingerprint of the current tombstone manifest (None when
    * no deletes were ever recorded) — consumers whose DERIVED sidecar
    * state must stay in lockstep with the tombstone set (TextIndex's
    * BM25 stats) record this and verify it at read, so a crash between
    * the tombstone publish and the derived-state write is DETECTED.
    */
  private[llmops] def tombFingerprint(s: SparkSession, path: String,
      manifestName: String): Option[String] =
    readSidecar(s, path, tombManifest(manifestName)).map { m =>
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(m.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }

  /** Record `ids` (a one-column frame of int64 ids) as DELETED.
    * Appends to the manifested `tombs-g<N>` store (created on first
    * delete) and publishes its manifest — the same commit discipline
    * as a data append. Ids already tombstoned are dropped before the
    * write (re-deleting is a no-op, and the NEW-id count is what
    * [[bumpDeleted]] folds into the provenance; an id that never was
    * a member still counts — the safe early-republish direction, see
    * [[TrainStats]]).
    */
  private[llmops] def addTombstones(s: SparkSession, path: String,
      manifestName: String, what: String, ids: DataFrame): Unit = {
    requireMutable(s, path, "delete")
    val tn = tombManifest(manifestName)
    val committed = readSidecar(s, path, tn)
    val cur = committed match {
      case Some(_) => verifiedDir(s, path, tn, s"$what tombstones")
      case None =>
        // no tombstone manifest = no delete ever COMMITTED. Any
        // existing tombs-g* directory is provably-uncommitted garbage
        // (a first delete that crashed before its manifest publish, or
        // a clearTombstones that crashed after its retraction) —
        // adopting its files would silently commit a delete that never
        // happened (and, for TextIndex, one whose stats adjustment
        // never ran, with a fingerprint stamp that would then
        // VALIDATE the mismatch). Sweep it before starting fresh.
        val conf = s.sparkContext.hadoopConfiguration
        val root = new org.apache.hadoop.fs.Path(path)
        val fs = root.getFileSystem(conf)
        if (fs.exists(root))
          fs.listStatus(root).toSeq
            .filter(st => st.isDirectory &&
              st.getPath.getName.matches("^tombs-g\\d+$"))
            .foreach { st =>
              require(fs.delete(st.getPath, true) || !fs.exists(st.getPath),
                s"could not sweep orphaned tombstone dir ${st.getPath}")
            }
        s"$path/tombs-g0"
    }
    val distinctIds = ids.toDF("id").select(col("id").cast("long"))
      .distinct()
    val newIds = committed match {
      case Some(_) =>
        val existing = s.read.parquet(cur).select(col("id").as("__tomb_id"))
        distinctIds.join(existing,
          distinctIds("id") === existing("__tomb_id"), "left_anti")
      case None => distinctIds
    }
    // localCheckpoint: the count below and the write must see ONE
    // snapshot (the anti-join reads the store being appended to)
    val pinned = newIds.localCheckpoint()
    val nNew = pinned.count()
    if (nNew > 0) {
      // bump BEFORE the tombstone publish (the bumpAppended crash
      // direction: a crash between the two over-counts, erring early)
      bumpDeleted(s, path, nNew)
      pinned.write.mode("append").parquet(cur)
      publishManifest(s, path, tn, cur.substring(path.length + 1))
    }
    // nNew == 0 (every id already tombstoned, or an empty delete) is a
    // SEMANTIC no-op — committing it anyway would cost a sidecar RMW,
    // an empty part file in tombs-gN, and a manifest republish per
    // repeated takedown replay, all for state the store already holds
    SessionScratch.releaseCheckpoint(pinned)
  }

  /** The committed tombstone set as a one-column frame (`id`), or
    * None when no delete was ever recorded (the common case — reads
    * then skip the anti-join entirely).
    */
  private[llmops] def tombstones(s: SparkSession, path: String,
      manifestName: String, what: String): Option[DataFrame] = {
    val tn = tombManifest(manifestName)
    readSidecar(s, path, tn).map { _ =>
      s.read.parquet(verifiedDir(s, path, tn, s"$what tombstones"))
        .select(col("id"))
    }
  }

  /** `rows` minus tombstoned ids on `idCol` — the read-path mask. A
    * NULL `idCol` row always survives (left-anti keeps unmatched
    * rows), which is exactly right for mixed-shape stores where some
    * row kinds carry no member id.
    */
  private[llmops] def minusTombstones(s: SparkSession, path: String,
      manifestName: String, what: String, rows: DataFrame,
      idCol: String): DataFrame =
    tombstones(s, path, manifestName, what) match {
      case None => rows
      case Some(t) =>
        val tt = t.select(col("id").as("__tomb_id"))
        rows.join(tt, rows(idCol) === tt("__tomb_id"), "left_anti")
    }

  /** The physical-drop closure for [[compactStore]]'s merge hook:
    * rows minus tombstoned ids on `idCol`, or None when no deletes
    * pend (compaction then stays the plain file rewrite). One
    * definition so the mask semantics cannot drift between stores.
    */
  private[llmops] def tombstoneDropper(s: SparkSession, path: String,
      manifestName: String, what: String, idCol: String)
      : Option[DataFrame => DataFrame] =
    tombstones(s, path, manifestName, what).map { t =>
      val tt = t.select(col("id").as("__tomb_id"))
      (df: DataFrame) =>
        df.join(tt, df(idCol) === tt("__tomb_id"), "left_anti")
    }

  /** Vacuum BOTH stores under one root: the data store and, when one
    * exists, its tombstone store — a torn delete-append leaves
    * uncommitted files under `tombs-g<N>` that the data-store vacuum's
    * generation regex deliberately does not touch. Counts are summed.
    */
  private[llmops] def vacuumWithTombstones(s: SparkSession, path: String,
      manifestName: String, what: String): VacuumReport = {
    val main = vacuumStore(s, path, manifestName, what)
    val tn = tombManifest(manifestName)
    if (readSidecar(s, path, tn).isEmpty) main
    else {
      val t = vacuumStore(s, path, tn, s"$what tombstones")
      VacuumReport(
        main.uncommittedRemoved + t.uncommittedRemoved,
        main.staleGenerationsRemoved + t.staleGenerationsRemoved,
        main.tempsRemoved + t.tempsRemoved)
    }
  }

  /** Clear the tombstone store after its rows were PHYSICALLY dropped
    * (a compaction swap or a republish). Order matters for the crash
    * window: the manifest is retracted FIRST, so a crash mid-clear
    * leaves an unreferenced tombs directory (garbage a tombstone-store
    * vacuum can sweep), never a manifest pointing at deleted files.
    * Re-applying a tombstone whose rows are already gone is a no-op,
    * so clearing strictly after the data swap is idempotent-safe.
    */
  private[llmops] def clearTombstones(s: SparkSession, path: String,
      manifestName: String): Unit = {
    val tn = tombManifest(manifestName)
    if (readSidecar(s, path, tn).isDefined) {
      retractSidecar(s, path, tn)
      val conf = s.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(conf)
      fs.listStatus(root).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.matches("^tombs-g\\d+$"))
        .foreach { st =>
          // verified like retractSidecar: a silently-failed delete
          // would leave files a future first-delete must then sweep
          require(fs.delete(st.getPath, true) || !fs.exists(st.getPath),
            s"could not clear tombstone dir ${st.getPath}")
        }
    }
  }

  /** What [[vacuumStore]] removed: uncommitted data files inside the
    * live generation (a torn append's leftovers), superseded generation
    * directories (a compaction/republish whose best-effort delete was
    * lost to a crash), and orphaned sidecar temp files (a
    * [[writeSidecar]] killed between create and rename).
    */
  final case class VacuumReport(uncommittedRemoved: Int,
      staleGenerationsRemoved: Int, tempsRemoved: Int)

  /** Crash-RECOVERY for a manifested store — the remediation half of
    * [[verifiedDir]]'s detection: the manifest defines exactly which
    * files ARE the store, so everything else under `path` is provably
    * garbage and removing it restores the committed state without a
    * rebuild. Turns "torn append detected → rebuild required" into
    * "torn append detected → vacuum → retry the append".
    *
    * Refuses (descriptively) when committed files are MISSING or
    * resized — that is data loss, not garbage, and only a rebuild can
    * recover it. Single-writer discipline assumed (as everywhere in
    * this family): vacuuming while an append/compaction is in flight
    * would delete its in-progress files.
    */
  private[llmops] def vacuumStore(s: SparkSession, path: String,
      name: String, what: String): VacuumReport = {
    val conf = s.sparkContext.hadoopConfiguration
    val m = readSidecar(s, path, name).getOrElse(
      throw new IllegalStateException(
        s"$what at $path has no $name manifest — nothing defines the " +
          "committed file set, so vacuum cannot distinguish data from " +
          "garbage; rebuild the index."))
    val lines = m.trim.split("\n").toSeq
    val subdir = lines.head.stripPrefix("dir=")
    val recorded = lines.tail.filter(_.nonEmpty).map { ln =>
      val i = ln.lastIndexOf(':')
      (ln.substring(0, i), ln.substring(i + 1).toLong)
    }.toSet
    val live = new org.apache.hadoop.fs.Path(s"$path/$subdir")
    val fs = live.getFileSystem(conf)
    val actual = listDataFiles(s, s"$path/$subdir")
    val missing = (recorded -- actual).map(_._1).toSeq.sorted
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"$what at $path cannot be vacuumed: ${missing.size} committed " +
          s"file(s) missing or resized (e.g. ${missing.take(3).mkString(", ")})" +
          " — that is data loss, not leftover garbage; rebuild the index.")
    // 1. uncommitted data files inside the live generation
    val extras = (actual -- recorded).map(_._1).toSeq.sorted
    extras.foreach { n =>
      val p = new org.apache.hadoop.fs.Path(live, n)
      require(fs.delete(p, false) || !fs.exists(p),
        s"vacuum could not remove uncommitted file $p")
    }
    // 2. superseded generation directories: siblings named
    //    <base>-g<N> for the live subdir's base, other than the live one
    val base = "-g(\\d+)$".r.replaceAllIn(subdir, "")
    val genRe = s"^${java.util.regex.Pattern.quote(base)}-g\\d+$$".r
    val root = new org.apache.hadoop.fs.Path(path)
    val stale = fs.listStatus(root).toSeq.filter { st =>
      st.isDirectory && st.getPath.getName != subdir &&
        genRe.findFirstIn(st.getPath.getName).isDefined
    }
    stale.foreach { st =>
      require(fs.delete(st.getPath, true) || !fs.exists(st.getPath),
        s"vacuum could not remove stale generation ${st.getPath}")
    }
    // 3. orphaned sidecar temps directly under the store root
    val temps = fs.listStatus(root).toSeq.filter { st =>
      st.isFile && st.getPath.getName.startsWith(".") &&
        st.getPath.getName.contains(".tmp.")
    }
    temps.foreach { st =>
      require(fs.delete(st.getPath, false) || !fs.exists(st.getPath),
        s"vacuum could not remove orphaned temp ${st.getPath}")
    }
    VacuumReport(extras.size, stale.size, temps.size)
  }

  /** Non-throwing health report for one manifested store — the
    * OBSERVATION third of the crash-safety triad: [[verifiedDir]]
    * refuses a damaged store at read time, [[vacuumStore]] repairs it,
    * and fsck only reports, so an operator can audit a whole catalog of
    * stores (including ones every read path would throw on) in one
    * sweep and pick the remediation per store. The three garbage
    * categories are exactly vacuum's; `missingFiles` is the data-loss
    * case vacuum refuses on; `configMatches` is [[requireConfig]]'s
    * drift check, reported instead of thrown (None when the store has
    * no config sidecar or the expected string is unknown).
    */
  final case class FsckReport(
      what: String, path: String,
      configPresent: Boolean, configMatches: Option[Boolean],
      manifestPresent: Boolean, generation: Int,
      committedFiles: Int, committedBytes: Long,
      uncommittedFiles: Int, missingFiles: Int,
      staleGenerations: Int, orphanedTemps: Int,
      trainStats: Option[TrainStats] = None) {
    /** Every read path would succeed and nothing needs sweeping. */
    def healthy: Boolean = configPresent && configMatches.forall(identity) &&
      manifestPresent && uncommittedFiles == 0 && missingFiles == 0 &&
      staleGenerations == 0 && orphanedTemps == 0
    /** [[vacuumStore]] would restore `healthy` (garbage present, no
      * data loss, no config drift — those need a rebuild instead). */
    def vacuumRepairs: Boolean = configPresent &&
      configMatches.forall(identity) && manifestPresent &&
      missingFiles == 0 && (uncommittedFiles > 0 ||
        staleGenerations > 0 || orphanedTemps > 0)
  }

  // ---- training provenance (_train_stats sidecar) --------------------------
  //
  // The trained stores (IVF / IVF-PQ / graph) record WHERE their trained
  // artifacts came from: the training-sample size (n_train, measured for
  // free inside KMeans.fitStats / PqCodebook.fitStats), the FAISS 39·k
  // undertraining verdict at build time, the k-selection policy, and a
  // running count of rows appended SINCE training (n_appended, bumped
  // atomically by every append). Together they make the two operational
  // decisions pure METADATA reads: "is this store undertrained?"
  // (fsck/StoreAudit) and "has it grown enough since training to need a
  // republish?" (the q230 drift→decision sweep) — neither touches data.

  /** Parsed `_train_stats` sidecar. `drift` is the appended share of the
    * current membership — the staleness metric the republish decision
    * thresholds on (FAISS/DiskANN "rebuild when inserts exceed X% of
    * build size").
    *
    * DELETE-AWARE (round 15, closing the round-14 documented bias):
    * `nDeleted` counts members tombstoned since training — bumped by
    * [[bumpDeleted]] on every delete, folded into the base by
    * [[foldDeletesIntoTrain]] when a compaction physically drops the
    * tombstoned rows, reset (with everything else) by a republish.
    * Without it, takedown-heavy stores republish LATE: the
    * n_train + n_appended denominator overstates a membership most of
    * which is gone, so appends that dominate the LIVE store read as a
    * small share of a phantom large one. The decision rule
    * ([[StoreRemediator.needsRepublish]]) therefore thresholds
    * appended rows against the live trained base (n_train − n_deleted),
    * not the historical build size.
    *
    * APPROXIMATION (deliberate, safe direction): the counter does not
    * know WHICH rows a delete hit, so the compact fold attributes all
    * drops to the trained base. When deletes actually removed appended
    * rows, the post-fold base reads LOW and drift reads HIGH — an
    * EARLY republish, which resets the ledger. Same direction for ids
    * deleted twice across a compact boundary or ids that never were
    * members: [[addTombstones]] bumps only ids not already tombstoned,
    * but a foreign id still counts — again early, never late. Keeping
    * the exact per-row provenance would make the sidecar a second
    * membership ledger every delete path must keep transactionally
    * consistent; the decision rule does not need that precision.
    *
    * `k` is the store's TRUE trained cell count; `floorK` is the
    * (possibly larger) shape the 39·x undertraining floor gates on —
    * they differ only for stores with a second trained half whose
    * sample requirement dominates (IVF-PQ: floorK = max(k, cb), the
    * codebook's 39·cb floor vs the usually-smaller cell count). Kept
    * separate so a consumer sizing a rebuild reads `k` and can never
    * republish at the floor by mistake.
    */
  final case class TrainStats(nTrain: Long, k: Int, undertrained: Boolean,
      nAppended: Long, kPolicy: String, floorK: Option[Int] = None,
      nDeleted: Long = 0L) {
    def drift: Double =
      if (nTrain + nAppended == 0) 0.0
      else nAppended.toDouble / (nTrain + nAppended).toDouble
    /** The shape the undertraining floor is computed from. */
    def floorShape: Int = floorK.getOrElse(k)
    /** The live trained base the republish rule thresholds against —
      * training rows minus tombstoned members (clamped: the fold/bump
      * approximation can overshoot on foreign-id deletes).
      */
    def liveTrainBase: Long = math.max(0L, nTrain - nDeleted)
  }

  private[llmops] val TrainStatsName = "_train_stats"

  /** THE sidecar serialization — one renderer for build-time writes
    * AND append-time bumps, so the two writers can never drift format
    * (a drifted bump would parse as None and silently stop counting).
    */
  private def renderTrainStats(ts: TrainStats): String =
    s"n_train=${ts.nTrain};k=${ts.k};" +
      s"floor_k=${ts.floorShape};" +
      s"floor=${KMeans.minTrainPoints(ts.floorShape)};" +
      s"undertrained=${ts.undertrained};" +
      s"n_appended=${ts.nAppended};n_deleted=${ts.nDeleted};" +
      s"k_policy=${ts.kPolicy};v=3"

  /** Record training provenance at build time (n_appended resets to 0 —
    * a rebuild consumes all prior appends by definition). `floorK`
    * overrides the shape the 39·x undertraining floor gates on when a
    * second trained half's requirement dominates (see [[TrainStats]]);
    * `k` itself stays the store's true cell count.
    */
  private[llmops] def writeTrainStats(s: SparkSession, path: String,
      nTrain: Long, k: Int, kPolicy: String,
      floorK: Option[Int] = None): Unit =
    writeSidecar(s, path, TrainStatsName,
      renderTrainStats(TrainStats(nTrain, k,
        KMeans.undertrained(nTrain, floorK.getOrElse(k)),
        nAppended = 0L, kPolicy, floorK)))

  /** The recorded training provenance; None when the store predates the
    * sidecar or was never built by a trained-store builder.
    */
  private[llmops] def readTrainStats(s: SparkSession, path: String)
      : Option[TrainStats] =
    readSidecar(s, path, TrainStatsName).flatMap { body =>
      def field(name: String): Option[String] =
        s"(^|;)$name=([^;]*)".r.findFirstMatchIn(body.trim)
          .map(_.group(2))
      scala.util.Try(TrainStats(
        field("n_train").get.toLong,
        field("k").get.toInt,
        field("undertrained").get.toBoolean,
        field("n_appended").get.toLong,
        field("k_policy").get,
        // v1 sidecars predate floor_k (floor was derived from k);
        // absent → the floor shape IS k, which v1 guaranteed
        field("floor_k").map(_.toInt),
        // v1/v2 sidecars predate n_deleted; absent → no delete was
        // ever counted, which those versions guaranteed
        field("n_deleted").map(_.toLong).getOrElse(0L))).toOption
    }

  /** Add `delta` appended rows to the recorded provenance (atomic
    * sidecar replace). No-op for stores without the sidecar — appends
    * must keep working on stores built before it existed.
    *
    * SINGLE WRITER ASSUMED (the store family's standing discipline —
    * [[vacuumStore]] states the same): the bump is a read-modify-write
    * of the sidecar, so two OVERLAPPING appends to one store could
    * interleave read/write and silently lose a count, permanently
    * understating drift. Appends to one store must be serialized by
    * the caller (concurrent appends already race the data manifest
    * itself, so this adds no new requirement — it documents why the
    * RMW needs no lock of its own).
    *
    * CRASH DIRECTION: callers bump BEFORE publishing the data
    * manifest, so a crash between the two leaves n_appended
    * OVER-counted against a store whose extra files are uncommitted
    * garbage (vacuumed at recovery) — the staleness metric then errs
    * toward an EARLY republish, which resets it. Bumping after the
    * publish would instead under-count on a crash: a permanently
    * stale-looking-fresh store that the decision loop never flags.
    */
  private[llmops] def bumpAppended(s: SparkSession, path: String,
      delta: Long): Unit = {
    requireMutable(s, path, "provenance append bump")
    readTrainStats(s, path).foreach { ts =>
      writeSidecar(s, path, TrainStatsName,
        renderTrainStats(ts.copy(nAppended = ts.nAppended + delta)))
    }
  }

  /** Add `delta` tombstoned members to the recorded provenance — the
    * delete-side twin of [[bumpAppended]] (same single-writer RMW
    * contract, same no-op on sidecar-less stores). Callers bump BEFORE
    * publishing the tombstone manifest, so a crash between the two
    * OVER-counts deletes against a store whose tombstones never
    * committed — drift then errs toward an EARLY republish, which
    * resets the ledger (the [[bumpAppended]] crash direction).
    */
  private[llmops] def bumpDeleted(s: SparkSession, path: String,
      delta: Long): Unit = {
    requireMutable(s, path, "provenance delete bump")
    readTrainStats(s, path).foreach { ts =>
      writeSidecar(s, path, TrainStatsName,
        renderTrainStats(ts.copy(nDeleted = ts.nDeleted + delta)))
    }
  }

  /** Fold counted deletes into the trained base after a compaction
    * PHYSICALLY dropped the tombstoned rows: n_train −= n_deleted
    * (clamped), n_deleted = 0. The republish rule is invariant under
    * the fold (it thresholds on n_train − n_deleted either way), so
    * compacting never changes a store's staleness verdict — it only
    * keeps the sidecar aligned with the store that now exists on disk.
    * No-op for sidecar-less stores and for kinds whose compaction
    * preserves tombstoned rows (the graph keeps them routing until
    * republish — its delete counter keeps accruing until then).
    */
  private[llmops] def foldDeletesIntoTrain(s: SparkSession,
      path: String): Unit =
    readTrainStats(s, path).filter(_.nDeleted > 0).foreach { ts =>
      writeSidecar(s, path, TrainStatsName,
        renderTrainStats(ts.copy(nTrain = ts.liveTrainBase,
          nDeleted = 0L)))
    }

  // ---- training-corpus locator (_train_source_locator) ---------------------
  //
  // The frozen transforms (BPE tokenizer, classifier model) are
  // trained artifacts whose training corpus the artifact itself does
  // not carry — without a recorded locator, a staleness-flagged model
  // can only be QUEUED for manual retraining (q236's acted=0 row).
  // The locator is the ivfpq raw-pair pattern applied to transforms:
  // it names WHERE the training corpus lives (a parquet path) plus the
  // reproducible selection rule (a SQL predicate — the split rule the
  // day-0 training applied, e.g. the q190 train-split derivation), so
  // [[StoreRemediator.act]] can replay "read corpus, filter, retrain,
  // republish" end-to-end.
  //
  // LIVE-CORPUS SEMANTICS: the locator names a corpus LOCATION, not a
  // snapshot — at remediation time the retrain reads what is there
  // NOW, which is exactly the point (the model drifted because that
  // corpus grew). Pointing it at a foreign path retrains over that
  // path's rows; the predicate must not contain ';' (the sidecar field
  // separator — enforced at record time, not discovered at parse).

  private[llmops] val TrainSourceName = "_train_source_locator"

  /** Record the training-corpus locator: `corpusPath` (parquet) +
    * `where` (SQL predicate selecting the training rows; "true" for
    * the whole corpus).
    */
  private[llmops] def recordTrainSource(s: SparkSession, path: String,
      corpusPath: String, where: String): Unit = {
    require(!where.contains(";"),
      s"train-source predicate must not contain ';' (the sidecar " +
        s"field separator): [$where]")
    writeSidecar(s, path, TrainSourceName,
      s"v=1;kind=parquet;where=$where;path=$corpusPath")
  }

  /** The recorded (corpusPath, where) locator, if any. `path=` is the
    * LAST field and parsed to end-of-line, so corpus paths containing
    * ';' cannot corrupt the parse.
    */
  private[llmops] def trainSourceOf(s: SparkSession,
      path: String): Option[(String, String)] =
    readSidecar(s, path, TrainSourceName).flatMap { b =>
      val body = b.trim
      for {
        w <- "(^|;)where=([^;]*)".r.findFirstMatchIn(body).map(_.group(2))
        p <- "(^|;)path=(.*)$".r.findFirstMatchIn(body).map(_.group(2))
        if p.nonEmpty
      } yield (p, w)
    }

  // ---- occupancy-constant default k ----------------------------------------

  /** Default per-cell occupancy target for [[kFor]] — the value the
    * ScaleIndex occupancy-constant protocol measured as keeping the
    * cell-blocked pair space linear in n (SCALING.md round 12: at fixed
    * k an 8× corpus grows occupancy 8× and the occupancy-bounded costs
    * quadratically; k∝n restores the pair_space/n invariant).
    */
  val OccTarget = 256L

  /** Occupancy-constant cell count: k = max(4, ⌈n / occTarget⌉) — the
    * default-k path for the trained-store builders, so a 100 TB
    * operator gets the measured protocol without knowing it. Floor 4
    * keeps tiny corpora at the gate-pinned minimum cell count; the
    * Int.MaxValue clamp keeps the Long→Int cast from silently wrapping
    * at astronomically large n (at which point the caller should be
    * raising occTarget, not cell count).
    */
  def kFor(n: Long, occTarget: Long = OccTarget): Int =
    math.min(Int.MaxValue.toLong,
      math.max(4L, (n + occTarget - 1) / occTarget)).toInt

  /** The recorded k-selection policy's occupancy target, when it IS an
    * occupancy policy ("occ<target>" — what the auto-k builders
    * record); None for "explicit" and any other policy string.
    */
  private[llmops] def occTargetOf(kPolicy: String): Option[Long] =
    "^occ(\\d+)$".r.findFirstMatchIn(kPolicy)
      .flatMap(m => scala.util.Try(m.group(1).toLong).toOption)
      .filter(_ > 0)

  /** CRASH-STATE fixture (specs / gates / scale harnesses): simulate a
    * torn append by dropping one uncommitted file into the live
    * generation — exactly what a crash between the data write and the
    * manifest publish leaves behind. ONE definition so every consumer
    * injects the identical state the listing rules ([[listDataFiles]] /
    * [[verifiedDir]] / [[vacuumStore]]) detect: a plain data-looking
    * file (no `_`/`.` prefix), deterministic bytes, named to sort
    * last.
    */
  private[graft] def injectTornAppend(s: SparkSession,
      dataDir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dataDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(dataDir,
      "zzzz-torn-append.parquet"), true)
    out.write("torn-append".getBytes("UTF-8"))
    out.close()
  }

  private[llmops] def fsckStore(s: SparkSession, path: String,
      manifestName: String, configName: String,
      expectedConfig: Option[String], what: String): FsckReport = {
    val conf = s.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val config = readSidecar(s, path, configName)
    val matches = expectedConfig.flatMap(e => config.map(_.trim == e))
    val rootEntries =
      if (fs.exists(root)) fs.listStatus(root).toSeq else Seq.empty
    val temps = rootEntries.count { st =>
      st.isFile && st.getPath.getName.startsWith(".") &&
        st.getPath.getName.contains(".tmp.")
    }
    // a manifest that exists but does not PARSE is reported as absent
    // (manifestPresent=false): the store needs a rebuild either way,
    // and the audit must never throw — one corrupted store would
    // otherwise abort a whole StoreAudit sweep
    val parsed = readSidecar(s, path, manifestName).flatMap { m =>
      scala.util.Try {
        val lines = m.trim.split("\n").toSeq
        require(lines.head.startsWith("dir="), "missing dir= header")
        val subdir = lines.head.stripPrefix("dir=")
        val recorded = lines.tail.filter(_.nonEmpty).map { ln =>
          val i = ln.lastIndexOf(':')
          require(i > 0, s"malformed manifest line: $ln")
          (ln.substring(0, i), ln.substring(i + 1).toLong)
        }.toSet
        (subdir, recorded)
      }.toOption
    }
    val trainStats = readTrainStats(s, path)
    parsed match {
      case None =>
        FsckReport(what, path, config.isDefined, matches,
          manifestPresent = false, generation = -1, 0, 0L, 0, 0, 0, temps,
          trainStats)
      case Some((subdir, recorded)) =>
        val actual = listDataFiles(s, s"$path/$subdir")
        val gen = "-g(\\d+)$".r.findFirstMatchIn(subdir)
          .map(_.group(1).toInt).getOrElse(0)
        val base = "-g(\\d+)$".r.replaceAllIn(subdir, "")
        val genRe = s"^${java.util.regex.Pattern.quote(base)}-g\\d+$$".r
        val stale = rootEntries.count { st =>
          st.isDirectory && st.getPath.getName != subdir &&
            genRe.findFirstIn(st.getPath.getName).isDefined
        }
        FsckReport(what, path, config.isDefined, matches,
          manifestPresent = true, gen,
          recorded.size, recorded.map(_._2).sum,
          (actual -- recorded).size, (recorded -- actual).size,
          stale, temps, trainStats)
    }
  }
}

/** The persisted MinHash-LSH signature index behind incremental dedup
  * (q46's operational form). Layout at `path`:
  * `signatures-g<N>/` (doc_id, band, sig) parquet (current generation
  * named by `_dedup_index_manifest`) + `_dedup_index_config`.
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

  private val ManifestName = "_dedup_index_manifest"

  /** Crash recovery: remove provably-uncommitted garbage (torn-append
    * leftovers, superseded generations, orphaned sidecar temps) so the
    * committed store verifies and reads again — see
    * [[IndexMaintenance.vacuumStore]].
    */
  def vacuum(s: SparkSession, path: String): IndexMaintenance.VacuumReport =
    IndexMaintenance.vacuumWithTombstones(s, path, ManifestName, What)

  /** Non-throwing audit — see [[IndexMaintenance.fsckStore]]. */
  def fsck(s: SparkSession, path: String): IndexMaintenance.FsckReport =
    IndexMaintenance.fsckStore(s, path, ManifestName,
      "_dedup_index_config", Some(Config), What)
  private val What = "Dedup signature index"

  /** The manifest-verified current data directory (spec/harness use). */
  private[graft] def dataDir(s: SparkSession, path: String): String =
    IndexMaintenance.verifiedDir(s, path, ManifestName, What)

  /** Initial build: signatures of the accepted corpus, then the
    * manifest (committing the file set), then the config sidecar (the
    * "ingest complete" marker) — a crash anywhere mid-build reads as
    * missing-sidecar, never as a silently short index.
    */
  def build(docs: DataFrame, path: String): Unit = {
    val s = docs.sparkSession
    Dedup.bandSignaturesOf(docs)
      .write.mode("overwrite").parquet(s"$path/signatures-g0")
    IndexMaintenance.publishManifest(s, path, ManifestName,
      "signatures-g0")
    IndexMaintenance.writeSidecar(s, path, "_dedup_index_config", Config)
  }

  /** The stored signature table (config- AND manifest-verified: a torn
    * append fails descriptively here instead of being read), with
    * tombstoned docs MASKED — a deleted doc stops suppressing future
    * near-duplicates immediately, before any physical rewrite.
    */
  def signatures(s: SparkSession, path: String): DataFrame = {
    IndexMaintenance.requireConfig(s, path, "_dedup_index_config",
      Config, What)
    IndexMaintenance.minusTombstones(s, path, ManifestName, What,
      s.read.parquet(dataDir(s, path)), "doc_id")
  }

  /** DELETE docs from the index (takedown/opt-out): records
    * tombstones — every probe from this point treats the docs as
    * absent ([[signatures]] masks them) — and the next [[compact]]
    * drops their signature rows physically and clears the tombstones.
    * One manifested append, no data file touched.
    */
  def delete(docIds: DataFrame, path: String): Unit = {
    val s = docIds.sparkSession
    IndexMaintenance.requireConfig(s, path, "_dedup_index_config",
      Config, What)
    IndexMaintenance.addTombstones(s, path, ManifestName, What, docIds)
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

  private[llmops] def probeWithSigs(newDocs: DataFrame, newSigs: DataFrame,
      path: String): DataFrame = {
    val s = newDocs.sparkSession
    val idx = signatures(s, path)
      .select(col("doc_id").as("doc_e"), col("band"), col("sig"))
    // count DISTINCT bands, not join rows: a healthy index has one row
    // per (doc, band), but a replayed append could leave duplicate
    // signature rows, and a plain count would then inflate a 2-band
    // overlap past the >=MatchBands threshold (false drop)
    val dropped = newSigs.join(idx, Seq("band", "sig"))
      .groupBy(col("doc_id"), col("doc_e"))
      .agg(count_distinct(col("band")).as("n_bands"))
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
    val s = newDocs.sparkSession
    // refuse BEFORE any write — a late refusal would leave uncommitted
    // garbage inside a store other gates' oracles pin
    IndexMaintenance.requireMutable(s, path, "signature append")
    val newSigs = SessionScratch.transientCheckpoint(
      Dedup.bandSignaturesOf(newDocs))
    val survivors = SessionScratch.transientCheckpoint(
      probeWithSigs(newDocs, newSigs, path))
    // the probe above verified the manifest; resolve the committed
    // generation once, append the survivors' signatures into it, then
    // publish the widened manifest — the COMMIT of this append. A crash
    // between the parquet write and the publish leaves uncommitted
    // part-files that the next read rejects descriptively.
    val cur = dataDir(s, path)
    newSigs.join(survivors.select(col("doc_id")), Seq("doc_id"),
        "left_semi")
      .write.mode("append").parquet(cur)
    IndexMaintenance.publishManifest(s, path, ManifestName,
      cur.substring(path.length + 1))
    survivors
  }

  /** Compact the accumulated append files under the RECORDED config
    * (daily appends otherwise grow the file count forever): rewrite
    * into ~targetBytes files in the next generation directory, swap
    * atomically via the manifest, delete the old generation. Pending
    * tombstones ([[delete]]) are DROPPED physically during the rewrite
    * and then cleared — the probe answers identically before and after
    * (masked == dropped; IndexMaintenanceSpec proves both invariants),
    * and the config sidecar — the signature recipe — is untouched.
    */
  def compact(s: SparkSession, path: String,
      targetBytes: Long = 64L * 1024 * 1024): (Int, Int) = {
    IndexMaintenance.requireConfig(s, path, "_dedup_index_config",
      Config, What)
    val drop = IndexMaintenance.tombstoneDropper(s, path, ManifestName,
      What, "doc_id")
    val r = IndexMaintenance.compactStore(s, path, ManifestName, What,
      targetBytes, merge = drop)
    IndexMaintenance.clearTombstones(s, path, ManifestName)
    r
  }
}

/** The persisted FULL-TEXT (BM25) index — the retrieval family's
  * maintained artifact (q74's operational form, the same daily-crawl
  * story as [[DedupIndex]]): a 100 TB corpus cannot re-tokenize itself
  * per search, so the postings live on disk and arrivals append only
  * their own postings. Layout at `path`:
  * `postings-g<N>/` (doc_id, w, tf, dl) parquet (current generation
  * named by `_text_index_manifest`) + `_text_index_stats` (exact
  * integer corpus stats: n_docs, sum_dl — avgdl is DERIVED at query
  * time so one atomic sidecar publish keeps it consistent) +
  * `_text_index_config`.
  *
  * df is NOT materialized: it is an aggregate over the postings of the
  * QUERY terms only (the term filter pushes to the parquet scan), so
  * appends can never leave a stale document-frequency table — the
  * search recomputes df from the one source of truth at posting-list
  * cost, not corpus cost.
  *
  * Crash safety is the [[DedupIndex]] discipline with one more moving
  * part: append publishes postings files → stats sidecar → manifest,
  * in that order; a crash between ANY two steps leaves uncommitted
  * part-files that the manifest check rejects descriptively, so a
  * stats/postings mismatch can never be silently read.
  */
object TextIndex {

  /** Tokenizer + scoring recipe (the q74 contract): whitespace tokens
    * of trimmed text, rational BM25 idf (no log — see TextAnalysis),
    * k1=2.2 (as k1+1=2.2 numerator form), b=0.75.
    */
  val Config: String =
    "tok=whitespace-trim-split;score=bm25-rational;k1tf=2.2;b=0.75;v=1"

  private val ManifestName = "_text_index_manifest"

  /** Crash recovery: remove provably-uncommitted garbage (torn-append
    * leftovers, superseded generations, orphaned sidecar temps) so the
    * committed store verifies and reads again — see
    * [[IndexMaintenance.vacuumStore]].
    */
  def vacuum(s: SparkSession, path: String): IndexMaintenance.VacuumReport =
    IndexMaintenance.vacuumWithTombstones(s, path, ManifestName, What)

  /** Non-throwing audit — see [[IndexMaintenance.fsckStore]]. */
  def fsck(s: SparkSession, path: String): IndexMaintenance.FsckReport =
    IndexMaintenance.fsckStore(s, path, ManifestName,
      "_text_index_config", Some(Config), What)
  private val StatsName = "_text_index_stats"
  private val What = "Full-text BM25 index"

  /** The manifest-verified current postings directory. */
  private[graft] def dataDir(s: SparkSession, path: String): String =
    IndexMaintenance.verifiedDir(s, path, ManifestName, What)

  /** Postings of a documents frame: one row per (doc, term) with the
    * term frequency and the doc length — the single tokenize pass a
    * doc pays on ingest.
    */
  private def postingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        TextStats.nWords(col("text")).cast("long").as("dl"),
        explode(PortableHash.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), col("w"), col("tf"), col("dl"))

  /** (n_docs, sum_dl) of a documents frame — exact integers. */
  private def statsOf(docs: DataFrame): (Long, Long) = {
    val r = docs.agg(count(lit(1)),
      sum(TextStats.nWords(col("text")).cast("long"))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def writeStats(s: SparkSession, path: String,
      nDocs: Long, sumDl: Long, tombs: Option[String] = None): Unit =
    IndexMaintenance.writeSidecar(s, path, StatsName,
      s"n_docs=$nDocs;sum_dl=$sumDl" +
        tombs.map(t => s";tombs=$t").getOrElse(""))

  /** The recorded corpus stats (n_docs, sum_dl), VERIFIED against the
    * tombstone set: [[delete]] adjusts these stats in lockstep with
    * its tombstone publish and stamps the tombstone fingerprint into
    * the sidecar — a crash between the two writes leaves a live
    * tombstone manifest the stats never saw, which this read reports
    * descriptively (remediation: [[repairStats]]) instead of silently
    * scoring BM25 with a wrong N/avgdl. A fingerprint WITHOUT a
    * tombstone manifest is the benign post-compact crash window
    * (rows already dropped, stats already correct) and is accepted.
    */
  def stats(s: SparkSession, path: String): (Long, Long) = {
    val raw = IndexMaintenance.readSidecar(s, path, StatsName)
      .getOrElse(throw new IllegalStateException(
        s"$What at $path has no $StatsName sidecar — initial ingest " +
          "did not complete; rebuild the index."))
    val m = raw.trim.split(";").map { kv =>
      val Array(k, v) = kv.split("=", 2); k -> v
    }.toMap
    val current = IndexMaintenance.tombFingerprint(s, path, ManifestName)
    if (current.isDefined && !m.get("tombs").contains(current.get))
      throw new IllegalStateException(
        s"$What at $path has tombstones its stats sidecar never saw " +
          "(a delete crashed between the tombstone publish and the " +
          "stats adjustment) — BM25 would score with a wrong N/avgdl; " +
          "run TextIndex.repairStats to recompute them from the " +
          "masked postings.")
    (m("n_docs").toLong, m("sum_dl").toLong)
  }

  /** Crash remediation for a torn [[delete]]: recompute (n_docs,
    * sum_dl) from the MASKED postings and re-stamp the current
    * tombstone fingerprint. Caveat (documented, not silent): postings
    * carry only docs with >= 1 token, so empty-text docs drop out of
    * the recomputed n_docs — they can never match a term, but idf's N
    * shifts by the empty-doc count relative to a build-time stats
    * write.
    */
  def repairStats(s: SparkSession, path: String): (Long, Long) = {
    IndexMaintenance.requireConfig(s, path, "_text_index_config",
      Config, What)
    val perDoc = postings(s, path)
      .groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
    val r = perDoc.agg(count(lit(1)), sum(col("dl"))).head()
    val (n, dl) = (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    writeStats(s, path, n, dl,
      IndexMaintenance.tombFingerprint(s, path, ManifestName))
    (n, dl)
  }

  /** DELETE docs from the index (takedown/opt-out): tombstones mask
    * the postings immediately ([[postings]] anti-joins them, so df and
    * tf never count deleted docs), the BM25 corpus stats are adjusted
    * in the same operation (stamped with the tombstone fingerprint —
    * see [[stats]] for the crash contract), and the next [[compact]]
    * drops the posting rows physically. Ids not present in the index
    * (or already deleted) are ignored — stats are adjusted only by
    * what actually left the corpus.
    */
  def delete(docIds: DataFrame, path: String): Unit = {
    val s = docIds.sparkSession
    IndexMaintenance.requireConfig(s, path, "_text_index_config",
      Config, What)
    val ids = docIds.toDF("id").select(col("id").cast("long"))
    // effective set: present in the (already-masked) postings —
    // CHECKPOINTED so the stats rollup and the tombstone write share
    // one postings scan instead of re-running the lineage twice (the
    // dedupIngest discipline). Caveat shared with [[repairStats]]: a
    // doc whose text trims to ZERO tokens has no posting rows, so it
    // can neither be tombstoned nor decrement n_docs here — it also
    // can never match a term, but idf's N keeps counting it until a
    // rebuild; takedown feeds for such docs are a corpus-side concern.
    val eff = SessionScratch.transientCheckpoint(
      postings(s, path)
        .join(ids, col("doc_id") === col("id"), "left_semi")
        .groupBy(col("doc_id")).agg(max(col("dl")).as("dl")))
    val r = eff.agg(count(lit(1)), sum(col("dl"))).head()
    val (nDel, dlDel) =
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    if (nDel > 0) {
      val (n0, dl0) = stats(s, path)
      IndexMaintenance.addTombstones(s, path, ManifestName, What,
        eff.select(col("doc_id")))
      writeStats(s, path, n0 - nDel, dl0 - dlDel,
        IndexMaintenance.tombFingerprint(s, path, ManifestName))
    }
  }

  /** Initial build: postings, stats, manifest, config — config last as
    * the ingest-complete marker.
    */
  def build(docs: DataFrame, path: String): Unit = {
    val s = docs.sparkSession
    postingsOf(docs).write.mode("overwrite").parquet(s"$path/postings-g0")
    val (n, dl) = statsOf(docs)
    writeStats(s, path, n, dl)
    IndexMaintenance.publishManifest(s, path, ManifestName, "postings-g0")
    IndexMaintenance.writeSidecar(s, path, "_text_index_config", Config)
  }

  /** The stored postings (config- and manifest-verified), with
    * tombstoned docs MASKED — so search's tf rows AND its df aggregate
    * never count a deleted doc.
    */
  def postings(s: SparkSession, path: String): DataFrame = {
    IndexMaintenance.requireConfig(s, path, "_text_index_config",
      Config, What)
    IndexMaintenance.minusTombstones(s, path, ManifestName, What,
      s.read.parquet(dataDir(s, path)), "doc_id")
  }

  /** MAINTENANCE: tokenize ONLY the new docs, append their postings,
    * fold their counts into the stats, publish the manifest (the
    * commit). Cost shape: one delta scan + delta-sized hash-agg +
    * append; the corpus postings are never read or rewritten.
    */
  def append(newDocs: DataFrame, path: String): Unit = {
    val s = newDocs.sparkSession
    IndexMaintenance.requireConfig(s, path, "_text_index_config",
      Config, What)
    IndexMaintenance.requireMutable(s, path, "postings append")
    val cur = dataDir(s, path)
    val (n0, dl0) = stats(s, path)
    postingsOf(newDocs).write.mode("append").parquet(cur)
    val (n1, dl1) = statsOf(newDocs)
    writeStats(s, path, n0 + n1, dl0 + dl1)
    IndexMaintenance.publishManifest(s, path, ManifestName,
      cur.substring(path.length + 1))
  }

  /** BM25 search off the MAINTAINED index — q74's exact scoring
    * (rational idf, fixed-order per-term sum) with tf/dl read from the
    * postings (term filter PUSHED to the parquet scan), df aggregated
    * from those same posting lists, and n_docs/avgdl from the recorded
    * stats. Returns the top-`topk` (doc_id, score).
    */
  def search(s: SparkSession, path: String, terms: Seq[String],
      topk: Int = 15): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val (nDocs, sumDl) = stats(s, path)
    val avgdl = sumDl.toDouble / nDocs
    val p = postings(s, path).filter(col("w").isin(terms: _*))
    val df = p.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val scored = p
      .join(broadcast(df), Seq("w"))
      .withColumn("idf",
        ((lit(nDocs) - col("df")).cast(DoubleType) + lit(0.5)) /
          (col("df").cast(DoubleType) + lit(0.5)))
      .withColumn("tfn",
        (col("tf").cast(DoubleType) * lit(2.2)) /
          (col("tf").cast(DoubleType) + lit(1.2) *
            (lit(0.25) + lit(0.75) *
              (col("dl").cast(DoubleType) / lit(avgdl)))))
      .withColumn("c", col("idf") * col("tfn"))
    val termAggs = terms.map(tm =>
      max(when(col("w") === tm, col("c"))).as(s"c_$tm"))
    scored.groupBy(col("doc_id"))
      .agg(termAggs.head, termAggs.tail: _*)
      .select(col("doc_id") +: terms.map(tm =>
        coalesce(col(s"c_$tm"), lit(0.0)).as(s"s_$tm")): _*)
      .withColumn("score",
        terms.map(tm => col(s"s_$tm")).reduceLeft(_ + _))
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topk)
  }

  /** Compact the accumulated posting appends (config preserved, atomic
    * manifest swap — see [[DedupIndex.compact]]). Pending tombstones
    * are dropped physically and cleared; the stats NUMBERS are already
    * correct (adjusted at delete time), so only the fingerprint stamp
    * is stripped.
    */
  def compact(s: SparkSession, path: String,
      targetBytes: Long = 64L * 1024 * 1024): (Int, Int) = {
    IndexMaintenance.requireConfig(s, path, "_text_index_config",
      Config, What)
    val (n0, dl0) = stats(s, path)
    val drop = IndexMaintenance.tombstoneDropper(s, path, ManifestName,
      What, "doc_id")
    val r = IndexMaintenance.compactStore(s, path, ManifestName, What,
      targetBytes, merge = drop)
    IndexMaintenance.clearTombstones(s, path, ManifestName)
    writeStats(s, path, n0, dl0)
    r
  }
}

/** The persisted bigram language model behind q76's quality scoring —
  * the LOG-STRUCTURED member of the maintained-index family. Its state
  * is ADDITIVE (bigram counts), so maintenance uses the LSM pattern
  * the other stores don't need: appends land the DELTA's partial
  * counts as new rows (the same int64 gh may appear in many files),
  * every read MERGES partials with one hash-agg on the 8-byte key, and
  * compaction is the LSM merge step — it aggregates the partials down
  * to one row per gh while swapping generations atomically. Layout at
  * `path`: `counts-g<N>/` (gh, freq) partial rows + manifest + config.
  *
  * The read-side merge is why correctness survives any append
  * interleaving: addition is associative/commutative, so partials in
  * any file arrangement aggregate to the same model — and the q186
  * gate requires the maintained model to reproduce q76's from-scratch
  * computation bit-exactly.
  */
object NgramIndex {

  /** The counting recipe (q76's): whitespace tokens of trimmed text,
    * per-token charpoly hash, positional 2-gram span hash.
    */
  val Config: String =
    "tok=whitespace-trim-split;tokhash=charpoly-1000000007;" +
      "span=positional-2gram;v=1"

  private val ManifestName = "_ngram_index_manifest"

  /** Crash recovery: remove provably-uncommitted garbage (torn-append
    * leftovers, superseded generations, orphaned sidecar temps) so the
    * committed store verifies and reads again — see
    * [[IndexMaintenance.vacuumStore]].
    */
  def vacuum(s: SparkSession, path: String): IndexMaintenance.VacuumReport =
    IndexMaintenance.vacuumWithTombstones(s, path, ManifestName, What)

  /** Non-throwing audit — see [[IndexMaintenance.fsckStore]]. */
  def fsck(s: SparkSession, path: String): IndexMaintenance.FsckReport =
    IndexMaintenance.fsckStore(s, path, ManifestName,
      "_ngram_index_config", Some(Config), What)
  private val What = "Bigram LM index"

  /** The manifest-verified current counts directory. */
  private[graft] def dataDir(s: SparkSession, path: String): String =
    IndexMaintenance.verifiedDir(s, path, ManifestName, What)

  /** (gh, freq) partial counts of a documents frame — q76's bigram
    * pipeline ending at the count aggregation.
    */
  private def bigramCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), PortableHash.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(PortableHash.spanHashes(
        PortableHash.tokenHashes(col("ws")), 2)).as("gh"))
      .groupBy(col("gh")).agg(count(lit(1)).as("freq"))

  def build(docs: DataFrame, path: String): Unit = {
    val s = docs.sparkSession
    bigramCounts(docs).write.mode("overwrite").parquet(s"$path/counts-g0")
    IndexMaintenance.publishManifest(s, path, ManifestName, "counts-g0")
    IndexMaintenance.writeSidecar(s, path, "_ngram_index_config", Config)
  }

  /** MAINTENANCE: count ONLY the new docs' bigrams and append the
    * partial rows — delta-sized, commutative, never reads the corpus
    * counts.
    */
  def append(newDocs: DataFrame, path: String): Unit = {
    val s = newDocs.sparkSession
    IndexMaintenance.requireConfig(s, path, "_ngram_index_config",
      Config, What)
    IndexMaintenance.requireMutable(s, path, "bigram append")
    val cur = dataDir(s, path)
    bigramCounts(newDocs).write.mode("append").parquet(cur)
    IndexMaintenance.publishManifest(s, path, ManifestName,
      cur.substring(path.length + 1))
  }

  /** The MERGED model: partials aggregated to one (gh, freq) per gh —
    * the read-side LSM merge (config- and manifest-verified). Keys
    * whose partials annihilate to zero (fully [[delete]]d bigrams) are
    * dropped here, exactly as a rebuild without those docs would never
    * produce them — a zero-count row left in would still match the
    * score join and skew n_bigrams.
    */
  def lm(s: SparkSession, path: String): DataFrame = {
    IndexMaintenance.requireConfig(s, path, "_ngram_index_config",
      Config, What)
    s.read.parquet(dataDir(s, path))
      .groupBy(col("gh")).agg(sum(col("freq")).as("freq"))
      .filter(col("freq") > 0)
  }

  /** DELETE docs from the model — the LSM ANTI-RECORD: the additive
    * store needs no tombstones, a delete is the NEGATED partial counts
    * of the deleted docs appended like any other delta. Reads merge
    * them away immediately; compaction annihilates them physically.
    * Contract: `docs` must be rows that were indexed (build/append)
    * exactly once — negating never-indexed text corrupts the counts
    * (the additive store has no membership to check against; the
    * takedown feed carries the stored rows by construction).
    */
  def delete(docs: DataFrame, path: String): Unit = {
    val s = docs.sparkSession
    IndexMaintenance.requireConfig(s, path, "_ngram_index_config",
      Config, What)
    val cur = dataDir(s, path)
    bigramCounts(docs)
      .select(col("gh"), (-col("freq")).as("freq"))
      .write.mode("append").parquet(cur)
    IndexMaintenance.publishManifest(s, path, ManifestName,
      cur.substring(path.length + 1))
  }

  /** q76's per-document quality scores computed against the MAINTAINED
    * model: the scored docs' bigrams re-derive at query time (a pure
    * map stage), the model side comes off the counts store.
    */
  def score(docs: DataFrame, path: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val s = docs.sparkSession
    val bigrams = docs
      .select(col("doc_id"), PortableHash.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(PortableHash.spanHashes(
        PortableHash.tokenHashes(col("ws")), 2)).as("gh"))
    bigrams.join(lm(s, path), Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("freq")).as("sum_freq"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_freq"),
        (col("sum_freq").cast(DoubleType) /
          col("n_bigrams").cast(DoubleType)).as("avg_freq"))
      .orderBy(col("doc_id"))
  }

  /** The LSM MERGE compaction: aggregate the partial rows down to one
    * per gh into generation N+1 (atomic manifest swap). Reads answer
    * identically before and after because they always merge; what
    * changes is the stored row count (and with it every future read's
    * merge cost).
    */
  def compact(s: SparkSession, path: String,
      targetBytes: Long = 64L * 1024 * 1024): (Int, Int) = {
    IndexMaintenance.requireConfig(s, path, "_ngram_index_config",
      Config, What)
    IndexMaintenance.compactStore(s, path, ManifestName, What,
      targetBytes,
      merge = Some(df =>
        df.groupBy(col("gh")).agg(sum(col("freq")).as("freq"))
          .filter(col("freq") > 0)))
  }
}

/** The persisted BPE tokenizer MODEL — the trained-artifact member of
  * the maintained family (the indexes hold derived DATA; this holds a
  * trained TRANSFORM). A production tokenizer is trained once on a
  * frozen corpus snapshot and then applied, fixed, to every later
  * batch — retraining per batch would silently change every token id
  * downstream — so the artifact is IMMUTABLE: no append path exists by
  * design, and "maintenance" is an explicit retrain + republish (a new
  * model version), exactly like the IVF centroids. Layout at `path`:
  * `merges-g0/` (merge_rank, lhs, rhs, cnt) parquet + manifest +
  * `_bpe_model_config` recording the training recipe; a load under a
  * drifted recipe (different round count, segmentation, or tie-break)
  * fails descriptively instead of producing a tokenizer that encodes
  * differently than the recorded training did.
  */
object BpeModel {

  /** The training recipe (Bpe.trainOn's contract): Sennrich-style
    * greedy merges, [[Bpe.Rounds]] rounds, non-letter word split,
    * count-desc/lhs/rhs tie-break.
    */
  val Config: String =
    s"algo=bpe-greedy-merge;rounds=${Bpe.Rounds};wordsplit=nonletter;" +
      "tiebreak=cnt-desc-lhs-rhs;sep=u001f;eow=underscore;v=1"

  private val ManifestName = "_bpe_model_manifest"

  /** Crash recovery: remove provably-uncommitted garbage (torn-append
    * leftovers, superseded generations, orphaned sidecar temps) so the
    * committed store verifies and reads again — see
    * [[IndexMaintenance.vacuumStore]].
    */
  def vacuum(s: SparkSession, path: String): IndexMaintenance.VacuumReport =
    IndexMaintenance.vacuumWithTombstones(s, path, ManifestName, What)

  /** Non-throwing audit — see [[IndexMaintenance.fsckStore]]. */
  def fsck(s: SparkSession, path: String): IndexMaintenance.FsckReport =
    IndexMaintenance.fsckStore(s, path, ManifestName,
      "_bpe_model_config", Some(Config), What)
  private val What = "BPE tokenizer model"

  /** Persist a trained merge table: merges parquet, manifest, config —
    * config last as the publish-complete marker (the index-build
    * discipline; a crash mid-save reads as missing-config, never as a
    * silently short merge table).
    *
    * `nTrain` is the training-corpus DOC count, recorded as
    * `_train_stats` provenance (round-13 verdict #3: the frozen
    * transforms drift too — a tokenizer trained on last month's corpus
    * silently shifts every downstream token id as the corpus grows,
    * and without provenance the q230 staleness sweep could never flag
    * it). The transform has no trained cell count, so k=0 and the
    * 39·k floor is vacuous; the staleness rule needs only
    * n_train/n_appended.
    */
  def save(s: SparkSession, trained: Bpe.Trained, path: String,
      nTrain: Long): Unit = {
    import s.implicits._
    trained.merges.toDF()
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/merges-g0")
    IndexMaintenance.publishManifest(s, path, ManifestName, "merges-g0")
    IndexMaintenance.writeTrainStats(s, path, nTrain, k = 0,
      kPolicy = "n/a")
    IndexMaintenance.writeSidecar(s, path, "_bpe_model_config", Config)
  }

  /** The day-2 APPLICATION record — the frozen transform's append
    * analog (round-13 verdict #3): an index append physically grows
    * the store, but applying a frozen tokenizer to an arriving batch
    * leaves the artifact byte-identical while the world it was trained
    * on grows — exactly the drift the staleness rule thresholds on.
    * Call once per applied batch with the batch's doc count (the q187
    * day-2 cadence); [[IndexMaintenance.bumpAppended]]'s single-writer
    * and crash-direction contracts apply unchanged.
    */
  def noteApplied(s: SparkSession, path: String, nDocs: Long): Unit =
    IndexMaintenance.bumpAppended(s, path, nDocs)

  /** Record where this model's training corpus lives (parquet path +
    * the train-split predicate — the reproducible recipe day-0
    * training applied), enabling [[StoreRemediator.act]]'s bpe arm:
    * a staleness-flagged model with a locator auto-retrains under the
    * recorded recipe and republishes; without one it stays a
    * manual-action-queue row (see
    * [[IndexMaintenance.recordTrainSource]]).
    */
  def recordTrainSource(s: SparkSession, path: String,
      corpusPath: String, where: String): Unit =
    IndexMaintenance.recordTrainSource(s, path, corpusPath, where)

  /** The recorded (corpusPath, wherePredicate) locator, if any. */
  private[llmops] def trainSourceOf(s: SparkSession,
      path: String): Option[(String, String)] =
    IndexMaintenance.trainSourceOf(s, path)

  /** MAINTENANCE — the explicit retrain + republish this immutable
    * artifact prescribes (the IVF-centroid contract: no append path;
    * a new model is a new VERSION). The retrained merge table is
    * written into generation N+1 and the manifest swapped atomically
    * (the [[IndexMaintenance.compactStore]] discipline): a loader that
    * read before the swap saw a complete old model, one that reads
    * after sees a complete new one, and a crash before the manifest
    * publish leaves the OLD model live — never a mixed or partial
    * table. The recorded training recipe must match (republish is a
    * retrain under the SAME recipe; a recipe change is a different
    * model and belongs at a different path).
    */
  def republish(s: SparkSession, trained: Bpe.Trained,
      path: String, nTrain: Long): Unit = {
    IndexMaintenance.requireConfig(s, path, "_bpe_model_config",
      Config, What)
    IndexMaintenance.requireMutable(s, path, "model republish")
    val cur = IndexMaintenance.verifiedDir(s, path, ManifestName, What)
    val curSub = cur.substring(path.length + 1)
    val gen = "-g(\\d+)$".r.findFirstMatchIn(curSub)
      .map(_.group(1).toInt).getOrElse(0)
    val nextSub = s"merges-g${gen + 1}"
    import s.implicits._
    trained.merges.toDF()
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$nextSub")
    IndexMaintenance.publishManifest(s, path, ManifestName, nextSub)
    // a retrain consumes all prior applications by definition — fresh
    // provenance, n_appended reset (the index-republish contract)
    IndexMaintenance.writeTrainStats(s, path, nTrain, k = 0,
      kPolicy = "n/a")
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(cur), true)
  }

  /** Load the merge table (config- and manifest-verified, then
    * structurally verified: exactly [[Bpe.Rounds]] merges with ranks
    * 1..Rounds — a truncated or doubled table fails descriptively).
    * Rounds-bounded collect; the result feeds [[Bpe.encodeWord]]'s
    * chained-replace projection, so applying a persisted model is
    * still zero joins and zero shuffles.
    */
  def load(s: SparkSession, path: String): Seq[Bpe.Merge] = {
    IndexMaintenance.requireConfig(s, path, "_bpe_model_config",
      Config, What)
    val dir = IndexMaintenance.verifiedDir(s, path, ManifestName, What)
    import s.implicits._
    val ms = s.read.parquet(dir).as[Bpe.Merge].collect()
      .sortBy(_.merge_rank).toSeq
    if (ms.map(_.merge_rank) != (1L to Bpe.Rounds.toLong))
      throw new IllegalStateException(
        s"$What at $path stores merge ranks " +
          s"[${ms.map(_.merge_rank).mkString(",")}] but the recorded " +
          s"config requires exactly 1..${Bpe.Rounds} — the merge table " +
          "is truncated or doubled; republish the model.")
    ms
  }
}

/** The persisted quality-classifier MODEL — the second trained-TRANSFORM
  * member of the maintained family (with [[BpeModel]]): q176's
  * distilled student is a ≤(buckets+1)-row integer weight table, and
  * production scores every later batch with a FROZEN snapshot of it —
  * retraining per batch would shift the keep/drop boundary under the
  * pipeline silently. Same contract as the BPE model: IMMUTABLE, no
  * append path; maintenance is retrain + [[republish]] (atomic
  * generation swap). Layout at `path`: `weights-g<N>/` (b, w) parquet +
  * manifest + `_clf_model_config` recording the training recipe;
  * config written LAST as the publish-complete marker.
  */
object ClfModel {

  /** The training recipe ([[Curation.trainClassifierOn]]'s contract):
    * teacher-labeled batch perceptron, integer power-of-two step decay,
    * hashed unigram+bigram+bias features.
    */
  val Config: String =
    s"algo=batch-perceptron;rounds=${Curation.ClfRounds};" +
      s"step=pow2-decay;teacher=hash-linear;margin=${Curation.MarginMin};" +
      s"buckets=${Curation.ClfBuckets};features=uni+bi+bias;v=1"

  private val ManifestName = "_clf_model_manifest"

  /** Crash recovery: remove provably-uncommitted garbage (torn-append
    * leftovers, superseded generations, orphaned sidecar temps) so the
    * committed store verifies and reads again — see
    * [[IndexMaintenance.vacuumStore]].
    */
  def vacuum(s: SparkSession, path: String): IndexMaintenance.VacuumReport =
    IndexMaintenance.vacuumWithTombstones(s, path, ManifestName, What)

  /** Non-throwing audit — see [[IndexMaintenance.fsckStore]]. */
  def fsck(s: SparkSession, path: String): IndexMaintenance.FsckReport =
    IndexMaintenance.fsckStore(s, path, ManifestName,
      "_clf_model_config", Some(Config), What)
  private val What = "classifier model"

  /** Persist a trained weight table (the [[BpeModel.save]] discipline:
    * weights → manifest → config last). `nTrain` is the training-corpus
    * doc count, recorded as `_train_stats` provenance so the q230
    * staleness sweep can flag a scorer whose keep/drop boundary was
    * trained on a corpus the pipeline has since outgrown (see
    * [[BpeModel.save]]).
    */
  def save(s: SparkSession, w: DataFrame, path: String,
      nTrain: Long): Unit = {
    w.select(col("b"), col("w"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/weights-g0")
    IndexMaintenance.publishManifest(s, path, ManifestName, "weights-g0")
    IndexMaintenance.writeTrainStats(s, path, nTrain, k = 0,
      kPolicy = "n/a")
    IndexMaintenance.writeSidecar(s, path, "_clf_model_config", Config)
  }

  /** The day-2 application record — [[BpeModel.noteApplied]]'s contract
    * for the frozen scorer: call once per scored batch with its doc
    * count.
    */
  def noteApplied(s: SparkSession, path: String, nDocs: Long): Unit =
    IndexMaintenance.bumpAppended(s, path, nDocs)

  /** Record where this model's training corpus lives — see
    * [[BpeModel.recordTrainSource]] (the clf arm retrains via
    * [[Curation.trainClassifierOn]] over the located rows).
    */
  def recordTrainSource(s: SparkSession, path: String,
      corpusPath: String, where: String): Unit =
    IndexMaintenance.recordTrainSource(s, path, corpusPath, where)

  /** The recorded (corpusPath, wherePredicate) locator, if any. */
  private[llmops] def trainSourceOf(s: SparkSession,
      path: String): Option[(String, String)] =
    IndexMaintenance.trainSourceOf(s, path)

  /** MAINTENANCE — retrain + republish into generation N+1 with an
    * atomic manifest swap (the [[BpeModel.republish]] contract: a torn
    * republish leaves the OLD model live; a loader never sees a mixed
    * weight table).
    */
  def republish(s: SparkSession, w: DataFrame, path: String,
      nTrain: Long): Unit = {
    IndexMaintenance.requireConfig(s, path, "_clf_model_config",
      Config, What)
    IndexMaintenance.requireMutable(s, path, "model republish")
    val cur = IndexMaintenance.verifiedDir(s, path, ManifestName, What)
    val curSub = cur.substring(path.length + 1)
    val gen = "-g(\\d+)$".r.findFirstMatchIn(curSub)
      .map(_.group(1).toInt).getOrElse(0)
    val nextSub = s"weights-g${gen + 1}"
    w.select(col("b"), col("w"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$nextSub")
    IndexMaintenance.publishManifest(s, path, ManifestName, nextSub)
    // fresh provenance — a retrain consumes all prior applications
    IndexMaintenance.writeTrainStats(s, path, nTrain, k = 0,
      kPolicy = "n/a")
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(cur), true)
  }

  /** Load the weight table (config- and manifest-verified, then
    * structurally verified: every bucket id within [0, buckets] — the
    * bias bucket is `buckets` itself — and no duplicate rows per
    * bucket; a foreign or doubled table fails descriptively). The
    * result is the ≤(buckets+1)-row broadcast side of inference — a
    * bounded read, exactly like the IVF centroid pull.
    */
  def load(s: SparkSession, path: String): DataFrame = {
    IndexMaintenance.requireConfig(s, path, "_clf_model_config",
      Config, What)
    val dir = IndexMaintenance.verifiedDir(s, path, ManifestName, What)
    val w = s.read.parquet(dir).select(col("b"), col("w"))
    val bad = w.filter(col("b") < 0 ||
      col("b") > Curation.ClfBuckets).count()
    val dup = w.groupBy(col("b")).count().filter(col("count") > 1).count()
    if (bad > 0 || dup > 0)
      throw new IllegalStateException(
        s"$What at $path fails the structural check: $bad weight row(s) " +
          s"outside bucket range [0, ${Curation.ClfBuckets}], $dup " +
          "duplicated bucket(s) — the weight table is foreign or " +
          "doubled; republish the model.")
    w
  }
}

/** The persisted IVF ANN index behind q54's operational form. Layout at
  * `path`: `centroids/` (cell, centroid) + `assignments-g<N>/`
  * (member_id, cell, em) parquet (current generation named by
  * `_ivf_index_manifest`) + `_ivf_index_config`.
  */
object IvfIndex {

  /** Lloyd iterations at initial training (the q52/q54 recipe). */
  val Iters = 2

  private def config(k: Int): String =
    s"kind=ivf-spherical-kmeans;k=$k;iters=$Iters;fixed_point=1e7;" +
      "seed=first-k-by-id;v=1"

  private def centDir(path: String) = s"$path/centroids"
  private val ManifestName = "_ivf_index_manifest"

  /** Crash recovery: remove provably-uncommitted garbage (torn-append
    * leftovers, superseded generations, orphaned sidecar temps) so the
    * committed store verifies and reads again — see
    * [[IndexMaintenance.vacuumStore]].
    */
  def vacuum(s: SparkSession, path: String): IndexMaintenance.VacuumReport =
    IndexMaintenance.vacuumWithTombstones(s, path, ManifestName, What)

  /** Non-throwing audit — see [[IndexMaintenance.fsckStore]]. The
    * recipe is parametric in k, so the expected config is re-derived
    * from the RECORDED k (drift in any other recipe field still
    * reports configMatches=false; an unparseable sidecar reports None).
    */
  def fsck(s: SparkSession, path: String): IndexMaintenance.FsckReport = {
    val expected = IndexMaintenance
      .readSidecar(s, path, "_ivf_index_config")
      .flatMap(r => "k=(\\d+)".r.findFirstMatchIn(r)
        .map(m => config(m.group(1).toInt)))
    IndexMaintenance.fsckStore(s, path, ManifestName,
      "_ivf_index_config", expected, What)
  }
  private val What = "IVF index"

  /** The manifest-verified current assignment directory. */
  private[graft] def dataDir(s: SparkSession, path: String): String =
    IndexMaintenance.verifiedDir(s, path, ManifestName, What)

  /** The indexed member rows (member_id, cell, em) with tombstoned
    * members MASKED — THE read surface for every consumer (search,
    * semantic probe, cross-store refine, label propagation): a deleted
    * member neither appears in results nor suppresses new arrivals,
    * before any physical rewrite. Reading `dataDir` parquet directly
    * bypasses deletes and is reserved for specs/harnesses.
    */
  def members(s: SparkSession, path: String): DataFrame =
    IndexMaintenance.minusTombstones(s, path, ManifestName, What,
      s.read.parquet(dataDir(s, path)), "member_id")

  /** DELETE vectors from the index (the FAISS remove_ids contract,
    * tombstone form): one manifested tombstone append; [[members]]
    * masks the rows immediately and the next [[compact]] drops them
    * physically. Centroids are untouched — deletes never retrain (the
    * remediation for drift remains [[republish]]).
    */
  def delete(vecIds: DataFrame, path: String): Unit = {
    val s = vecIds.sparkSession
    IndexMaintenance.requireConfig(s, path, "_ivf_index_config",
      config(recordedKOf(s, path)), What)
    IndexMaintenance.addTombstones(s, path, ManifestName, What, vecIds)
  }

  private[llmops] def recordedKOf(s: SparkSession, path: String): Int =
    IndexMaintenance.readSidecar(s, path, "_ivf_index_config")
      .flatMap(c => ";k=(\\d+);".r.findFirstMatchIn(c)
        .map(_.group(1).toInt))
      .getOrElse(0)

  /** Initial build: train k centroids on the corpus (the expensive,
    * corpus-sized step), persist centroids AND the corpus assignment
    * table (manifested, so torn appends are detectable), record the
    * config last — the "ingest complete" marker. After this, appends
    * never retrain.
    */
  def build(embeddings: DataFrame, path: String, k: Int): Unit =
    buildImpl(embeddings, path, k, "explicit")

  /** Auto-k build: k = [[IndexMaintenance.kFor]](n) — the measured
    * occupancy-constant protocol as the default, so the caller never
    * has to know it (the one extra cost is the count that sizes k,
    * paid once per build). The chosen policy lands in `_train_stats`.
    */
  def build(embeddings: DataFrame, path: String): Unit =
    buildImpl(embeddings, path,
      IndexMaintenance.kFor(embeddings.count()),
      s"occ${IndexMaintenance.OccTarget}")

  private def buildImpl(embeddings: DataFrame, path: String, k: Int,
      kPolicy: String): Unit = {
    val s = embeddings.sparkSession
    import s.implicits._
    val (cents, nTrain) =
      KMeans.fitStats(s, embeddings, k = k, iters = Iters)
    cents.map(c => (c.cell, c.centroid.toSeq)).toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(centDir(path))
    KMeans.assign(embeddings, cents)
      .select(col("vec_id").as("member_id"), col("cell"),
        col("embedding").as("em"))
      .write.mode("overwrite").parquet(s"$path/assignments-g0")
    IndexMaintenance.publishManifest(s, path, ManifestName,
      "assignments-g0")
    IndexMaintenance.writeTrainStats(s, path, nTrain, k, kPolicy)
    IndexMaintenance.writeSidecar(s, path, "_ivf_index_config", config(k))
  }

  /** MAINTENANCE — drift remediation (the q171-monitor → rebuild arm),
    * IN PLACE and crash-detectably. Rebuilding a LIVE index by calling
    * [[build]] directly is silently dangerous: the old config sidecar
    * stays valid throughout, so a mid-rebuild crash can pair NEW
    * centroids with OLD assignments and search returns wrong rows with
    * no signal. republish RETRACTS the config first — from that moment
    * every read path fails with the descriptive rebuild error — then
    * delegates to build(), whose final config publish is the
    * "ingest complete" marker that puts the index back online. Any
    * crash in between leaves a config-less store: detected, never
    * silently absorbed.
    */
  def republish(embeddings: DataFrame, path: String, k: Int): Unit = {
    val s = embeddings.sparkSession
    // pinned-k contract only — liveness (config presence + full recipe
    // match) is verified ONCE, inside republishAs, against the record
    val rec = recordedKOf(s, path)
    if (rec != 0 && k != rec)
      throw new IllegalStateException(
        s"republish at k=$k does not match the recorded k=$rec at " +
          s"$path — a caller-driven republish keeps the store's shape " +
          "(rebuild at a new path, or use the remediator's occupancy " +
          "policy, for a shape change).")
    republishAs(embeddings, path, k, "explicit")
  }

  /** Policy-aware drift remediation — the [[republish]] discipline with
    * the rebuild shape chosen by the CALLER'S policy decision instead
    * of pinned to the recorded k: liveness is verified against the
    * store's OWN recorded config (the new k may legitimately differ —
    * an occupancy-policy store re-sizes k to the corpus it now holds),
    * and the recorded `k_policy` is whatever the caller passes, so an
    * auto-k store remediated by [[StoreRemediator]] keeps its policy
    * instead of silently becoming 'explicit' at a pinned k (which
    * would recreate the quadratic fixed-k regime SCALING.md measured).
    */
  private[llmops] def republishAs(embeddings: DataFrame, path: String,
      k: Int, kPolicy: String): Unit = {
    val s = embeddings.sparkSession
    IndexMaintenance.requireConfig(s, path, "_ivf_index_config",
      config(recordedKOf(s, path)), What)
    // refuse BEFORE the config retraction — a late refusal would take
    // a read-only shared store OFFLINE
    IndexMaintenance.requireMutable(s, path, "republish")
    val stale = IndexMaintenance.verifiedDir(s, path, ManifestName, What)
    IndexMaintenance.retractSidecar(s, path, "_ivf_index_config")
    // a rebuild indexes exactly the corpus it is handed — pending
    // tombstones are moot once the old rows are gone
    IndexMaintenance.clearTombstones(s, path, ManifestName)
    buildImpl(embeddings, path, k, kPolicy)
    // the rebuilt index lives at assignments-g0 again; a post-compaction
    // generation left behind by the old index is unreferenced garbage
    if (!stale.endsWith("/assignments-g0")) {
      val p = new org.apache.hadoop.fs.Path(stale)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** The recorded centroids (k-bounded collect). Config-verified FIRST:
    * the sidecar is read and checked before the centroid parquet is
    * touched, so a missing or half-written index fails with the
    * descriptive rebuild error, not a raw path/analysis error — and the
    * expected k comes from the RECORD, which the stored table must then
    * match (previously k was derived from the stored row count, so a
    * truncated centroid table would have self-certified).
    */
  def centroids(s: SparkSession, path: String): Seq[KMeans.Centroid] = {
    import s.implicits._
    val k = IndexMaintenance.readSidecar(s, path, "_ivf_index_config")
      .flatMap(c => ";k=(\\d+);".r.findFirstMatchIn(c).map(_.group(1).toInt))
      .getOrElse(0)
    IndexMaintenance.requireConfig(s, path, "_ivf_index_config",
      config(k), "IVF index")
    val cents = s.read.parquet(centDir(path))
      .select(col("cell"), col("centroid"))
      .as[(Long, Seq[Double])]
      .collect()
      .map { case (cell, v) => KMeans.Centroid(cell, v.toArray) }
      .toSeq
    if (cents.size != k)
      throw new IllegalStateException(
        s"IVF index at $path records k=$k in its sidecar but stores " +
          s"${cents.size} centroids — the centroid table is truncated or " +
          "foreign; rebuild the index.")
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
    IndexMaintenance.requireMutable(s, path, "vector append")
    val cents = centroids(s, path)
    val cur = dataDir(s, path)
    // checkpointed so the provenance count and the write share ONE
    // evaluation of the delta's upstream lineage
    val assigned = SessionScratch.transientCheckpoint(
      KMeans.assign(newVecs, cents)
        .select(col("vec_id").as("member_id"), col("cell"),
          col("embedding").as("em")))
    val nDelta = assigned.count()
    assigned.write.mode("append").parquet(cur)
    // provenance BEFORE the manifest publish — see [[IndexMaintenance
    // .bumpAppended]]'s crash-direction contract
    IndexMaintenance.bumpAppended(s, path, nDelta)
    IndexMaintenance.publishManifest(s, path, ManifestName,
      cur.substring(path.length + 1))
  }

  /** Compact the accumulated assignment appends (config preserved,
    * centroids untouched, atomic manifest swap — see
    * [[DedupIndex.compact]]). Returns (filesBefore, filesAfter).
    */
  def compact(s: SparkSession, path: String,
      targetBytes: Long = 64L * 1024 * 1024): (Int, Int) = {
    IndexMaintenance.requireConfig(s, path, "_ivf_index_config",
      config(recordedKOf(s, path)), What)
    val drop = IndexMaintenance.tombstoneDropper(s, path, ManifestName,
      What, "member_id")
    val r = IndexMaintenance.compactStore(s, path, ManifestName, What,
      targetBytes, merge = drop)
    // the tombstoned rows are now PHYSICALLY gone — fold their count
    // into the trained base so the sidecar matches the store on disk
    IndexMaintenance.foldDeletesIntoTrain(s, path)
    IndexMaintenance.clearTombstones(s, path, ManifestName)
    r
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
    Similarity.ivfSearchOver(queries, members(s, path),
      centDf, nprobe, topk)
  }

  /** SEMANTIC dedup probe against the maintained index — SemDeDup
    * (Abbas et al. 2023, the q156 semantics) at INGEST time: a new
    * vector is dropped when some INDEXED vector inside its top-`nprobe`
    * probed cells sits at exact fixed-point cosine >= `tau`. Returns
    * the surviving rows as (vec_id, cell, n_cand): `cell` is the
    * top-probed (argmax) cell — where [[dedupIngest]] would file the
    * vector — and `n_cand` is the number of index members the probe
    * compared against, so the output hash covers the CANDIDATE SET,
    * not just the drop decisions (an index that leaked a rejected
    * vector shifts a survivor's n_cand even when it flips no drop).
    *
    * Cost shape mirrors [[DedupIndex.probe]]: only the delta is scored
    * against the centroids (|delta|·k broadcast dots), the index is
    * touched by ONE cell equi-join bounded by cell occupancy — never
    * corpus × corpus — and in-batch pairs are structurally excluded
    * (new×new never meets the join). Scoring runs the q156 two-phase
    * discipline: a double-dot prefilter at a dims-scaled margin, the
    * exact int64 dot only on survivors of it.
    */
  def semanticProbe(newVecs: DataFrame, path: String, tau: Double = 0.35,
      nprobe: Int = 2): DataFrame =
    probeJoined(newVecs, path, tau, nprobe)
      .groupBy(col("vec_id"))
      .agg(count(col("member_id")).as("n_cand"),
        max(col("hit")).as("dup"),
        min(when(col("crn") === 1, col("cell"))).as("cell"))
      .filter(col("dup") === 0)
      .select(col("vec_id"), col("cell"), col("n_cand"))

  /** One row per (new vector, probed cell, index member) with the
    * near-dup verdict computed; members NULL when a probed cell is
    * empty (LEFT join keeps the vector observable with n_cand = 0).
    */
  private def probeJoined(newVecs: DataFrame, path: String,
      tau: Double, nprobe: Int): DataFrame = {
    val s = newVecs.sparkSession
    import s.implicits._
    val centDf = centroids(s, path)
      .map(c => (c.cell, c.centroid.toSeq)).toDF("ccell", "ec")
    val probes = Similarity.probeCells(
      newVecs.select(col("vec_id"), col("embedding")), centDf, nprobe,
      idCol = "vec_id", vecCol = "embedding", keepRank = true)
    val idx = members(s, path)
      .select(col("cell"), col("member_id"), col("em"))
    probes.join(idx, Seq("cell"), "left")
      .select(col("vec_id"), col("cell"), col("crn"), col("member_id"),
        when(col("member_id").isNotNull &&
            PortableHash.fastDot(col("embedding"), col("em")) >=
              lit(tau) - PortableHash.dotEps(col("embedding")) &&
            PortableHash.exactDot(col("embedding"), col("em")) >= tau,
          1).otherwise(0).as("hit"))
  }

  /** MAINTENANCE: semantic-probe `newVecs` and APPEND the survivors
    * under the recorded centroids ([[DedupIndex.append]]'s contract,
    * semantic flavor) — dropped vectors never enter the corpus, so
    * their assignment rows must never enter the index. Returns the
    * surviving (vec_id, cell, n_cand) rows. The survivor set is
    * checkpointed BEFORE the append: a lazily re-evaluated probe would
    * otherwise re-run against the GROWN index and self-match every
    * survivor (dot(v, v) = 1 >= tau).
    */
  def dedupIngest(newVecs: DataFrame, path: String, tau: Double = 0.35,
      nprobe: Int = 2): DataFrame = {
    val survivors = SessionScratch.transientCheckpoint(
      semanticProbe(newVecs, path, tau, nprobe))
    append(newVecs.join(survivors.select(col("vec_id")),
      Seq("vec_id"), "left_semi"), path)
    survivors
  }
}

/** The persisted k-NN GRAPH index — q198's graph ANN as a MAINTAINED
  * on-disk artifact (the HNSW / DiskANN-Vamana production shape: build
  * the graph once over the corpus, search forever, INSERT new vectors
  * with forward + reverse edges instead of rebuilding).
  *
  * Layout at `path`: `centroids/` (cell, centroid — routes appends) +
  * `entries/` (the per-cell medoid entry points, recorded at build) +
  * `graph-g<N>/` ONE manifested row store holding BOTH member rows
  * (kind='m': member_id, cell, em) and edge rows (kind='e': src, dst).
  * A single manifest means a single atomic commit point per append —
  * members and edges can never be committed separately, so the
  * members-without-edges torn state (appended vectors silently
  * unreachable forever) is structurally impossible: a crash between
  * the parquet writes and the publish leaves uncommitted extras that
  * every read REFUSES descriptively and vacuum sweeps. Member and edge
  * rows land in separate FILES (two writes), so the kind filter prunes
  * at file granularity via parquet min/max.
  *
  * Maintenance contract: centroids + entry points are trained/recorded
  * at build and byte-untouched thereafter. [[append]] assigns the
  * delta under the recorded centroids, computes each new vector's
  * `Degree` nearest same-cell neighbors over (existing members ∪ the
  * batch), and appends those FORWARD edges plus their REVERSES (the
  * HNSW bidirectional-insert rule — without reverse edges an appended
  * vector is unreachable from the entry points and can never be a
  * search result). The maintained graph is NOT identical to a full
  * rebuild's (old members' own top-4 lists are never rewritten — the
  * standard insert-only graph contract); the spec floor-asserts
  * maintained recall against the rebuild and [[republish]] is the
  * drift-remediation rebuild arm, crash-detectable via config
  * retraction like [[IvfIndex.republish]].
  */
object GraphIndex {

  /** Lloyd iterations / default out-degree (q198's recipe). The
    * out-degree is the DiskANN/Vamana R parameter — the graph's
    * CONNECTIVITY budget, recorded in the config at build because it
    * is the knob that actually moves the recall ceiling (ScaleAnn:
    * beam and rounds both saturate at fixed degree; see SCALING.md).
    */
  val Iters = 2
  val Degree = 4

  private def config(k: Int, degree: Int = Degree): String =
    s"kind=knn-graph;k=$k;iters=$Iters;degree=$degree;" +
      "fixed_point=1e7;seed=first-k-by-id;entries=cell-medoid;v=1"

  private def centDir(path: String) = s"$path/centroids"
  private def entDir(path: String) = s"$path/entries"
  private val ManifestName = "_graph_index_manifest"
  private val ConfigName = "_graph_index_config"
  private val What = "kNN-graph index"

  /** Crash recovery — see [[IndexMaintenance.vacuumStore]]. */
  def vacuum(s: SparkSession, path: String): IndexMaintenance.VacuumReport =
    IndexMaintenance.vacuumWithTombstones(s, path, ManifestName, What)

  /** Non-throwing audit — parametric k AND degree re-derived like
    * [[IvfIndex.fsck]].
    */
  def fsck(s: SparkSession, path: String): IndexMaintenance.FsckReport = {
    val expected = IndexMaintenance.readSidecar(s, path, ConfigName)
      .flatMap { r =>
        for {
          k <- ";k=(\\d+);".r.findFirstMatchIn(r).map(_.group(1).toInt)
          d <- ";degree=(\\d+);".r.findFirstMatchIn(r)
            .map(_.group(1).toInt)
        } yield config(k, d)
      }
    IndexMaintenance.fsckStore(s, path, ManifestName,
      ConfigName, expected, What)
  }

  /** The manifest-verified current row-store directory. */
  private[graft] def dataDir(s: SparkSession, path: String): String =
    IndexMaintenance.verifiedDir(s, path, ManifestName, What)

  /** The graph's member rows (member_id, cell, em) with tombstoned
    * members MASKED — [[IvfIndex.members]]'s read surface for the graph
    * store. This is the RESULT-side mask only: the walk still routes
    * through tombstoned members ([[delete]]'s lazy contract); use it to
    * enumerate the surviving corpus (the [[republish]] consolidation
    * input), not to reconstruct reachability.
    */
  def members(s: SparkSession, path: String): DataFrame =
    IndexMaintenance.minusTombstones(s, path, ManifestName, What,
      s.read.parquet(dataDir(s, path)).filter(col("kind") === "m")
        .select(col("member_id"), col("cell"), col("em")), "member_id")

  private[llmops] def recordedK(s: SparkSession, path: String): Int =
    IndexMaintenance.readSidecar(s, path, ConfigName)
      .flatMap(c => ";k=(\\d+);".r.findFirstMatchIn(c)
        .map(_.group(1).toInt))
      .getOrElse(0)

  /** The out-degree the graph was BUILT with — appends must extend the
    * graph at the recorded R, not the compile-time default.
    */
  private def recordedDegree(s: SparkSession, path: String): Int =
    IndexMaintenance.readSidecar(s, path, ConfigName)
      .flatMap(c => ";degree=(\\d+);".r.findFirstMatchIn(c)
        .map(_.group(1).toInt))
      .getOrElse(Degree)

  private def requireLive(s: SparkSession, path: String): Unit =
    IndexMaintenance.requireConfig(s, path, ConfigName,
      config(recordedK(s, path), recordedDegree(s, path)), What)

  private def memberShape(rows: DataFrame): DataFrame =
    rows.select(col("member_id"), col("cell"), col("em"),
      lit(null).cast("long").as("src"), lit(null).cast("long").as("dst"),
      lit("m").as("kind"))

  private def edgeShape(rows: DataFrame): DataFrame =
    rows.select(lit(null).cast("long").as("member_id"),
      lit(null).cast("long").as("cell"),
      lit(null).cast("array<float>").as("em"),
      col("src"), col("dst"), lit("e").as("kind"))

  /** Initial build: train centroids, record per-cell medoid entry
    * points, write member + edge rows into one manifested store,
    * publish the config LAST (the ingest-complete marker).
    */
  def build(embeddings: DataFrame, path: String, k: Int,
      degree: Int = Degree): Unit =
    buildImpl(embeddings, path, k, degree, "explicit")

  /** Auto-k build — [[IvfIndex.build]]'s occupancy-constant default
    * applied to the routing cells (k = [[IndexMaintenance.kFor]](n));
    * the out-degree stays the explicit connectivity budget.
    */
  def build(embeddings: DataFrame, path: String): Unit =
    buildImpl(embeddings, path,
      IndexMaintenance.kFor(embeddings.count()), Degree,
      s"occ${IndexMaintenance.OccTarget}")

  private def buildImpl(embeddings: DataFrame, path: String, k: Int,
      degree: Int, kPolicy: String): Unit = {
    val s = embeddings.sparkSession
    import s.implicits._
    val (cents, nTrain) =
      KMeans.fitStats(s, embeddings, k = k, iters = Iters)
    cents.map(c => (c.cell, c.centroid.toSeq)).toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(centDir(path))
    Similarity.entryPointsOf(embeddings, cents)
      .coalesce(1)
      .write.mode("overwrite").parquet(entDir(path))
    val dir = s"$path/graph-g0"
    memberShape(KMeans.assign(embeddings, cents)
        .select(col("vec_id").as("member_id"), col("cell"),
          col("embedding").as("em")))
      .write.mode("overwrite").parquet(dir)
    edgeShape(Similarity.knnGraphOf(embeddings, cents, degree = degree))
      .write.mode("append").parquet(dir)
    IndexMaintenance.publishManifest(s, path, ManifestName, "graph-g0")
    IndexMaintenance.writeTrainStats(s, path, nTrain, k, kPolicy)
    IndexMaintenance.writeSidecar(s, path, ConfigName,
      config(k, degree))
  }

  /** The recorded centroids (k-bounded collect), config-verified
    * first — [[IvfIndex.centroids]]'s discipline.
    */
  def centroids(s: SparkSession, path: String): Seq[KMeans.Centroid] = {
    import s.implicits._
    val k = recordedK(s, path)
    requireLive(s, path)
    val cents = s.read.parquet(centDir(path))
      .select(col("cell"), col("centroid"))
      .as[(Long, Seq[Double])]
      .collect()
      .map { case (cell, v) => KMeans.Centroid(cell, v.toArray) }
      .toSeq
    if (cents.size != k)
      throw new IllegalStateException(
        s"kNN-graph index at $path records k=$k in its sidecar but " +
          s"stores ${cents.size} centroids — the centroid table is " +
          "truncated or foreign; rebuild the index.")
    cents.sortBy(_.cell)
  }

  /** MAINTENANCE — the HNSW insert rule, batched: assign the delta
    * under the RECORDED centroids, give each new vector its `Degree`
    * nearest same-cell neighbors over (existing members ∪ the batch),
    * and append member rows + forward edges + REVERSE edges in ONE
    * manifested commit. Cost shape: the delta is scored against cell
    * occupancy (delta × cell members), never corpus × corpus; existing
    * member/edge files are never read-modified or rewritten.
    *
    * Reachability guarantee: a new vector whose assigned cell has no
    * other member (the cell was empty at build — possible under skew —
    * so it has no entry point either) would get ZERO same-cell edges
    * and be silently unsearchable forever. Such strays instead edge to
    * the recorded ENTRY POINTS (+ reverses) — the HNSW
    * connect-to-entry fallback — so every appended member is reachable
    * by construction.
    */
  def append(newVecs: DataFrame, path: String): Unit = {
    val s = newVecs.sparkSession
    IndexMaintenance.requireMutable(s, path, "vector append")
    val cents = centroids(s, path)
    val cur = dataDir(s, path)
    // the batch is assigned once; the edge set is checkpointed BEFORE
    // any write so its lineage can never observe the half-appended dir
    val newM = SessionScratch.transientCheckpoint(
      KMeans.assign(newVecs, cents)
        .select(col("vec_id").as("member_id"), col("cell"),
          col("embedding").as("em")))
    val members = s.read.parquet(cur).filter(col("kind") === "m")
      .select(col("member_id"), col("cell"), col("em"))
    // per-src top-Degree via the exact-int64 TopK aggregator — the
    // knnGraphOf shuffle-reduction (map-side prune to Degree rows per
    // src instead of shuffling the delta × occupancy pair space)
    val fwd = newM
      .select(col("cell"), col("member_id").as("ia"), col("em").as("ea"))
      .join(members.union(newM)
        .select(col("cell"), col("member_id").as("ib"),
          col("em").as("eb")), Seq("cell"))
      .filter(col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"),
        graft.functions.VectorDot.fixedDotSum(
          col("ea").cast("array<double>"),
          col("eb").cast("array<double>")).as("fdot"))
      .groupBy(col("ia"))
      .agg(graft.functions.TopK.topKLong(recordedDegree(s, path))(
        col("fdot"), col("ib")).as("top"))
      .select(col("ia").as("src"), explode(col("top.id")).as("dst"))
    // strays: EVERY batch vector whose cell has no PRE-EXISTING member
    // additionally edges to the entry points. Membership of the CELL is
    // the right test — "produced no forward edge" would miss groups
    // (two strays in the same empty cell edge to each other and form an
    // island unreachable from the entries), and deriving it from the
    // cheap distinct-cells anti-join keeps the expensive scored pair
    // join out of the stray lineage entirely.
    val entries = s.read.parquet(entDir(path))
    val strayCells = newM.select(col("cell")).distinct()
      .join(members.select(col("cell")).distinct(), Seq("cell"),
        "left_anti")
    val stray = newM.join(broadcast(strayCells), Seq("cell"), "left_semi")
      .select(col("member_id").as("ia"))
      .crossJoin(broadcast(entries))
      .filter(col("ia") =!= col("cid"))
      .select(col("ia").as("src"), col("cid").as("dst"))
    val allFwd = fwd.union(stray)
    val edges = SessionScratch.transientCheckpoint(
      allFwd.union(allFwd
          .select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    memberShape(newM).write.mode("append").parquet(cur)
    edgeShape(edges).write.mode("append").parquet(cur)
    IndexMaintenance.bumpAppended(s, path, newM.count())
    IndexMaintenance.publishManifest(s, path, ManifestName,
      cur.substring(path.length + 1))
  }

  /** Search the MAINTAINED graph: q198's unrolled beam walk with
    * members, edges, and entry points read off the verified store.
    */
  def search(queries: DataFrame, path: String, beam: Int = 4,
      topk: Int = 8, rounds: Int = 2): DataFrame = {
    val s = queries.sparkSession
    requireLive(s, path)
    val data = s.read.parquet(dataDir(s, path))
    Similarity.beamSearch(queries,
      data.filter(col("kind") === "m")
        .select(col("member_id").as("vec_id"), col("em").as("embedding")),
      data.filter(col("kind") === "e").select(col("src"), col("dst")),
      s.read.parquet(entDir(path)),
      beam, topk,
      excludeFromResults =
        IndexMaintenance.tombstones(s, path, ManifestName, What),
      rounds = rounds)
  }

  /** DELETE members from the graph — the DiskANN LAZY-delete contract,
    * deliberately weaker than [[IvfIndex.delete]]'s: a tombstoned
    * member never occupies a RESULT rank, but it keeps ROUTING (its
    * edges are still walked, it can hold beam slots) because dropping
    * a waypoint without re-wiring its neighborhood would disconnect
    * the graph and silently sink recall. Physical removal therefore
    * requires the re-wiring rebuild — [[republish]] (DiskANN's
    * consolidate_deletes) — and [[compact]] intentionally does NOT
    * drop or clear graph tombstones.
    */
  def delete(vecIds: DataFrame, path: String): Unit = {
    val s = vecIds.sparkSession
    requireLive(s, path)
    IndexMaintenance.addTombstones(s, path, ManifestName, What, vecIds)
  }

  /** Compact the accumulated append files (config + centroids +
    * entries untouched, atomic manifest swap). Row set preserved —
    * including tombstoned members' rows, which keep routing until
    * [[republish]] re-wires (see [[delete]]).
    */
  def compact(s: SparkSession, path: String,
      targetBytes: Long = 64L * 1024 * 1024): (Int, Int) = {
    requireLive(s, path)
    IndexMaintenance.compactStore(s, path, ManifestName, What,
      targetBytes)
  }

  /** Drift remediation — rebuild IN PLACE, crash-detectably
    * ([[IvfIndex.republish]]'s retract-then-build discipline).
    */
  def republish(embeddings: DataFrame, path: String, k: Int,
      degree: Option[Int] = None): Unit = {
    val s = embeddings.sparkSession
    // pinned-k contract only — liveness is verified once in republishAs
    val rec = recordedK(s, path)
    if (rec != 0 && k != rec)
      throw new IllegalStateException(
        s"republish at k=$k does not match the recorded k=$rec at " +
          s"$path — a caller-driven republish keeps the store's shape " +
          "(rebuild at a new path, or use the remediator's occupancy " +
          "policy, for a shape change).")
    republishAs(embeddings, path, k, "explicit", degree)
  }

  /** Policy-aware drift remediation — [[IvfIndex.republishAs]]'s
    * contract for the graph store: liveness verified against the
    * RECORDED shape, rebuild at the caller's (k, kPolicy), degree
    * defaulting to the RECORDED out-degree (a remediation must not
    * silently halve connectivity — R is the recall knob, SCALING.md
    * r12).
    */
  private[llmops] def republishAs(embeddings: DataFrame, path: String,
      k: Int, kPolicy: String, degree: Option[Int] = None): Unit = {
    val s = embeddings.sparkSession
    val r = degree.getOrElse(recordedDegree(s, path))
    requireLive(s, path)
    IndexMaintenance.requireMutable(s, path, "republish")
    val stale = IndexMaintenance.verifiedDir(s, path, ManifestName, What)
    IndexMaintenance.retractSidecar(s, path, ConfigName)
    // the re-wiring rebuild IS the physical-delete arm (DiskANN
    // consolidate_deletes): the graph is rebuilt over the corpus it is
    // handed, so pending lazy-delete tombstones are consumed here
    IndexMaintenance.clearTombstones(s, path, ManifestName)
    buildImpl(embeddings, path, k, r, kPolicy)
    if (!stale.endsWith("/graph-g0")) {
      val p = new org.apache.hadoop.fs.Path(stale)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}

/** The persisted IVF-PQ index — q192's composed ANN as a MAINTAINED
  * on-disk artifact, and the point where the index family's storage
  * claim becomes literal: [[IvfIndex]] persists raw vectors in its
  * assignment rows (search refines against them), while this store
  * persists only CELL + CODES per vector (m one-byte codewords — the
  * 64× compression), so search never touches a raw corpus vector at
  * all. That is the production FAISS IndexIVFPQ contract: queries
  * carry their own vector, build an ADC table against the recorded
  * codebook, and candidates in the probed cells are ranked by code
  * lookups alone.
  *
  * Layout at `path`: `centroids/` (cell, centroid — the IVF half) +
  * `codebook/` (cw, s, pi, fc — the PQ half, fixed-point int64
  * components) + `codes-g<N>/` (vec_id, cell, s, cw) manifested rows +
  * `_ivfpq_index_config` (written LAST — the ingest-complete marker) +
  * `_ivfpq_index_manifest`.
  *
  * Maintenance contract (the FAISS train-then-add discipline, both
  * halves): centroids AND codebook are trained/seeded at build and
  * byte-untouched thereafter; append assigns + encodes ONLY the delta
  * under the recorded artifacts; drift remediation is [[republish]].
  * Determinism: cell probes, encode argmins, and ADC sums are all
  * exact int64, so the gate oracle replays training, encoding, and the
  * search bit-exactly.
  */
object IvfPqIndex {

  /** IVF cells / Lloyd iterations (the q52/q54 recipe). */
  val Iters = 2

  /** PQ shape (the q192 recipe): m subspaces of subDim dims, cb
    * codewords per subspace, codebooks TRAINED per subspace
    * ([[PqCodebook.fit]], Lloyd iterations seeded from the build
    * corpus's cb smallest vec_ids).
    */
  val M = 4
  val Cb = 16
  val SubDim = 16

  private def config(k: Int): String =
    s"kind=ivfpq;k=$k;iters=$Iters;m=$M;cb=$Cb;sub=$SubDim;" +
      "fixed_point=1e7;seed-cells=first-k-by-id;" +
      s"codebook=kmeans-${Iters}iter-seed-first-cb-by-id;v=2"

  private def centDir(path: String) = s"$path/centroids"
  private def cbDir(path: String) = s"$path/codebook"
  private val ManifestName = "_ivfpq_index_manifest"
  private val What = "IVF-PQ index"

  /** Crash recovery — see [[IndexMaintenance.vacuumStore]]. */
  def vacuum(s: SparkSession, path: String): IndexMaintenance.VacuumReport =
    IndexMaintenance.vacuumWithTombstones(s, path, ManifestName, What)

  /** Non-throwing audit — expected config re-derived from the recorded
    * k (the [[IvfIndex.fsck]] pattern).
    */
  def fsck(s: SparkSession, path: String): IndexMaintenance.FsckReport = {
    val expected = IndexMaintenance
      .readSidecar(s, path, "_ivfpq_index_config")
      .flatMap(r => "k=(\\d+)".r.findFirstMatchIn(r)
        .map(m => config(m.group(1).toInt)))
    IndexMaintenance.fsckStore(s, path, ManifestName,
      "_ivfpq_index_config", expected, What)
  }

  /** The manifest-verified current codes directory. */
  private[graft] def dataDir(s: SparkSession, path: String): String =
    IndexMaintenance.verifiedDir(s, path, ManifestName, What)

  /** (vec_id, s, pi, fv) — fixed-point subspace decomposition. */
  private def subOf(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos0", "v")))
      .select(col("vec_id"),
        (col("pos0") / SubDim).cast("int").as("s"),
        (col("pos0") % SubDim).as("pi"),
        PortableHash.fixedPoint(col("v")).as("fv"))

  /** Encode under RECORDED artifacts: cell via centroid argmax, codes
    * via per-subspace squared-L2 argmin against the codebook literal —
    * all exact int64, deterministic ties, and a PURE PROJECTION (no
    * join, no window: the former join+window encode sorted n·m·cb rows
    * per pass; [[PqCodebook.codesOf]] computes the same argmin per
    * row). Returns (vec_id, cell, s, cw).
    */
  private def encodeUnder(vecs: DataFrame, cents: Seq[KMeans.Centroid],
      cbRows: Seq[PqCodebook.Codeword]): DataFrame =
    KMeans.assign(vecs, cents)
      .select(col("vec_id"), col("cell"),
        posexplode(PqCodebook.codesOf(
          col("embedding").cast("array<double>"), cbRows, M, SubDim))
          .as(Seq("s", "cw")))
      .select(col("vec_id"), col("cell"), col("s"), col("cw"))

  /** The recorded codebook (cw, cs, cpi, fc) — m·cb·subDim rows,
    * broadcast-tier by construction.
    */
  private def codebook(s: SparkSession, path: String): DataFrame =
    s.read.parquet(cbDir(path))
      .select(col("cw"), col("cs"), col("cpi"), col("fc"))

  /** The recorded codebook as driver rows (m·cb·subDim — bounded by
    * the config shape, never by the corpus) for the projection encode.
    */
  private def codebookRows(s: SparkSession,
      path: String): Seq[PqCodebook.Codeword] = {
    import s.implicits._
    s.read.parquet(cbDir(path))
      .select(col("cw"), col("cs"), col("cpi"), col("fc"))
      .as[PqCodebook.Codeword].collect().toSeq
  }

  /** Initial build: train IVF centroids AND the per-subspace PQ
    * codebooks on the corpus ([[PqCodebook.fit]] — the FAISS
    * train-then-add contract covers both halves), encode every vector,
    * and publish — config LAST as the ingest-complete marker.
    */
  def build(embeddings: DataFrame, path: String, k: Int): Unit =
    buildImpl(embeddings, path, k, "explicit")

  /** Auto-k build — [[IvfIndex.build]]'s occupancy-constant default
    * (k = [[IndexMaintenance.kFor]](n)); the PQ shape (m/cb/subDim) is
    * the recorded recipe either way.
    */
  def build(embeddings: DataFrame, path: String): Unit =
    buildImpl(embeddings, path,
      IndexMaintenance.kFor(embeddings.count()),
      s"occ${IndexMaintenance.OccTarget}")

  private def buildImpl(embeddings: DataFrame, path: String, k: Int,
      kPolicy: String): Unit = {
    val s = embeddings.sparkSession
    import s.implicits._
    val (cents, nTrain) =
      KMeans.fitStats(s, embeddings, k = k, iters = Iters)
    cents.map(c => (c.cell, c.centroid.toSeq)).toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(centDir(path))
    val cbRows = PqCodebook.fit(s, embeddings,
      m = M, cb = Cb, subDim = SubDim, iters = Iters)
    PqCodebook.toDf(s, cbRows)
      .coalesce(1).write.mode("overwrite").parquet(cbDir(path))
    encodeUnder(embeddings, cents, cbRows)
      .write.mode("overwrite").parquet(s"$path/codes-g0")
    IndexMaintenance.publishManifest(s, path, ManifestName, "codes-g0")
    // n_train covers BOTH trained halves (one corpus, two fits). k is
    // the TRUE cell count; the undertraining floor gates on the larger
    // trained half (cb=16 > k=4 here) via floorK — recording
    // max(k, cb) AS k would hand any consumer sizing a rebuild the
    // wrong cell count
    IndexMaintenance.writeTrainStats(s, path, nTrain, k, kPolicy,
      floorK = Some(math.max(k, Cb)))
    IndexMaintenance.writeSidecar(s, path, "_ivfpq_index_config",
      config(k))
  }

  /** The recorded cell count ([[IvfIndex.recordedKOf]]'s accessor for
    * the codes store).
    */
  private[llmops] def recordedKOf(s: SparkSession, path: String): Int =
    IndexMaintenance.readSidecar(s, path, "_ivfpq_index_config")
      .flatMap(c => ";k=(\\d+);".r.findFirstMatchIn(c)
        .map(_.group(1).toInt))
      .getOrElse(0)

  private val RawLocatorName = "_ivfpq_raw_locator"

  /** Record WHERE this codes-only store's raw vectors live: the paired
    * [[IvfIndex]] store whose member rows carry the same corpus — the
    * production FAISS pairing (IndexRefineFlat keeps a raw store
    * alongside the codes; q202 composes exactly this pair). With a
    * locator recorded, [[StoreRemediator]] can republish BOTH trained
    * halves of a drift-flagged IVF-PQ store off the raw pair instead
    * of refusing (round-13 verdict #4).
    *
    * LOCKSTEP ASSUMED: the caller maintains the pair together (every
    * append/delete lands on both stores — q202's contract), so at
    * remediation time the raw store's membership IS the codes store's
    * corpus. The locator names a store, not a snapshot; pointing it at
    * a foreign or diverged store rebuilds over that store's membership.
    */
  def recordRawSource(s: SparkSession, path: String,
      rawIvfPath: String): Unit =
    IndexMaintenance.writeSidecar(s, path, RawLocatorName,
      s"kind=ivf;path=$rawIvfPath;v=1")

  /** The recorded raw-vector locator, if any. */
  private[llmops] def rawSourceOf(s: SparkSession,
      path: String): Option[String] =
    IndexMaintenance.readSidecar(s, path, RawLocatorName)
      .flatMap(b => "(^|;)path=([^;]*)".r.findFirstMatchIn(b.trim)
        .map(_.group(2)))
      .filter(_.nonEmpty)

  /** The recorded centroids — config-verified k-bounded read (the
    * [[IvfIndex.centroids]] discipline).
    */
  def centroids(s: SparkSession, path: String): Seq[KMeans.Centroid] = {
    import s.implicits._
    val k = IndexMaintenance.readSidecar(s, path, "_ivfpq_index_config")
      .flatMap(c => ";k=(\\d+);".r.findFirstMatchIn(c).map(_.group(1).toInt))
      .getOrElse(0)
    IndexMaintenance.requireConfig(s, path, "_ivfpq_index_config",
      config(k), What)
    val cents = s.read.parquet(centDir(path))
      .select(col("cell"), col("centroid"))
      .as[(Long, Seq[Double])]
      .collect()
      .map { case (cell, v) => KMeans.Centroid(cell, v.toArray) }
      .toSeq
    if (cents.size != k)
      throw new IllegalStateException(
        s"IVF-PQ index at $path records k=$k in its sidecar but stores " +
          s"${cents.size} centroids — the centroid table is truncated " +
          "or foreign; rebuild the index.")
    cents.sortBy(_.cell)
  }

  /** MAINTENANCE: assign + encode ONLY the delta under the recorded
    * centroids and codebook (neither is retrained — a delta-sized
    * argmax + argmin projection and a delta-sized append).
    */
  def append(newVecs: DataFrame, path: String): Unit = {
    val s = newVecs.sparkSession
    IndexMaintenance.requireMutable(s, path, "vector append")
    val cents = centroids(s, path)
    val cur = dataDir(s, path)
    val encoded = SessionScratch.transientCheckpoint(
      encodeUnder(newVecs, cents, codebookRows(s, path)))
    // one encoded row per (vector, subspace): members = rows / m
    val nDelta = encoded.count() / M
    encoded.write.mode("append").parquet(cur)
    IndexMaintenance.bumpAppended(s, path, nDelta)
    IndexMaintenance.publishManifest(s, path, ManifestName,
      cur.substring(path.length + 1))
  }

  /** DELETE vectors from the index ([[IvfIndex.delete]]'s contract,
    * codes flavor): tombstone append; [[search]] masks immediately,
    * the next [[compact]] drops the code rows physically.
    */
  def delete(vecIds: DataFrame, path: String): Unit = {
    val s = vecIds.sparkSession
    val k = IndexMaintenance.readSidecar(s, path, "_ivfpq_index_config")
      .flatMap(c => ";k=(\\d+);".r.findFirstMatchIn(c).map(_.group(1).toInt))
      .getOrElse(0)
    IndexMaintenance.requireConfig(s, path, "_ivfpq_index_config",
      config(k), What)
    IndexMaintenance.addTombstones(s, path, ManifestName, What, vecIds)
  }

  /** Compact the accumulated code appends (config preserved, centroids
    * and codebook untouched, atomic manifest swap); pending tombstones
    * are dropped physically and cleared.
    */
  def compact(s: SparkSession, path: String,
      targetBytes: Long = 64L * 1024 * 1024): (Int, Int) = {
    val k = IndexMaintenance.readSidecar(s, path, "_ivfpq_index_config")
      .flatMap(c => ";k=(\\d+);".r.findFirstMatchIn(c).map(_.group(1).toInt))
      .getOrElse(0)
    IndexMaintenance.requireConfig(s, path, "_ivfpq_index_config",
      config(k), What)
    val drop = IndexMaintenance.tombstoneDropper(s, path, ManifestName,
      What, "vec_id")
    val r = IndexMaintenance.compactStore(s, path, ManifestName, What,
      targetBytes, merge = drop)
    // physical drop done — fold the delete count into the trained base
    IndexMaintenance.foldDeletesIntoTrain(s, path)
    IndexMaintenance.clearTombstones(s, path, ManifestName)
    r
  }

  /** Drift remediation — in-place rebuild, crash-detectable via config
    * retraction (the [[IvfIndex.republish]] contract).
    */
  def republish(embeddings: DataFrame, path: String, k: Int): Unit = {
    val s = embeddings.sparkSession
    // pinned-k contract only — liveness is verified once in republishAs
    val rec = recordedKOf(s, path)
    if (rec != 0 && k != rec)
      throw new IllegalStateException(
        s"republish at k=$k does not match the recorded k=$rec at " +
          s"$path — a caller-driven republish keeps the store's shape " +
          "(rebuild at a new path, or use the remediator's occupancy " +
          "policy, for a shape change).")
    republishAs(embeddings, path, k, "explicit")
  }

  /** Policy-aware drift remediation — [[IvfIndex.republishAs]]'s
    * contract for the codes store: BOTH trained halves (IVF centroids
    * and the per-subspace PQ codebooks) retrain on the corpus handed
    * in; liveness verified against the RECORDED k.
    */
  private[llmops] def republishAs(embeddings: DataFrame, path: String,
      k: Int, kPolicy: String): Unit = {
    val s = embeddings.sparkSession
    IndexMaintenance.requireConfig(s, path, "_ivfpq_index_config",
      config(recordedKOf(s, path)), What)
    IndexMaintenance.requireMutable(s, path, "republish")
    val stale = IndexMaintenance.verifiedDir(s, path, ManifestName, What)
    IndexMaintenance.retractSidecar(s, path, "_ivfpq_index_config")
    IndexMaintenance.clearTombstones(s, path, ManifestName)
    buildImpl(embeddings, path, k, kPolicy)
    if (!stale.endsWith("/codes-g0")) {
      val p = new org.apache.hadoop.fs.Path(stale)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** Search the MAINTAINED index by codes alone: top-`nprobe` cells per
    * query (exact centroid dots against the k-bounded recorded
    * centroids), candidates = the probed cells' rows in the CODES
    * store, ranked by the exact int64 ADC sum (m broadcast table
    * lookups per candidate). No raw corpus vector is read anywhere —
    * the query's own vector builds the ADC table. Returns
    * (qid, cid, f, rn).
    */
  def search(queries: DataFrame, path: String, nprobe: Int = 2,
      topk: Int = 8): DataFrame = {
    val s = queries.sparkSession
    import s.implicits._
    val centDf = centroids(s, path)
      .map(c => (c.cell, c.centroid.toSeq)).toDF("ccell", "ec")
    val probes = Similarity.probeCells(queries, centDf, nprobe)
      .select(col("qid"), col("cell"))
    val qd = subOf(queries.select(col("qid").as("vec_id"),
        col("eq").as("embedding")))
      .join(broadcast(codebook(s, path)),
        col("s") === col("cs") && col("pi") === col("cpi"))
      .groupBy(col("vec_id").as("aqid"), col("s").as("qs"),
        col("cw").as("qcw"))
      .agg(sum(col("fv") * col("fc")).as("qdot"))
    val codes = IndexMaintenance.minusTombstones(s, path, ManifestName,
      What, s.read.parquet(dataDir(s, path)), "vec_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("f").desc, col("cid"))
    probes.join(codes, Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .join(broadcast(qd),
        col("qid") === col("aqid") && col("s") === col("qs") &&
          col("cw") === col("qcw"))
      .groupBy(col("qid"), col("vec_id").as("cid"))
      .agg(sum(col("qdot")).as("f"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topk)
      .select(col("qid"), col("cid"), col("f"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }
}

/** One-sweep catalog audit over every persisted artifact store — the
  * operational `fsck` rolled up as a DataFrame (one row per store), so
  * an operator can health-check a whole warehouse of index/model
  * artifacts in one query instead of touching eight read paths that
  * would THROW on the first damaged store. Built on the non-throwing
  * per-store [[IndexMaintenance.FsckReport]]s; driver-side work is one
  * bounded sidecar/listing pass per store (catalog metadata, not data).
  */
object StoreAudit {

  /** Store kinds accepted by [[audit]], mapped to their fsck — THE
    * kind registry ([[WarehouseMaintenance]] derives from it; one
    * list to extend when a ninth store kind lands).
    */
  private[llmops] val Kinds: Map[String,
      (SparkSession, String) => IndexMaintenance.FsckReport] = Map(
    "dedup" -> (DedupIndex.fsck _),
    "bm25" -> (TextIndex.fsck _),
    "ngram" -> (NgramIndex.fsck _),
    "bpe" -> (BpeModel.fsck _),
    "clf" -> (ClfModel.fsck _),
    "ivf" -> (IvfIndex.fsck _),
    "ivfpq" -> (IvfPqIndex.fsck _),
    "graph" -> (GraphIndex.fsck _))

  /** Audit `(kind, path)` entries; unknown kinds fail fast (an audit
    * that silently skipped a store would read as "all healthy").
    */
  def audit(s: SparkSession,
      stores: Seq[(String, String)]): DataFrame = {
    import s.implicits._
    val bad = stores.map(_._1).filterNot(Kinds.contains).distinct
    require(bad.isEmpty,
      s"unknown store kind(s) ${bad.mkString(", ")} — expected one of " +
        Kinds.keys.toSeq.sorted.mkString(", "))
    stores.map { case (kind, path) =>
      val r = Kinds(kind)(s, path)
      (kind, r.what, r.path, r.healthy, r.vacuumRepairs,
        r.configPresent, r.configMatches, r.manifestPresent,
        r.generation, r.committedFiles, r.committedBytes,
        r.uncommittedFiles, r.missingFiles, r.staleGenerations,
        r.orphanedTemps,
        // training provenance (trained ANN stores only — the
        // `_train_stats` sidecar): sample size, grown-since-training
        // mass, the FAISS 39·k undertraining verdict, and the
        // staleness fraction the republish decision thresholds on
        r.trainStats.map(_.nTrain), r.trainStats.map(_.nAppended),
        r.trainStats.map(_.undertrained), r.trainStats.map(_.drift))
    }.toDF("kind", "store", "path", "healthy", "vacuum_repairs",
      "config_present", "config_matches", "manifest_present",
      "generation", "committed_files", "committed_bytes",
      "uncommitted_files", "missing_files", "stale_generations",
      "orphaned_temps", "n_train", "n_appended", "undertrained",
      "drift")
  }
}

/** AUTO-REMEDIATION: the q230 decision rule consumed BY CODE — sweep a
  * catalog of self-contained ANN stores, republish exactly the ones the
  * staleness rule flags (over the corpus read OFF each store's own
  * member rows — the q229/q231 composition), and leave the rest
  * byte-untouched. This is the complete monitor → decide → act loop a
  * production warehouse runs on a schedule: q171-class metrics observe,
  * `_train_stats` records growth, [[needsRepublish]] decides, and the
  * republish arm (q212/q213's gated operation) remediates.
  *
  * Scope: `ivf` and `graph` stores are self-contained — their member
  * rows carry the raw vectors, so the store IS the corpus record and
  * remediation needs no external input. The IVF-PQ store is codes-only
  * BY DESIGN (64× compression): a flagged one remediates through its
  * recorded raw-vector locator ([[IvfPqIndex.recordRawSource]] — the
  * FAISS IndexRefineFlat pairing, the q202 composition), republishing
  * BOTH trained halves off the paired store's member rows; with no
  * locator recorded it REFUSES descriptively (acting would require a
  * corpus the warehouse does not know about — the caller-driven q214
  * arm remains that path).
  *
  * 100 TB shape: the sweep reads sidecars; only FLAGGED stores pay the
  * corpus-sized rebuild — which is the point of thresholding: republish
  * cost is incurred exactly when the staleness metric says the trained
  * artifacts no longer represent the membership.
  */
object StoreRemediator {

  /** The kinds whose flagged stores this remediator can ACT on:
    * self-contained member rows (ivf/graph), codes-only with a
    * recorded raw-vector locator (ivfpq), or frozen transforms with a
    * recorded training-corpus locator (bpe/clf — round-14 verdict #1).
    * THE single definition — [[sweepAndRemediate]]'s kind check and
    * [[WarehouseMaintenance]]'s decide-vs-act split both read it.
    */
  private[llmops] val Actable = Set("ivf", "graph", "ivfpq", "bpe", "clf")

  /** The kinds that RECORD training provenance when built by current
    * code — the set the warehouse sweep's `no-provenance` verdict
    * gates on. Distinct from [[Actable]] on purpose (the round-14
    * ADVICE): "records provenance when healthy" is about whether a
    * missing `_train_stats` means UNDECIDABLE staleness (any trained
    * kind, actable or not) vs "no staleness exists" (the untrained
    * dedup/bm25/ngram kinds, whose maintenance is append/compact).
    */
  private[llmops] val TrainedKinds =
    Set("ivf", "graph", "ivfpq", "bpe", "clf")

  /** Whether the warehouse sweep can auto-act on a FLAGGED store of
    * this kind at this path, or must queue it for manual action:
    * self-contained kinds always act; a frozen transform acts only
    * with a recorded training-corpus locator (pre-locator models are
    * the installed base — their flagged rows ARE the manual-action
    * queue, never an abort); a codes-only ivfpq store claims actable
    * even without its raw locator so [[act]]'s refusal SURFACES — the
    * raw pair is the deployment contract (FAISS IndexRefineFlat), and
    * a codes store without one is an operator error to abort on, not
    * an installed base to queue.
    */
  private[llmops] def canAutoAct(s: SparkSession, kind: String,
      path: String): Boolean = kind match {
    case "ivf" | "graph" | "ivfpq" => true
    case "bpe" => BpeModel.trainSourceOf(s, path).isDefined
    case "clf" => ClfModel.trainSourceOf(s, path).isDefined
    case _ => false
  }

  /** The q230 decision rule: republish when rows appended since
    * training exceed 25% of the LIVE trained base —
    * 3·n_appended > n_train − n_deleted, exact integers (the
    * FAISS/DiskANN "rebuild when inserts exceed X% of the trained
    * base" practice, delete-aware since round 15: after heavy
    * takedowns the historical n_train overstates what remains, and a
    * store whose appends dominate its LIVE membership must flag even
    * though they are small against the phantom build size).
    */
  def needsRepublish(ts: IndexMaintenance.TrainStats): Boolean =
    3L * ts.nAppended > ts.liveTrainBase

  /** The rebuild shape for a flagged store: an occupancy-policy store
    * ("occ<target>" — what the auto-k builders record) recomputes
    * k = [[IndexMaintenance.kFor]](current membership) at its RECORDED
    * occupancy target and keeps the policy string — pinning the stale
    * recorded k would recreate the quadratic fixed-k regime the
    * occupancy protocol exists to prevent, and rewriting the policy to
    * 'explicit' would misstate provenance AND freeze every later
    * remediation at this k. An 'explicit' store keeps its recorded k
    * (a remediation must not silently change a shape the operator
    * chose).
    */
  def remediationShape(ts: IndexMaintenance.TrainStats, recordedK: Int,
      corpusN: Long): (Int, String) =
    IndexMaintenance.occTargetOf(ts.kPolicy) match {
      case Some(target) =>
        (IndexMaintenance.kFor(corpusN, target), ts.kPolicy)
      // non-occupancy policies keep the recorded k AND their recorded
      // policy string — rewriting an unrecognized policy to 'explicit'
      // would be exactly the provenance misstatement this function
      // exists to prevent (for 'explicit' stores the preserved string
      // IS "explicit", so the known case is unchanged)
      case None => (recordedK, ts.kPolicy)
    }

  /** Sweep `(label, kind, path)` stores; republish the flagged ones at
    * their recorded SHAPE POLICY ([[remediationShape]]: explicit stores
    * at the recorded k, occupancy-policy stores at k re-sized to the
    * membership); return one readout row per store with the
    * before/after provenance and what was done. Unknown kinds fail
    * fast (the [[StoreAudit.audit]] rule: a silently-skipped store
    * would read as "remediated").
    */
  def sweepAndRemediate(s: SparkSession,
      stores: Seq[(String, String, String)]): DataFrame = {
    import s.implicits._
    val bad = stores.map(_._2).filterNot(Actable).distinct
    require(bad.isEmpty,
      s"unknown store kind(s) ${bad.mkString(", ")} — remediation " +
        s"covers ${Actable.toSeq.sorted.mkString(", ")} " +
        "(self-contained member rows, codes-only with a recorded " +
        "raw-vector locator, or frozen transforms with a recorded " +
        "training-corpus locator)")
    stores.map { case (label, kind, path) =>
      val before = IndexMaintenance.readTrainStats(s, path).getOrElse(
        throw new IllegalStateException(
          s"store $label at $path records no _train_stats sidecar — " +
            "staleness is undecidable; rebuild it with a current " +
            "builder."))
      val acted = needsRepublish(before)
      if (acted) act(s, label, kind, path, before)
      val after =
        if (acted) IndexMaintenance.readTrainStats(s, path).get
        else before
      (label, before.nTrain, before.nAppended,
        if (acted) "republish" else "ok",
        if (acted) 1L else 0L,
        after.nTrain, after.nAppended)
    }.toDF("store", "n_train_before", "n_appended_before", "verdict",
      "acted", "n_train_after", "n_appended_after")
  }

  /** The act itself — republish one FLAGGED store at its
    * [[remediationShape]], corpus read off its own member rows (or the
    * recorded raw pair for codes-only stores). Shared by
    * [[sweepAndRemediate]] and [[WarehouseMaintenance.sweep]] so the
    * two operational entry points can never diverge.
    */
  private[llmops] def act(s: SparkSession, label: String, kind: String,
      path: String, before: IndexMaintenance.TrainStats): Unit =
    kind match {
      case "ivf" =>
        val corpus = SessionScratch.transientCheckpoint(
          IvfIndex.members(s, path)
            .select(col("member_id").as("vec_id"),
              col("em").as("embedding")))
        val (k, pol) = remediationShape(before,
          IvfIndex.recordedKOf(s, path), corpus.count())
        IvfIndex.republishAs(corpus, path, k, pol)
        // release THIS store's corpus blocks before the next store —
        // a multi-store sweep otherwise accumulates every corpus in
        // the block manager until the caller evicts (measured: 8 acts
        // in one sweep cost 1.6× per store vs one act per sweep —
        // ScaleIndex `remediation_fanout`)
        SessionScratch.releaseCheckpoint(corpus)
      case "graph" =>
        val corpus = SessionScratch.transientCheckpoint(
          GraphIndex.members(s, path)
            .select(col("member_id").as("vec_id"),
              col("em").as("embedding")))
        val (k, pol) = remediationShape(before,
          GraphIndex.recordedK(s, path), corpus.count())
        GraphIndex.republishAs(corpus, path, k, pol)
        SessionScratch.releaseCheckpoint(corpus)
      case "ivfpq" =>
        // codes-only: the raw vectors live in the PAIRED store the
        // locator names; refuse descriptively without one — silently
        // skipping a FLAGGED store would read as "remediated"
        val raw = IvfPqIndex.rawSourceOf(s, path).getOrElse(
          throw new IllegalStateException(
            s"store $label at $path is flagged for republish but is " +
              "codes-only with no _ivfpq_raw_locator recorded — " +
              "remediation cannot reconstruct the corpus from codes; " +
              "record the paired raw store " +
              "(IvfPqIndex.recordRawSource) or republish it " +
              "caller-driven with the source corpus."))
        val corpus = SessionScratch.transientCheckpoint(
          IvfIndex.members(s, raw)
            .select(col("member_id").as("vec_id"),
              col("em").as("embedding")))
        val nRaw = corpus.count()
        // LOCKSTEP cross-check (round-14 ADVICE): the locator names a
        // store, not a snapshot — if the pair missed an append/delete
        // or points at a foreign store, retraining would silently
        // rebuild over the wrong corpus AND reset provenance to look
        // fresh. The codes store's sidecar bounds its live membership:
        // n_train + n_appended is the exact insert total under the
        // lockstep contract, and n_deleted may OVER-count but never
        // under (foreign-id deletes, re-deletes across a compact
        // boundary — the [[TrainStats]] approximation's blessed
        // inputs), so the true live count sits in
        // [n_train + n_appended − n_deleted, n_train + n_appended].
        // Refusing on anything inside that interval would turn the
        // provenance design's documented-harmless deletes into a
        // sweep-wide abort; refuse only OUTSIDE it.
        val nUpper = before.nTrain + before.nAppended
        val nLower = math.max(0L, nUpper - before.nDeleted)
        if (nRaw < nLower || nRaw > nUpper) {
          SessionScratch.releaseCheckpoint(corpus)
          throw new IllegalStateException(
            s"store $label at $path records raw pair $raw, but the " +
              s"pair holds $nRaw member(s) while the codes store's " +
              s"provenance bounds its live membership to " +
              s"[$nLower, $nUpper] " +
              s"(n_train=${before.nTrain} + " +
              s"n_appended=${before.nAppended}, " +
              s"n_deleted=${before.nDeleted} counted " +
              "early-never-late) — the pair has diverged " +
              "(a missed append/delete, or the locator points at a " +
              "foreign store). Remediating would silently retrain " +
              "over the wrong corpus; repair the pairing first " +
              "(re-point the locator or replay the missed " +
              "maintenance), then re-run the sweep.")
        }
        val (k, pol) = remediationShape(before,
          IvfPqIndex.recordedKOf(s, path), nRaw)
        IvfPqIndex.republishAs(corpus, path, k, pol)
        SessionScratch.releaseCheckpoint(corpus)
      case "bpe" =>
        // frozen transform: the artifact does not carry its training
        // corpus — the recorded locator names it (the ivfpq raw-pair
        // pattern). Refuse descriptively without one; the WAREHOUSE
        // sweep never routes a locator-less transform here (it queues
        // — see canAutoAct), so this refusal fires only on the pure
        // remediator's direct path, mirroring ivfpq's.
        val (src, where) = BpeModel.trainSourceOf(s, path).getOrElse(
          throw new IllegalStateException(
            s"store $label at $path is flagged for republish but " +
              "records no _train_source_locator — a frozen tokenizer " +
              "cannot be retrained from its merge table; record the " +
              "training corpus (BpeModel.recordTrainSource) or " +
              "republish it caller-driven with the training rows."))
        val train = s.read.parquet(src).where(expr(where))
          .select(col("text"))
        val retrained = Bpe.trainOn(Bpe.wordFreqOf(train), Bpe.Rounds)
        BpeModel.republish(s, retrained, path, nTrain = train.count())
        // the trained vocab frame stays localCheckpoint-pinned after
        // trainOn — dead once the merge table is republished
        SessionScratch.releaseCheckpoint(retrained.vocab)
      case "clf" =>
        val (src, where) = ClfModel.trainSourceOf(s, path).getOrElse(
          throw new IllegalStateException(
            s"store $label at $path is flagged for republish but " +
              "records no _train_source_locator — a frozen classifier " +
              "cannot be retrained from its weight table; record the " +
              "training corpus (ClfModel.recordTrainSource) or " +
              "republish it caller-driven with the training rows."))
        val train = s.read.parquet(src).where(expr(where))
          .select(col("doc_id"), col("text"))
        val retrained = Curation.trainClassifierOn(s, train).w
        ClfModel.republish(s, retrained, path, nTrain = train.count())
        SessionScratch.releaseCheckpoint(retrained)
    }
}

/** The nightly warehouse-maintenance job COMPOSED (round-13 verdict
  * #6): fsck every store (observe), vacuum exactly the ones fsck says
  * vacuum repairs (recover), then run the staleness decide-and-act on
  * the stores that record training provenance (remediate) — the three
  * proven arms (q233 observes, the per-store vacuums are spec-proven,
  * q234 acts) as ONE sweep whose readout hashes the whole episode.
  *
  * Damage tolerance: a crash-damaged store must never abort the sweep
  * — fsck is non-throwing by construction, vacuum runs only where the
  * report says it restores health (garbage present, no data loss, no
  * config drift), and remediation sees the POST-repair state, so a
  * torn append is repaired and the store still gets its staleness
  * verdict in the same pass. Damage beyond vacuum (data LOSS, config
  * drift) reads out as verdict `damaged` with healthy_after=0 — a
  * rebuild is the only remediation, and acting on such a store would
  * just hit its read paths' refusal — never a silent skip. What DOES
  * abort: a FLAGGED codes-only ivfpq store with no raw locator, or
  * with a raw pair whose membership diverged from the codes store's
  * provenance ([[StoreRemediator.act]]'s refusals) — operator errors
  * to surface, not damage to absorb. A FLAGGED frozen transform with
  * no training-corpus locator does NOT abort: pre-locator models are
  * the installed base, so their rows queue as `republish`/acted=0
  * ([[StoreRemediator.canAutoAct]]).
  *
  * 100 TB shape: per store, fsck is a bounded sidecar/listing read and
  * vacuum touches only garbage files; the only corpus-sized work is
  * the republish of stores BOTH healthy and flagged — the q234
  * thresholding economics, now downstream of repair.
  */
object WarehouseMaintenance {

  /** Kind registry — derived from [[StoreAudit.Kinds]] (one list to
    * extend when a ninth store kind lands).
    */
  private val Fscks = StoreAudit.Kinds

  private val Vacuums: Map[String,
      (SparkSession, String) => IndexMaintenance.VacuumReport] = Map(
    "dedup" -> (DedupIndex.vacuum _),
    "bm25" -> (TextIndex.vacuum _),
    "ngram" -> (NgramIndex.vacuum _),
    "bpe" -> (BpeModel.vacuum _),
    "clf" -> (ClfModel.vacuum _),
    "ivf" -> (IvfIndex.vacuum _),
    "ivfpq" -> (IvfPqIndex.vacuum _),
    "graph" -> (GraphIndex.vacuum _))

  /** Run fsck → vacuum-if-repairable → decide(-and-act where the kind
    * allows) over `(label, kind, path)` stores; one readout row per
    * store. Unknown kinds fail fast (the [[StoreAudit.audit]] rule).
    *
    * The verdict taxonomy distinguishes every state an operator
    * triages differently:
    *  - `damaged`   — unhealthy beyond vacuum for ANY kind (data loss,
    *    config drift): rebuild territory; acting would just hit the
    *    read paths' refusal, so the sweep reports and moves on.
    *  - `republish` — provenance flags staleness. acted=1 when the
    *    store can be auto-acted ([[StoreRemediator.canAutoAct]]: a
    *    self-contained ivf/graph, an ivfpq with its raw pair, a
    *    bpe/clf transform with a recorded training-corpus locator —
    *    the rebuild/retrain ran HERE); acted=0 for a
    *    decidable-but-not-auto-actable store (a frozen transform with
    *    no locator: retraining needs the training corpus, which the
    *    artifact does not carry and no sidecar names — the row IS the
    *    manual-action queue).
    *  - `blocked`   — the act itself REFUSED (an ivfpq raw pair that
    *    diverged from the codes store's recorded membership, or a
    *    locator whose store is unreadable): the staleness stands, the
    *    auto-path is unsafe, and a human must repair the pairing —
    *    but one store's broken pairing must not leave the REST of the
    *    warehouse unswept, so the refusal files as this store's row
    *    (same composed-sweep principle as `no-provenance`: the pure
    *    [[StoreRemediator]] throws, the sweep surfaces per-row). Only
    *    the refusal type ([[IllegalStateException]], the descriptive
    *    contract-refusal every store's read/act path uses) is caught;
    *    a true operator error still aborts.
    *  - `ok`        — provenance present, under the threshold.
    *  - `no-provenance` — a TRAINED kind
    *    ([[StoreRemediator.TrainedKinds]]: ivf/ivfpq/graph/bpe/clf)
    *    with no `_train_stats` (predates the sidecar): staleness is
    *    UNDECIDABLE, which must not read as "nothing to do" — where
    *    the pure remediator throws, the composed sweep surfaces it
    *    per-row. Gated on "records provenance when healthy", NOT on
    *    actability (the round-14 ADVICE): a pre-provenance BpeModel
    *    is exactly as undecidable as a pre-provenance IVF store.
    *  - `n/a`       — untrained kinds (dedup/bm25/ngram): no trained
    *    artifact, so no staleness exists; their maintenance is the
    *    append/compact family.
    */
  def sweep(s: SparkSession,
      stores: Seq[(String, String, String)]): DataFrame = {
    import s.implicits._
    val bad = stores.map(_._2).filterNot(Fscks.contains).distinct
    require(bad.isEmpty,
      s"unknown store kind(s) ${bad.mkString(", ")} — expected one of " +
        Fscks.keys.toSeq.sorted.mkString(", "))
    stores.map { case (label, kind, path) =>
      val before = Fscks(kind)(s, path)
      val repaired =
        if (before.vacuumRepairs) Some(Vacuums(kind)(s, path)) else None
      val post = if (repaired.isDefined) Fscks(kind)(s, path) else before
      val (verdict, acted) =
        if (!post.healthy) ("damaged", 0L)
        else post.trainStats match {
          case Some(ts) if StoreRemediator.needsRepublish(ts) =>
            if (StoreRemediator.canAutoAct(s, kind, path))
              try {
                StoreRemediator.act(s, label, kind, path, ts)
                ("republish", 1L)
              } catch { case e: IllegalStateException =>
                // the act's own refusal (diverged raw pair, unreadable
                // locator target) — report it and keep sweeping
                System.err.println(
                  s"[warehouse] $label blocked: ${e.getMessage}")
                ("blocked", 0L)
              }
            else ("republish", 0L)
          case Some(_) => ("ok", 0L)
          case None if StoreRemediator.TrainedKinds(kind) =>
            ("no-provenance", 0L)
          case None => ("n/a", 0L)
        }
      // re-fsck only when something changed on disk — the all-healthy
      // warehouse path must cost ONE metadata pass per store, not two
      val after =
        if (repaired.isEmpty && acted == 0L) post
        else Fscks(kind)(s, path)
      (label, kind,
        if (before.healthy) 1 else 0,
        repaired.map(_.uncommittedRemoved).getOrElse(0),
        repaired.map(_.staleGenerationsRemoved).getOrElse(0),
        verdict, acted,
        after.trainStats.map(_.nTrain),
        after.trainStats.map(_.nAppended),
        if (after.healthy) 1 else 0,
        after.generation)
    }.toDF("store", "kind", "healthy_before", "uncommitted_removed",
      "stale_generations_removed", "verdict", "acted", "n_train_after",
      "n_appended_after", "healthy_after", "generation_after")
  }
}
