package graft.ops

/** Session-scoped scratch areas for one-time ingests (bucket tables,
  * format exports): the shared memoize-per-(purpose, application,
  * input-dir) pattern.
  *
  *  - re-runs in the same session reuse the ingest (Bench reps,
  *    ExplainAudit, Verify must not re-pay or re-time it);
  *  - DIFFERENT input dirs coexist — consumers scope paths/table names
  *    with [[dirTag]], so an sf0.001 run followed by an sf0.01 run in
  *    the same JVM does not clobber or collide (a last-dir-only memo
  *    would re-ingest into a still-populated location);
  *  - the appId in the base path keeps concurrent JVMs from racing;
  *  - a shutdown hook best-effort-deletes each base dir so repeated
  *    runs don't accumulate scratch copies in /tmp.
  */
object SessionScratch {

  private val values =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), Any]
  private val hooked =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** Stable filesystem-safe tag for an input dir. A cryptographic-hash
    * prefix (64 bits of SHA-256), not String.hashCode: the once() memo is
    * keyed by the full dir, so a 32-bit tag collision between two dirs
    * would let the second ingest silently overwrite the first's scratch
    * tables while both memo entries read "done".
    */
  def dirTag(dir: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString

  /** Scratch base path for (purpose, application); registers a
    * delete-on-exit hook the first time it is handed out.
    */
  def base(purpose: String, app: String): String = {
    val p = s"/tmp/graft_${purpose}_$app"
    hooked.getOrElseUpdate(p, {
      sys.addShutdownHook {
        def del(f: java.io.File): Unit = {
          val cs = f.listFiles()
          if (cs != null) cs.foreach(del)
          f.delete(); ()
        }
        del(new java.io.File(p))
      }
      ()
    })
    p
  }

  /** Build `value` exactly once per (purpose, application, input dir)
    * and cache it for the session — the generalization of [[once]] for
    * ingests whose product is a VALUE (a checkpointed DataFrame, a
    * trained model) rather than only a filesystem side effect. One memo
    * path — one lifecycle/eviction story — for q88's bucket tables,
    * q162's Z-order layout AND the PageRank edge lists (r6 verdict #3:
    * GraphRank previously rolled its own TrieMap for the same concept).
    */
  def memo[T](purpose: String, app: String, dir: String)(value: => T): T =
    synchronized {
      values.getOrElseUpdate((purpose, app, dir), value).asInstanceOf[T]
    }

  /** Run `ingest` exactly once per (purpose, application, input dir). */
  def once(purpose: String, app: String, dir: String)(ingest: => Unit): Unit =
    memo(purpose, app, dir)(ingest)

  // ---- transient checkpoint ledger -------------------------------------
  //
  // localCheckpoint() pins executor storage for the session with no
  // public release handle, so per-QUERY checkpoints (PageRank's degree
  // table, star contraction's final edge set) accumulate across a long
  // run: the round-7 bench marathon (169 queries × 2 passes in one JVM)
  // read the fixpoint family at 2-3× steady state purely from this
  // block-manager pressure. Checkpoints that live only for one query go
  // through [[transientCheckpoint]]; the harness mains call
  // [[evictTransients]] once the query's result is fully consumed.
  // MEMOIZED checkpoints (edge lists, bucket tables) deliberately do NOT
  // register — they are the cross-rep reuse the memo contract promises.

  private val transients =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]

  /** `df.localCheckpoint()` whose pinned blocks are released by the next
    * [[evictTransients]] — for checkpoints consumed within one query.
    * The returned frame must not be used past that eviction (lineage is
    * truncated; the blocks are the only copy).
    */
  def transientCheckpoint(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val out = df.localCheckpoint()
    registerTransient(out)
    out
  }

  /** Register an ALREADY-localCheckpointed frame for the next
    * [[evictTransients]] — for loops where the final checkpoint is only
    * identified after the fixpoint test (star contraction's last edge
    * set).
    */
  def registerTransient(df: org.apache.spark.sql.DataFrame): Unit =
    org.apache.spark.sql.graftbridge.CheckpointBridge.checkpointRdd(df)
      .foreach(transients.add)

  /** Release every transient checkpoint registered since the last call.
    * Safe once the current query's result has been fully consumed
    * (counted / written); memoized checkpoints are unaffected.
    * BLOCKING — the harness calls this between timed queries, and an
    * async unpersist would overlap block deletion with the next
    * query's measured window (the noise the per-rep samples exist to
    * rule out).
    */
  def evictTransients(): Unit = {
    var r = transients.poll()
    while (r != null) {
      evictedIds.add(r.id)
      r.unpersist(blocking = true)
      r = transients.poll()
    }
  }

  /** Immediately release one superseded localCheckpointed frame — for
    * iterative operators where round i's blocks are dead the moment
    * round i+1 is materialized (BPE vocab rounds, star-contraction edge
    * sets). Keeps resident checkpoint storage at one round, not the
    * whole history.
    */
  def releaseCheckpoint(df: org.apache.spark.sql.DataFrame): Unit = {
    org.apache.spark.sql.graftbridge.CheckpointBridge.checkpointRdd(df)
      .foreach(r => evictedIds.add(r.id))
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(df)
  }

  /** [[transientCheckpoint]] that CAPTURES a hash partitioning on
    * `keys`, so iterative consumers (Pregel rounds, training epochs)
    * see `hashpartitioning(keys)` on the checkpointed scan and never
    * re-exchange it. AQE must be off for the one eager materialization —
    * under AQE the pre-execution partitioning is Unknown and the
    * LogicalRDD loses it (the same reason a persisted repartition
    * reads as un-partitioned inside InMemoryRelation). The toggle is
    * SCOPED to a session clone: the repartition+checkpoint plans under
    * a cloned session whose conf has AQE disabled, so the shared
    * session's conf is never mutated and queries planned concurrently
    * keep AQE (previously this toggled the shared conf and anything
    * planned in the window silently compiled without AQE). The
    * materialized LogicalRDD — which carries the captured partitioning
    * — is re-rooted back into the caller's session before returning.
    */
  def partitionedTransientCheckpoint(df: org.apache.spark.sql.DataFrame,
      keys: Seq[org.apache.spark.sql.Column])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    val orig = df.sparkSession
    val scoped = CheckpointBridge.cloneWithConf(orig,
      "spark.sql.adaptive.enabled" -> "false")
    val ck = CheckpointBridge.inSession(scoped, df)
      .repartition(keys: _*).localCheckpoint()
    val out = CheckpointBridge.inSession(orig, ck)
    registerTransient(out)
    out
  }

  // ---- eviction diagnostics --------------------------------------------
  //
  // A frame that escapes its query and is read after evictTransients
  // fails deep inside Spark with "Checkpoint block rdd_N_i not found!" —
  // technically correct (lineage is truncated; the blocks were the only
  // copy) but useless for diagnosing WHICH contract was violated. The
  // ledger remembers every RDD id it released so the harness can turn
  // that failure into a descriptive contract-violation error.

  private val evictedIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  private val BlockIdRe = "rdd_(\\d+)_".r

  /** If `e` (or any cause) is a missing-checkpoint-block failure whose
    * RDD id this ledger evicted, a descriptive explanation of the
    * contract violation; None for unrelated failures.
    */
  def explainEvictionFailure(e: Throwable): Option[String] = {
    // bounded walk: a circular cause chain (a cause referencing an
    // ancestor) must not hang the diagnostics path itself
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Throwable, java.lang.Boolean]())
    val msgs = Iterator.iterate(e)(_.getCause)
      .takeWhile(t => t != null && seen.add(t))
      .take(20)
      .flatMap(t => Option(t.getMessage)).toSeq
    msgs.collectFirst {
      case m if m.contains("not found") &&
        BlockIdRe.findFirstMatchIn(m)
          .exists(g => evictedIds.contains(g.group(1).toInt)) =>
        val id = BlockIdRe.findFirstMatchIn(m).get.group(1)
        s"TRANSIENT CHECKPOINT REUSED AFTER EVICTION: rdd_$id was a " +
          "transient checkpoint released by SessionScratch.evictTransients " +
          "(or releaseCheckpoint). Frames built on transientCheckpoint " +
          "are valid only until the harness finishes consuming the " +
          "query's result — a consumer retained this frame across " +
          "queries. Fix: fully materialize (collect/write) before " +
          "eviction, or use a memoized (non-transient) checkpoint for " +
          "cross-query state."
    }
  }

  /** Run `body`, rethrowing any missing-evicted-block failure wrapped
    * in a descriptive contract-violation error — used by the harness
    * mains so lifecycle violations fail loudly and explainably.
    */
  def withEvictionDiagnostics[T](body: => T): T =
    try body
    catch {
      case e: Throwable =>
        explainEvictionFailure(e) match {
          case Some(msg) => throw new IllegalStateException(msg, e)
          case None      => throw e
        }
    }
}
