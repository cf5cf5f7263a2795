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
    while (r != null) { r.unpersist(blocking = true); r = transients.poll() }
  }

  /** Immediately release one superseded localCheckpointed frame — for
    * iterative operators where round i's blocks are dead the moment
    * round i+1 is materialized (BPE vocab rounds, star-contraction edge
    * sets). Keeps resident checkpoint storage at one round, not the
    * whole history.
    */
  def releaseCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(df)

  /** [[transientCheckpoint]] that CAPTURES a hash partitioning on
    * `keys`, so iterative consumers (Pregel rounds, training epochs)
    * see `hashpartitioning(keys)` on the checkpointed scan and never
    * re-exchange it. AQE is off for the one eager materialization —
    * under AQE the pre-execution partitioning is Unknown and the
    * LogicalRDD loses it (the same reason a persisted repartition
    * reads as un-partitioned inside InMemoryRelation). The conf toggle
    * is serialized here (concurrent callers would race the
    * save/restore into a stuck value) on a DEDICATED lock — the
    * SessionScratch object monitor also guards memo(), whose bodies
    * run multi-second ingests, and sharing it would serialize this
    * bounded toggle behind whole training runs; unrelated queries
    * planned during the materialization window compile without AQE —
    * the documented cost of capturing the partitioning.
    */
  private val aqeToggleLock = new Object

  def partitionedTransientCheckpoint(df: org.apache.spark.sql.DataFrame,
      keys: Seq[org.apache.spark.sql.Column])
      : org.apache.spark.sql.DataFrame = aqeToggleLock.synchronized {
    val conf = df.sparkSession.conf
    val key = "spark.sql.adaptive.enabled"
    val saved = conf.getOption(key)
    conf.set(key, "false")
    try transientCheckpoint(df.repartition(keys: _*))
    finally saved match {
      case Some(v) => conf.set(key, v)
      case None    => conf.unset(key)
    }
  }
}
