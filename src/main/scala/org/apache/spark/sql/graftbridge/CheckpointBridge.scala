package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.classic.{SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the pinned RDD behind a `localCheckpoint()`ed DataFrame.
  *
  * `Dataset.localCheckpoint` materializes the plan into a storage-pinned
  * RDD wrapped in a [[LogicalRDD]], but exposes no public handle to
  * release those blocks — so iterative operators (BPE rounds, star
  * contraction, PageRank) would pin every superseded iteration for the
  * whole session. Living under org.apache.spark.sql lets the
  * private[sql] `queryExecution` resolve; same pattern as
  * [[ColumnBridge]].
  */
object CheckpointBridge {

  /** The checkpointed RDD a localCheckpointed frame scans, if the
    * frame's root is a [[LogicalRDD]] (it is, directly after
    * `localCheckpoint()`).
    */
  def checkpointRdd(df: DataFrame): Option[RDD[_]] = df match {
    case d: ClassicDataset[_] => d.queryExecution.analyzed match {
      case l: LogicalRDD => Some(l.rdd)
      case _             => None
    }
    case _ => None
  }

  /** Unpersist the blocks behind a localCheckpointed frame. The frame
    * must not be computed again afterwards — its lineage is truncated,
    * so the blocks are the only copy.
    */
  def release(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))

  /** A session clone sharing the context and current conf, with the
    * given overrides applied to the CLONE only — the scoping mechanism
    * for conf toggles that must not leak to queries planned concurrently
    * on the shared session (`cloneSession` is private[sql]; living in
    * this package resolves it, same as `queryExecution` above).
    */
  def cloneWithConf(spark: SparkSession, kv: (String, String)*)
      : SparkSession = spark match {
    case s: ClassicSparkSession =>
      val c = s.cloneSession()
      kv.foreach { case (k, v) => c.conf.set(k, v) }
      c
    case other =>
      // a silent fallthrough here would hand the UN-overridden session
      // back and partitionedTransientCheckpoint would quietly plan with
      // AQE on, losing its captured partitioning with no signal
      throw new IllegalStateException(
        "CheckpointBridge.cloneWithConf: cannot scope conf overrides " +
          s"on a non-classic SparkSession (${other.getClass.getName}); " +
          "the caller's conf-dependent contract would silently degrade.")
  }

  /** Re-root a DataFrame's logical plan under another session (of the
    * same context), so it plans/executes under THAT session's conf.
    */
  def inSession(spark: SparkSession, df: DataFrame): DataFrame =
    (spark, df) match {
      case (s: ClassicSparkSession, d: ClassicDataset[_]) =>
        ClassicDataset.ofRows(s, d.queryExecution.logical)
      case _ =>
        throw new IllegalStateException(
          "CheckpointBridge.inSession: cannot re-root a non-classic " +
            s"session/frame pair (${spark.getClass.getName}, " +
            s"${df.getClass.getName}); the frame would silently keep " +
            "executing under the original session's conf.")
    }
}
