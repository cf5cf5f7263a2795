package graft.observe

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.util.QueryExecutionListener

/** One record per completed query action: wall duration plus the plan
  * facts operations teams alert on — rows scanned, bytes shuffled,
  * shuffle/scan counts. Collected from the EXECUTED adaptive plan's
  * SQLMetrics (accumulator-backed, so values are cluster-wide sums,
  * not driver estimates).
  */
final case class ExecMetrics(
    funcName: String,
    durationMs: Long,
    outputRows: Long,
    scanRows: Long,
    shuffleBytes: Long,
    numShuffles: Int,
    numScans: Int)

/** Engine observability (the reference has no execution visibility at
  * all — its DB round-trip is opaque): a `QueryExecutionListener` that
  * turns every completed action into an [[ExecMetrics]] row. At 100 TB
  * this is how regressions surface — a query whose shuffleBytes
  * doubled week-over-week is the alert, long before wall time moves on
  * a busy cluster. Register via [[MetricsCollector.attach]].
  */
class MetricsCollector(maxRecords: Int = 10000)
    extends QueryExecutionListener {

  // bounded: an always-on listener on a long-lived session must not
  // grow driver memory per action — oldest records evict
  private val buf = new ConcurrentLinkedQueue[ExecMetrics]
  private val size = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Walk the executed plan THROUGH adaptive wrappers, query stages (a
    * plain `collect` stops at AdaptiveSparkPlanExec, which is a leaf),
    * AND subquery plans (which hang off expressions, not children — a
    * scalar-subquery scan would otherwise be invisible).
    */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case other                    => other.children
    }
    p +: (inner ++ p.subqueries).flatMap(nodes)
  }

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit = {
    val all = nodes(qe.executedPlan)
    val scans = all.filter(
      _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    val shuffles = all.collect { case s: ShuffleExchangeLike => s }
    def metric(p: SparkPlan, name: String): Long =
      p.metrics.get(name).map(_.value).getOrElse(0L)
    buf.add(ExecMetrics(
      funcName = funcName,
      durationMs = durationNs / 1000000L,
      outputRows = all.iterator
        .flatMap(_.metrics.get("numOutputRows").map(_.value))
        .nextOption().getOrElse(-1L),
      scanRows = scans.map(metric(_, "numOutputRows")).sum,
      shuffleBytes = shuffles.map(metric(_, "dataSize")).sum,
      numShuffles = shuffles.size,
      numScans = scans.size))
    if (size.incrementAndGet() > maxRecords) {
      if (buf.poll() != null) size.decrementAndGet()
      ()
    }
  }

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit = ()

  def snapshot: Seq[ExecMetrics] = buf.asScala.toSeq

  def clear(): Unit = { buf.clear(); size.set(0) }
}

object MetricsCollector {
  /** Register a fresh collector on the session's listener bus. */
  def attach(spark: SparkSession): MetricsCollector = {
    val m = new MetricsCollector
    spark.listenerManager.register(m)
    m
  }
}
