package graft

import org.apache.spark.sql.functions._

import graft.observe.MetricsCollector
import graft.ops.Tables

class ObservabilitySpec extends SparkTestBase {

  test("MetricsCollector reports scan rows, shuffles, and duration " +
      "from the executed adaptive plan") {
    val m = MetricsCollector.attach(spark)
    try {
      val t = Tables(spark, sfDir)
      val nOrders = t.orders.count()
      t.orders
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .collect()
      // events are async AND the session is shared across suites, so
      // stale records from earlier actions may land too — poll for THE
      // record matching this query's signature
      val deadline = System.nanoTime() + 30L * 1000000000L
      def find = m.snapshot.find(r =>
        r.funcName == "collect" && r.scanRows == nOrders && r.numScans == 1)
      while (find.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val rec = find.getOrElse(
        fail(s"no matching record among:\n${m.snapshot.mkString("\n")}"))
      assert(rec.durationMs >= 0)
      // the partial aggregates shuffle at least once (AQE may add more
      // exchanges, never fewer)
      assert(rec.numShuffles >= 1, rec.toString)
      assert(rec.shuffleBytes > 0, rec.toString)
      // the final operator's row count is the group count
      assert(rec.outputRows >= 1 && rec.outputRows <= nOrders, rec.toString)
    } finally spark.listenerManager.unregister(m)
  }

  test("MetricsCollector sees scans inside scalar subqueries") {
    val m = MetricsCollector.attach(spark)
    try {
      val t = Tables(spark, sfDir)
      val nOrders = t.orders.count()
      val nCust = t.customer.count()
      t.registerAll()
      spark.sql(
        """SELECT count(*) FROM orders
           WHERE o_totalprice > (SELECT avg(c_acctbal) FROM customer)""")
        .collect()
      // the subquery's customer scan must be visible: total scanned rows
      // cover BOTH tables
      val deadline = System.nanoTime() + 30L * 1000000000L
      def find = m.snapshot.find(r =>
        r.funcName == "collect" && r.scanRows == nOrders + nCust)
      while (find.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(find.isDefined,
        s"subquery scan not counted; records:\n${m.snapshot.mkString("\n")}")
      assert(find.get.numScans == 2, find.get.toString)
    } finally spark.listenerManager.unregister(m)
  }
}
