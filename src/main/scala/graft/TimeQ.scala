package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: time named registry queries in one warmed session.
  * Usage: runMain graft.TimeQ <sfDir> <name...>
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    // warm
    spark.range(10000000L).selectExpr("sum(id)").collect()
    names.foreach { n =>
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val c = byName(n).run(spark, sfDir).count()
        println(f"[timeq] $n rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
        ops.SessionScratch.evictTransients()
      }
    }
    spark.stop()
  }
}
