package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: time named registry queries in one warmed session.
  * Usage: runMain graft.TimeQ <sfDir> <name...>
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    // SPARK_GRAFT_CPUS lets steady-state numbers be taken at the SAME
    // parallelism as the driver's bench (4 cpus) — comparing a
    // local[32] TimeQ reading against a 4-cpu marathon sample is
    // apples-to-oranges (the r8 q159 "residual" investigation)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
        val c = ops.SessionScratch.withEvictionDiagnostics(
          byName(n).run(spark, sfDir).count())
        println(f"[timeq] $n rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
        ops.SessionScratch.evictTransients()
      }
    }
    spark.stop()
  }
}
