package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query at
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * A short warmup (session init, codegen, parquet footer cache) runs
  * before timing so the first query measured doesn't absorb one-off JVM
  * costs — mirroring steady-state behavior on a long-lived cluster.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: exercise scheduler + codegen + parquet reader once.
    spark.range(1000000).selectExpr("sum(id)").collect()
    ops.Tables.names.foreach { n =>
      try ops.Tables(spark, sfDir).table(n).limit(1).count()
      catch { case _: Throwable => () }
    }

    // default: full registry (the driver's per-round measurement);
    // headline mode times only the flagged subset for quick iteration
    val timed =
      if (sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("headline"))
        SparkEntry.benchQueries
      else SparkEntry.registry
    val results = timed.sortBy(_.name).map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
