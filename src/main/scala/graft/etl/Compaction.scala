package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the housekeeping operator every long-lived
  * 100 TB table needs: streaming micro-batches and per-partition
  * appends accumulate thousands of KB-sized files, and scan cost
  * becomes file-open-bound instead of byte-bound. Compaction rewrites
  * a directory into ~targetBytes files.
  *
  * The target file count comes from the INPUT's on-disk bytes — a
  * filesystem listing, not a data pass. The rewrite uses
  * `repartition(n)` (round-robin shuffle) rather than `coalesce(n)`:
  * coalesce merges whole input partitions and inherits their skew,
  * while round-robin yields uniformly sized output files — the point
  * of compacting. One shuffle of the data being rewritten is the
  * unavoidable cost either way at even sizing.
  */
object Compaction {

  /** Returns (fileCountBefore, fileCountChosen). The listing is
    * RECURSIVE, so partitioned layouts (files nested under
    * `key=value/` directories) size correctly; note the rewrite
    * itself is flat — re-partitioning the output is the caller's
    * layout decision (`df.write.partitionBy`), not compaction's.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new Path(inDir)
    val fs = in.getFileSystem(conf)
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.startsWith("_")) Nil
        else Seq(st)
      }
    val files = walk(in)
    val totalBytes = files.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(n)
      .write.mode("overwrite").parquet(outDir)
    (files.length, n)
  }
}
