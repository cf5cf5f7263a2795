package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** MySQL TIME-type helpers (SURVEY.md §1.2, §7 hard part (a)).
  *
  * The reference's HR schema has TIME columns (`check_in`/`check_out`,
  * sample_metadata.py:120-121); Spark has no TIME type, so the engine
  * carries them as "HH:mm:ss" strings plus these arithmetic helpers —
  * all built-in expressions (codegen'd), no UDFs.
  */
object TimeOfDay {

  /** "HH:mm:ss" (or "HH:mm") → seconds since midnight; null when
    * malformed (try-cast discipline for ANSI mode).
    */
  def toSeconds(time: Column): Column = {
    // try_element_at / try_cast throughout: ANSI mode turns both an
    // out-of-bounds index and a malformed cast into runtime errors.
    val parts = split(time, ":")
    val h = try_element_at(parts, lit(1)).try_cast(IntegerType)
    val m = try_element_at(parts, lit(2)).try_cast(IntegerType)
    val sRaw = try_element_at(parts, lit(3))
    val s = sRaw.try_cast(IntegerType)
    // a PRESENT-but-malformed or out-of-range seconds field is invalid;
    // an ABSENT one ("HH:mm") defaults to 0
    val secondsBad = sRaw.isNotNull && (s.isNull || s < 0 || s > 59)
    when(h.isNull || m.isNull || h < 0 || h > 23 || m < 0 || m > 59
      || secondsBad || size(parts) > 3, null)
      .otherwise(h * 3600 + m * 60 + coalesce(s, lit(0)))
  }

  /** seconds since midnight → "HH:mm:ss". */
  def fromSeconds(secs: Column): Column =
    concat_ws(":",
      lpad((secs / 3600).cast(IntegerType).cast("string"), 2, "0"),
      lpad(((secs % 3600) / 60).cast(IntegerType).cast("string"), 2, "0"),
      lpad((secs % 60).cast(IntegerType).cast("string"), 2, "0"))

  /** Duration end - start in seconds (e.g. worked hours from
    * check_in/check_out); negative spans wrap past midnight.
    */
  def diffSeconds(start: Column, end: Column): Column = {
    val d = toSeconds(end) - toSeconds(start)
    when(d < 0, d + 86400).otherwise(d)
  }
}
