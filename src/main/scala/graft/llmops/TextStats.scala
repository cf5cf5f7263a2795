package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Shared surface-statistics expressions for text operators. One
  * definition each for word counting, punctuation ratio, and the
  * normalized fingerprint — TextAnalysis (q61-q63) and the Curation
  * pipeline must agree on these by construction, not by copy.
  */
object TextStats {

  def nSpaces(text: Column): Column = {
    val t = trim(text)
    length(t) - length(regexp_replace(t, " ", ""))
  }

  /** Whitespace word count (arithmetic — immune to split-edge cases). */
  def nWords(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(nSpaces(text) + 1)

  def nPunct(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?]", ""))

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(nPunct(text).cast(DoubleType) / length(text))

  /** Lowercased, trimmed, space-collapsed canonical form. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), " +", " ")

  /** Content-addressable fingerprint of the normalized text. */
  def fingerprintMd5(text: Column): Column =
    md5(normalized(text).cast("binary"))
}
