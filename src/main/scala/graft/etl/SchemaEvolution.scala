package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift handling for repeated extracts — the ETL hardening the
  * reference's introspected catalogs imply but never implement: a source
  * system adds a column, drops one, or widens a type between nightly
  * extracts (db_connector.py:100-150 re-introspects every run, so the
  * shape CAN change under the pipeline). At 100 TB a drifted batch must
  * neither fail the load nor silently corrupt it.
  *
  * Policy implemented here (the standard warehouse contract):
  *   - added source columns are ACCEPTED (target schema grows);
  *   - removed source columns stay, padded NULL (history keeps shape);
  *   - numeric widenings (int→long, float→double, decimal precision
  *     growth) are cast UP to the wider side;
  *   - anything else (string→int, array→scalar, …) is BREAKING and the
  *     ingest refuses — silent coercion is how corpora rot.
  *
  * Everything is schema metadata work on the driver (O(columns), zero
  * data pass); the only executed ops are per-row casts/null-padding
  * inside the union projection.
  */
object SchemaEvolution {

  sealed trait Drift { def column: String }
  final case class Added(column: String, dt: DataType) extends Drift
  final case class Removed(column: String, dt: DataType) extends Drift
  final case class Widened(column: String, from: DataType, to: DataType)
      extends Drift
  final case class Breaking(column: String, from: DataType, to: DataType)
      extends Drift

  /** Numeric widening lattice: the wider type if (from, to) are
    * compatible in either direction, None if identical or breaking.
    */
  private def widen(a: DataType, b: DataType): Option[DataType] =
    (a, b) match {
      case (x, y) if x == y => None
      case (ByteType | ShortType | IntegerType, LongType) => Some(LongType)
      case (LongType, ByteType | ShortType | IntegerType) => Some(LongType)
      case (ByteType | ShortType, IntegerType) => Some(IntegerType)
      case (IntegerType, ByteType | ShortType) => Some(IntegerType)
      case (ByteType, ShortType) | (ShortType, ByteType) => Some(ShortType)
      case (FloatType, DoubleType) | (DoubleType, FloatType) =>
        Some(DoubleType)
      case (x: DecimalType, y: DecimalType) =>
        // widen BOTH the integer digits and the scale: max(precision),
        // max(scale) can LOSE integer digits — DECIMAL(10,2) vs
        // DECIMAL(8,6) would yield DECIMAL(10,6) with only 4 integer
        // digits, silently nulling existing large values on the cast.
        // When intDigits + scale exceeds DECIMAL's 38-digit ceiling
        // there is NO lossless widened type: capping precision drops
        // integer digits (nulls large values), reducing scale truncates
        // fractional digits of already-loaded history — both are the
        // silent corruption this policy exists to refuse, so the drift
        // is Breaking, not Widened.
        val intDigits = math.max(x.precision - x.scale,
          y.precision - y.scale)
        val scale = math.max(x.scale, y.scale)
        if (intDigits + scale > DecimalType.MAX_PRECISION) None
        else Some(DecimalType(intDigits + scale, scale))
      case _ => None
    }

  /** Classify every column of target-vs-incoming. Pure metadata. */
  def driftReport(target: StructType, incoming: StructType): Seq[Drift] = {
    val t = target.fields.map(f => f.name -> f.dataType).toMap
    val i = incoming.fields.map(f => f.name -> f.dataType).toMap
    val added = incoming.fields.collect {
      case f if !t.contains(f.name) => Added(f.name, f.dataType) }
    val removed = target.fields.collect {
      case f if !i.contains(f.name) => Removed(f.name, f.dataType) }
    val changed = target.fields.collect {
      case f if i.contains(f.name) && i(f.name) != f.dataType =>
        widen(f.dataType, i(f.name)) match {
          case Some(w) => Widened(f.name, f.dataType, w)
          case None    => Breaking(f.name, f.dataType, i(f.name))
        }
    }
    (added ++ removed ++ changed).sortBy(_.column)
  }

  /** The evolved target schema after accepting a drifted batch: union of
    * columns (target order first, then new ones), widened types.
    * Throws on breaking drift.
    */
  def evolvedSchema(target: StructType, incoming: StructType): StructType = {
    val drifts = driftReport(target, incoming)
    val breaking = drifts.collect { case b: Breaking => b }
    require(breaking.isEmpty,
      s"breaking schema drift refused: ${breaking.mkString(", ")}")
    val widened = drifts.collect { case w: Widened => w.column -> w.to }.toMap
    val kept = target.fields.map { f =>
      StructField(f.name, widened.getOrElse(f.name, f.dataType),
        nullable = true)
    }
    val added = incoming.fields.filterNot(f =>
      target.fieldNames.contains(f.name))
      .map(f => StructField(f.name, f.dataType, nullable = true))
    StructType(kept ++ added)
  }

  /** Project a frame onto the evolved schema: missing columns NULL,
    * drifted numerics cast up, column order normalized.
    */
  def alignTo(schema: StructType, df: DataFrame): DataFrame = {
    val cols = schema.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Drift-tolerant ingest: align both sides to the evolved schema and
    * union. The existing data is re-projected (cheap: null-pad + cast),
    * never rewritten on disk until the caller loads — at scale the
    * evolved schema is applied to the TABLE metadata and only the new
    * partition is written.
    */
  def ingest(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val evolved = evolvedSchema(existing.schema, incoming.schema)
    alignTo(evolved, existing).unionByName(alignTo(evolved, incoming))
  }
}
