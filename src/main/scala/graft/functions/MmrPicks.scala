package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for the MMR greedy diversified rerank
  * (graft.llmops.Similarity q219) — optimization r16.
  *
  * The previous formulation ran the 5 greedy rounds as a driver loop of
  * DataFrame stages: per round a pairwise-penalty aggregate, an
  * anti-membership join, a pick window and a transient checkpoint —
  * 56 Spark jobs per invocation, of which profiling attributed ~1.2 s
  * to per-job scheduling/AQE glue alone (jobWall 2.1 s of a 3.3 s idle
  * wall). But the greedy selection is PER-QUERY LOCAL work over a
  * probe-bounded frame: ≤16 candidates and their 16² pairwise dots per
  * qid, never anything corpus-sized. This expression runs the identical
  * selection as one imperative loop per qid over
  * `collect_list(struct(cid, fq, ec))` — the guide §1.2 move (fix the
  * plan shape first): one aggregation exchange replaces 4 rounds × 3
  * shuffles, and the per-row work is whole-stage-codegen'd.
  *
  * Semantics are a bit-exact port of the unrolled loop (and therefore
  * of the DuckDB oracle's mmrRoundCtes replay):
  *
  *  - fab(a, b) = SUM_d floor(ea_d·1e7)·floor(eb_d·1e7) as exact int64 —
  *    identical to [[FixedDotSum]];
  *  - round 1: score = [[MmrPicks.RelW]]·fq, pick = argmax,
  *    ties → smaller cid (the `row_number ORDER BY score DESC, cid`
  *    rule);
  *  - rounds 2..[[MmrPicks.Rounds]]: pen(c) = MAX_{s∈S} fab(c, s) over
  *    the selected set S (computed incrementally — max is associative),
  *    score = RelW·fq − PenW·pen, same argmax/tie rule over the
  *    unselected candidates;
  *  - fewer candidates than rounds → the loop stops when none remain
  *    (the unrolled form's empty round-t window);
  *  - output: array<struct<cid, pick, score>> in pick order — the
  *    selection is order-independent (argmax with a total tie-break
  *    over a set), so the non-deterministic collect_list order cannot
  *    change the result;
  *  - NULL input array, null struct entry, null cid/fq/ec, null vector
  *    element or mismatched vector lengths → NULL result (degenerate
  *    input; the fixture corpus has none — matches FixedDotSum's
  *    null-poisoning).
  */
case class MmrPicks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MmrPicks.OutType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(c, f, e)), _)
        if c.dataType == LongType && f.dataType == LongType &&
          (e.dataType match {
            case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
            case _ => false
          }) =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRUCT<BIGINT, BIGINT, " +
          s"ARRAY<FLOAT|DOUBLE>>>, got ${t.sql}")
  }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(StructType(fields), _) => fields(2).dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    case _ => false
  }

  override def nullSafeEval(cands: Any): Any =
    MmrPicks.picks(cands.asInstanceOf[ArrayData], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val f = elemIsFloat
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MmrPicks.picks($c, $f);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MmrPicks =
    copy(child = newChild)
}

object MmrPicks {

  /** Greedy rounds / scoring weights — λ=0.7 in exact int64 fixed
    * point: score = 7·sim(q,c) − 3·max-pairwise (the ×10 common scale
    * dropped). [[graft.llmops.Similarity]] generates the oracle's
    * unrolled round CTEs from the SAME constants so the expression and
    * the oracle cannot drift apart (the ViterbiPieces discipline).
    */
  val Rounds = 5
  val RelW = 7L
  val PenW = 3L

  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("pick", IntegerType, nullable = false),
    StructField("score", LongType, nullable = false))),
    containsNull = false)

  /** The greedy core, shared by interpreted eval and generated code
    * (the CharPolyHash static-helper pattern). Returns null on
    * degenerate input (see the class doc).
    */
  def picks(cands: ArrayData, elemIsFloat: Boolean): ArrayData = {
    val n = cands.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val cid = new Array[Long](n)
    val fq = new Array[Long](n)
    val fx = new Array[Array[Long]](n)
    var dim = -1
    var i = 0
    while (i < n) {
      if (cands.isNullAt(i)) return null
      val row = cands.getStruct(i, 3)
      if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2)) return null
      cid(i) = row.getLong(0)
      fq(i) = row.getLong(1)
      val ec = row.getArray(2)
      val d = ec.numElements()
      if (dim < 0) dim = d else if (d != dim) return null
      val v = new Array[Long](d)
      var j = 0
      while (j < d) {
        if (ec.isNullAt(j)) return null
        val x = if (elemIsFloat) ec.getFloat(j).toDouble else ec.getDouble(j)
        v(j) = math.floor(x * 1e7).toLong
        j += 1
      }
      fx(i) = v
      i += 1
    }
    def fab(a: Int, b: Int): Long = {
      val va = fx(a); val vb = fx(b)
      var acc = 0L
      var j = 0
      while (j < dim) { acc += va(j) * vb(j); j += 1 }
      acc
    }
    val selected = new Array[Boolean](n)
    val pen = new Array[Long](n)
    val out = new java.util.ArrayList[AnyRef](Rounds)
    var round = 1
    while (round <= Rounds) {
      var best = -1
      var bestScore = 0L
      var i2 = 0
      while (i2 < n) {
        if (!selected(i2)) {
          val sc =
            if (round == 1) RelW * fq(i2)
            else RelW * fq(i2) - PenW * pen(i2)
          if (best < 0 || sc > bestScore ||
              (sc == bestScore && cid(i2) < cid(best))) {
            best = i2
            bestScore = sc
          }
        }
        i2 += 1
      }
      if (best < 0) return new GenericArrayData(out.toArray)
      selected(best) = true
      out.add(new GenericInternalRow(
        Array[Any](cid(best), round, bestScore)))
      // fold the new member into every unselected candidate's running
      // max-pairwise penalty (max is associative: identical to the
      // unrolled form's per-round MAX over the whole selected set)
      var i3 = 0
      while (i3 < n) {
        if (!selected(i3)) {
          val d = fab(i3, best)
          if (round == 1 || d > pen(i3)) pen(i3) = d
        }
        i3 += 1
      }
      round += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API (the CharPolyHash bridge pattern). */
  def mmrPicks(cands: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MmrPicks(ColumnBridge.expression(cands)))
  }
}
