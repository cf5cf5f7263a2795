package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the unigram-LM Viterbi segmentation
  * (graft.llmops.UnigramLm) — optimization r15.
  *
  * The previous formulation unrolled the [[graft.llmops.UnigramLm.MaxWord]]-step
  * DP into ~34 chained projections (forward cells + backtrack), and
  * profiling showed ~90% of q175's steady-state wall was Catalyst
  * re-analyzing/optimizing that plan per invocation (jobWall 0.17 s of
  * a 1.8-2.0 s gate). This expression runs the identical DP as ONE
  * imperative loop per row — the plan is a single projection, and the
  * work moves from the driver's rule engine to codegen'd row
  * evaluation (guide §1.2: fix the algorithm's *plan shape*, then the
  * per-task work).
  *
  * Semantics are a bit-exact port of the unrolled form (and therefore
  * of the DuckDB oracle's generated CTE chain — q174/q175 replay every
  * cell):
  *
  *  - positions/lengths count CODE POINTS (Spark `length`/`substring`
  *    semantics, matching DuckDB);
  *  - forward cell j (1-based) over splits i ∈ [max(0, j−MaxPiece), j):
  *    candidate = (s_i + Big − min(cnt(word[i..j)), CntCap))·32 + i,
  *    s_i = e_i div 32 (s_0 = 0), skipped when the piece is absent
  *    from the word's vocab map or cell i is itself unreachable;
  *    e_j = min over candidates (ties impossible — the low 5 bits
  *    differ), unreachable when no candidate survives;
  *  - backtrack from p_0 = len: emit word[a..pos) with a = e_pos % 32,
  *    stop at pos = 0 or at an unreachable cell (the unrolled form's
  *    null chain), pieces emitted BACK-TO-FRONT — identical order;
  *  - words longer than MaxWord cannot occur (cappedWords truncates);
  *    the expression returns the empty segmentation for them, which is
  *    what the unrolled form's out-of-range backpointer read produced;
  *  - NULL word or NULL map → NULL (null-intolerant, like the chain).
  */
case class ViterbiPieces(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, MapType(StringType, LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (STRING, MAP<STRING, BIGINT>), " +
            s"got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(word: Any, m: Any): Any =
    ViterbiPieces.segment(word.asInstanceOf[UTF8String],
      m.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, m) =>
      s"${ev.value} = graft.functions.ViterbiPieces.segment($w, $m);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ViterbiPieces =
    copy(left = newLeft, right = newRight)
}

object ViterbiPieces {

  /** The DP core, shared by interpreted eval and generated code (the
    * CharPolyHash static-helper pattern; one non-virtual call per row
    * inside whole-stage codegen). Constants come from UnigramLm so the
    * expression and the oracle generator cannot drift apart.
    */
  def segment(wordU: UTF8String, m: MapData): ArrayData = {
    import graft.llmops.UnigramLm.{Big, CntCap, MaxPiece, MaxWord}
    val word = wordU.toString
    val cps = word.codePoints().toArray
    val len = cps.length
    if (len == 0 || len > MaxWord)
      return new GenericArrayData(Array.empty[Any])
    // the word's piece→cnt map (≤ MaxWord·MaxPiece entries)
    val keys = m.keyArray()
    val vals = m.valueArray()
    val n = m.numElements()
    val hm = new java.util.HashMap[String, java.lang.Long](n * 2)
    var k = 0
    while (k < n) {
      hm.put(keys.getUTF8String(k).toString, vals.getLong(k))
      k += 1
    }
    def sub(i: Int, j: Int): String = new String(cps, i, j - i)
    // forward: packed cells e_j = (score)·32 + split, unreachable
    // cells marked absent (the unrolled form's NULL chain)
    val e = new Array[Long](len + 1)
    val has = new Array[Boolean](len + 1)
    var j = 1
    while (j <= len) {
      var best = Long.MaxValue
      var found = false
      var i = math.max(0, j - MaxPiece)
      while (i < j) {
        if (i == 0 || has(i)) {
          val cnt = hm.get(sub(i, j))
          if (cnt != null) {
            val sPrev = if (i == 0) 0L else e(i) / 32
            val cand = (sPrev + Big - math.min(cnt.longValue, CntCap)) * 32 + i
            if (cand < best) { best = cand; found = true }
          }
        }
        i += 1
      }
      if (found) { e(j) = best; has(j) = true }
      j += 1
    }
    // backtrack, back-to-front
    val out = new java.util.ArrayList[AnyRef](MaxWord)
    var pos = len
    while (pos > 0 && has(pos)) {
      val a = (e(pos) % 32).toInt
      out.add(UTF8String.fromString(sub(a, pos)))
      pos = a
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API (the CharPolyHash bridge pattern). */
  def viterbiPieces(word: Column, m: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ViterbiPieces(
      ColumnBridge.expression(word), ColumnBridge.expression(m)))
  }
}
