package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding dot products — the hot path
  * of the similarity/dedup family (graft.llmops.Similarity, Dedup.q44).
  *
  * The HOF formulation (`zip_with` + `aggregate`, PortableHash.exactDot/
  * fastDot) is CodegenFallback: every element pair allocates and goes
  * through interpreted lambda dispatch. These expressions emit a tight
  * Java loop via `doGenCode` and stay inside whole-stage codegen — same
  * semantics, roughly an order of magnitude less per-pair overhead. At
  * 100 TB the dot product runs per candidate pair, so per-element
  * interpretation is the difference between CPU-bound and shuffle-bound.
  *
  * Semantics mirrored EXACTLY from the HOF forms (and the DuckDB oracle):
  *  - [[FixedDotSum]]: SUM_i floor(a_i*1e7) * floor(b_i*1e7) as exact
  *    int64 — `exactDot` divides by 1e14 at the boundary. floor is
  *    tie-free, so both engines produce identical integers.
  *  - [[DoubleDot]]: left-to-right double fold of a_i*b_i — order matches
  *    the sequential `aggregate` fold (prefilter use only; not
  *    oracle-checked).
  *  - NULL result when inputs are null, lengths differ, or any element is
  *    null (zip_with pads mismatched lengths with null, and null poisons
  *    the fold — replicated here).
  */
trait VectorDotLike extends BinaryExpression {

  override def nullable: Boolean = true

  protected def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _                => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if a == b && (a == FloatType || a == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"${prettyName} requires two arrays of FLOAT or DOUBLE with " +
            s"matching element type, got ${l.sql} and ${r.sql}")
    }

  /** Element accessor for generated code. */
  protected def genGet(arr: String, i: String): String = elemType match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _         => s"$arr.getDouble($i)"
  }

  protected def evalGet(arr: ArrayData, i: Int): Double = elemType match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }
}

/** Exact fixed-point dot: SUM floor(x*1e7)*floor(y*1e7) as int64. */
case class FixedDotSum(left: Expression, right: Expression)
    extends VectorDotLike {

  override def prettyName: String = "fixed_dot_sum"
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += math.floor(evalGet(a, i) * 1e7).toLong *
        math.floor(evalGet(b, i) * 1e7).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |long $acc = 0L;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += (long) Math.floor(${genGet(a, i)} * 1.0E7)
         |        * (long) Math.floor(${genGet(b, i)} * 1.0E7);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedDotSum =
    copy(left = newLeft, right = newRight)
}

/** Plain double dot (sequential fold order) — prefilter use only. */
case class DoubleDot(left: Expression, right: Expression)
    extends VectorDotLike {

  override def prettyName: String = "double_dot"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += evalGet(a, i) * evalGet(b, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += ${genGet(a, i)} * ${genGet(b, i)};
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDot =
    copy(left = newLeft, right = newRight)
}

/** All-planes sign-projection bit packer for binary-code ANN (q169):
  * `signs` is a flattened planes×dim matrix of ±1 (plane-major); the
  * result is `planes/32` packed 32-bit words, word w bit b = 1 iff
  * SUM_i sign(32w+b, i)·floor(v_i·1e7) >= 0 — the identical arithmetic
  * as one [[FixedDotSum]] per plane against a ±1 pattern (±1 quantizes
  * to exactly ±1e7, a positive common factor that cannot change the
  * sign), collapsed into ONE expression. The collapse is the point:
  * 128 separate FixedDotSum expressions made janino compile a
  * megamorphic projection (~18 s per pass at bench time — compilation,
  * not compute); this emits two small loops.
  *
  * planes = signs.length / dim is derived per row; a signs length that
  * is not a positive multiple of 32·dim nulls the result (degenerate
  * input, same policy as a length mismatch).
  */
case class SignPackBits(left: Expression, right: Expression)
    extends VectorDotLike {

  override def prettyName: String = "sign_pack_bits"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val s = r.asInstanceOf[ArrayData]
    val d = v.numElements()
    if (d == 0 || s.numElements() % d != 0) return null
    val planes = s.numElements() / d
    if (planes == 0 || planes % 32 != 0) return null
    val fx = new Array[Long](d)
    var i = 0
    while (i < d) {
      if (v.isNullAt(i)) return null
      fx(i) = math.floor(evalGet(v, i) * 1e7).toLong
      i += 1
    }
    val words = new Array[Long](planes / 32)
    var p = 0
    while (p < planes) {
      var acc = 0L
      var j = 0
      while (j < d) {
        if (s.getFloat(p * d + j) > 0) acc += fx(j) else acc -= fx(j)
        j += 1
      }
      if (acc >= 0) words(p / 32) |= 1L << (p % 32)
      p += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(words)
  }

  // the signs side is a FLOAT literal by contract; containsNull must be
  // false — the plane loop reads sign elements without a null branch,
  // and a null sign silently reading as 0.0f (= a -1 plane weight)
  // would break the null-poisoning contract the other VectorDotLike
  // expressions follow, so nullable sign arrays are rejected at
  // type-check time instead
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(FloatType, false))
          if a == FloatType || a == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float|double>, " +
            s"array<float not null>), got ${l.sql} and ${r.sql}")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, s) => {
      val d = ctx.freshName("d")
      val planes = ctx.freshName("planes")
      val fx = ctx.freshName("fx")
      val words = ctx.freshName("words")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $d = $v.numElements();
         |boolean $bad = $d == 0 || $s.numElements() % $d != 0;
         |long[] $words = null;
         |if (!$bad) {
         |  int $planes = $s.numElements() / $d;
         |  $bad = $planes == 0 || $planes % 32 != 0;
         |  long[] $fx = new long[$d];
         |  for (int $i = 0; $i < $d; $i++) {
         |    if ($v.isNullAt($i)) { $bad = true; break; }
         |    $fx[$i] = (long) Math.floor(${genGet(v, i)} * 1.0E7);
         |  }
         |  if (!$bad) {
         |    $words = new long[$planes / 32];
         |    for (int $p = 0; $p < $planes; $p++) {
         |      long $acc = 0L;
         |      for (int $j = 0; $j < $d; $j++) {
         |        if ($s.getFloat($p * $d + $j) > 0) $acc += $fx[$j];
         |        else $acc -= $fx[$j];
         |      }
         |      if ($acc >= 0L) $words[$p / 32] |= 1L << ($p % 32);
         |    }
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($words); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignPackBits =
    copy(left = newLeft, right = newRight)
}

/** Symmetric per-vector int8 quantization (q55's memory-side lever) —
  * optimization r16: the HOF formulation
  * `transform(d, v => when(mx > 0, floor(v * (127.0/mx))).otherwise(0))`
  * with `mx = array_max(transform(d, abs))` is CodegenFallback — per
  * element it allocates and dispatches interpreted lambdas, and
  * profiling put ~0.6 s of q55's ~1.0 s idle wall in exactly that
  * projection. This emits one tight loop per row.
  *
  * Semantics mirrored EXACTLY from the HOF form (and the DuckDB
  * oracle): elements cast to double; mx = max over |v_i| of the
  * non-null elements; mx > 0 → floor(v_i · (127.0/mx)) per element
  * (the same one-division-then-multiply IEEE sequence — floor is
  * tie-free), null elements staying null; mx null or ≤ 0 → ALL
  * elements 0.0 (the `otherwise` branch). NULL array → NULL.
  * Finite-valued input assumed (the embedding fixtures are NaN-free).
  */
case class QuantizeInt8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "quantize_int8"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${t.sql}")
  }

  override def nullSafeEval(arr: Any): Any =
    QuantizeInt8.quantize(arr.asInstanceOf[ArrayData], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = elemIsFloat
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.QuantizeInt8.quantize($a, $f);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeInt8 = copy(child = newChild)
}

object QuantizeInt8 {
  /** The quantize core, shared by interpreted eval and generated code
    * (the CharPolyHash static-helper pattern).
    */
  def quantize(arr: ArrayData, elemIsFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    var mx = 0.0
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = math.abs(
          if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        if (!seen || d > mx) { mx = d; seen = true }
      }
      i += 1
    }
    val out = new Array[Any](n)
    if (!seen || !(mx > 0)) {
      java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]],
        java.lang.Double.valueOf(0.0))
    } else {
      val scale = 127.0 / mx
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val d = if (elemIsFloat) arr.getFloat(j).toDouble
                  else arr.getDouble(j)
          out(j) = math.floor(d * scale)
        }
        j += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorDot {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Exact int64 fixed-point dot sum (divide by 1e14 for the cosine). */
  def fixedDotSum(a: Column, b: Column): Column =
    ColumnBridge.column(
      FixedDotSum(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cheap double dot for prefilters. */
  def doubleDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DoubleDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Packed 32-bit sign-projection words (see [[SignPackBits]]). */
  def signPackBits(v: Column, signs: Column): Column =
    ColumnBridge.column(
      SignPackBits(ColumnBridge.expression(v), ColumnBridge.expression(signs)))

  /** Symmetric int8 quantization as doubles (see [[QuantizeInt8]]). */
  def quantizeInt8(v: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(v)))
}
