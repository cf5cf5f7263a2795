package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable polynomial hash
  * (graft.llmops.PortableHash): g(s) = SUM_i ascii(s_i) * m(i) mod P with
  * m(i) = (i*i*2654435761 + i*97) mod P.
  *
  * Same math as the HOF formulation (split/transform/aggregate) and the
  * DuckDB oracle's list comprehension, but with `doGenCode` emitting a
  * tight Java loop — no per-character array allocation, stays inside
  * whole-stage codegen. This is the one hot path (MinHash shingle /
  * SimHash token hashing over millions of strings) where a custom
  * Expression is warranted over composing built-ins (HOFs are
  * CodegenFallback, i.e. interpreted).
  *
  * Semantics notes, mirroring PortableHash.charHash exactly:
  *  - empty string → NULL (matches SQL `list_sum([]) % P`);
  *  - `ascii` semantics: the FIRST BYTE interpreted as its code point for
  *    ASCII input (fixture text is ASCII; for non-ASCII both engines'
  *    ascii() agree on the leading code point, which we replicate by
  *    iterating code points).
  */
case class CharPolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"charpolyhash requires STRING input, got ${child.dataType.sql}")

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) null else CharPolyHash.hash(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val ci = ctx.freshName("ci")
      val cp = ctx.freshName("cp")
      val m = ctx.freshName("m")
      // iterate CODE POINTS (not UTF-16 units) so positions match the
      // HOF formulation and DuckDB, which both index characters —
      // surrogate pairs count as one position
      s"""
         |String $s = $c.toString();
         |if ($s.isEmpty()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  int $ci = 0;
         |  long $i = 1;
         |  while ($ci < $s.length()) {
         |    int $cp = $s.codePointAt($ci);
         |    // reduced form: i*i*K wraps Long for i >= ~58,900; (i*i %P)*K
         |    // stays in range and is congruent (identical value where the
         |    // naive form doesn't wrap)
         |    long $m = (($i * $i % 1000000007L) * 2654435761L
         |        + $i * 97L) % 1000000007L;
         |    // reduce mod P each step: an unreduced sum wraps Long on
         |    // long/astral inputs while the oracle's exact sum does not
         |    $acc = ($acc + (long) $cp * $m) % 1000000007L;
         |    $ci += Character.charCount($cp);
         |    $i++;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CharPolyHash =
    copy(child = newChild)
}

object CharPolyHash {
  val P = 1000000007L

  /** Reference implementation (used by interpreted eval and tests).
    * Code-point positions, mirroring the codegen loop.
    */
  def hash(s: String): Long = {
    var acc = 0L
    var ci = 0
    var i = 1L
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      val m = ((i * i % P) * 2654435761L + i * 97L) % P // reduced: no wrap
      acc = (acc + cp.toLong * m) % P // per-step mod: no Long wrap
      ci += Character.charCount(cp)
      i += 1
    }
    acc
  }

  /** Column API: native codegen'd portable hash (Spark 4's Column wraps
    * ColumnNode, so the Expression bridge goes through ExpressionUtils).
    */
  def charPolyHash(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CharPolyHash(ColumnBridge.expression(c)))
  }
}
