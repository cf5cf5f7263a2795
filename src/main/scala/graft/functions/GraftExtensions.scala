package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine function registration (SURVEY.md §2.10).
  *
  * Two paths to the same registry entry:
  *  - [[GraftExtensions]] for session construction
  *    (`SparkSession.builder().withExtensions(new GraftExtensions)`), the
  *    idiomatic deployment hook on a cluster;
  *  - [[GraftFunctions.register]] for an already-running session (tests,
  *    notebooks) — extensions are ignored by `getOrCreate` when a session
  *    already exists.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // session-wide mandatory-filter policy (SURVEY §4); a no-op until a
    // catalog is installed via MandatoryFilterRule.install(session, cat)
    e.injectResolutionRule(graft.plans.MandatoryFilterRule.forSession)
  }
}

object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  /** Arity-checked builder: a wrong-arity SQL call gets a clean
    * "invalid number of arguments" error at resolution, not an
    * IndexOutOfBoundsException stack trace.
    */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Builder =
    exprs => {
      require(exprs.length == n,
        s"function $name expects $n argument(s), got ${exprs.length}")
      build(exprs)
    }

  val definitions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("charpolyhash",
      new ExpressionInfo(classOf[CharPolyHash].getName, "charpolyhash"),
      arity("charpolyhash", 1)(exprs => CharPolyHash(exprs.head))),
    ("fixed_dot_sum",
      new ExpressionInfo(classOf[FixedDotSum].getName, "fixed_dot_sum"),
      arity("fixed_dot_sum", 2)(exprs => FixedDotSum(exprs(0), exprs(1)))),
    ("double_dot",
      new ExpressionInfo(classOf[DoubleDot].getName, "double_dot"),
      arity("double_dot", 2)(exprs => DoubleDot(exprs(0), exprs(1)))))

  /** Imperative registration on a live session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
