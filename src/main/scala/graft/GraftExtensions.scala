package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CharCounts, VecDot}

/** SQL surface for the engine's native expressions.
  *
  * Two registration paths:
  *  - `.withExtensions(new GraftExtensions)` at session build (or
  *    `spark.sql.extensions=graft.GraftExtensions`) — the standard
  *    SparkSessionExtensions plugin route;
  *  - `GraftExtensions.register(spark)` for an already-built session
  *    (the driver owns the session in the Verify/Bench contract).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.vecDot)
    e.injectFunction(GraftExtensions.charCounts)
  }
}

object GraftExtensions {
  // Arity is validated in each builder: the lambdas otherwise index into
  // `children`, so a wrong-arity SQL call (`vec_dot()`) would surface as
  // a bare NoSuchElementException instead of an analysis error naming
  // the expected signature (ADVICE r8 #5).
  private val vecDot = (
    new FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, null, "vec_dot",
      "vec_dot(a, b) - dot product of two array<double> vectors", ""),
    (children: Seq[Expression]) => {
      if (children.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "`vec_dot`", "expectedNum" -> "2",
            "actualNum" -> children.length.toString, "docroot" -> ""))
      VecDot(children(0), children(1))
    })

  private val charCounts = (
    new FunctionIdentifier("char_counts"),
    new ExpressionInfo(classOf[CharCounts].getName, null, "char_counts",
      "char_counts(s) - per-code-point counts of s as array<long>, " +
        "sorted by code point", ""),
    (children: Seq[Expression]) => {
      if (children.length != 1)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "`char_counts`", "expectedNum" -> "1",
            "actualNum" -> children.length.toString, "docroot" -> ""))
      CharCounts(children.head)
    })

  /** Idempotent runtime registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      vecDot._1, vecDot._2, vecDot._3)
    spark.sessionState.functionRegistry.registerFunction(
      charCounts._1, charCounts._2, charCounts._3)
  }
}
