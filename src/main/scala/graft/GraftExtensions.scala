package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.JaroWinkler

/**
 * Registers graft's custom Catalyst expressions with Spark SQL, so
 * `spark.sql("SELECT jaro_winkler(a, b) ...")` works. Activate with
 * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
 * `.withExtensions(new GraftExtensions)`.
 *
 * The DataFrame API does not need this — use
 * [[graft.functions.GraftFunctions]] directly.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo("graft.functions.JaroWinkler", null, "jaro_winkler",
        "jaro_winkler(str1, str2) - Jaro-Winkler similarity in [0, 1].", ""),
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1))))
  }
}
