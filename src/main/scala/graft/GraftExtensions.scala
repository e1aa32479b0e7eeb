package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

import graft.functions.JaroWinkler

/**
 * Registers graft's custom SQL surface with Spark, activated with
 * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
 * `.withExtensions(new GraftExtensions)`:
 *
 * - `jaro_winkler(a, b)` as a native Catalyst expression, so
 *   `spark.sql("SELECT jaro_winkler(a, b) ...")` codegens;
 * - the `LINK RECORDS FROM '<sfDir>'` statement (SURVEY §7.6): one SQL
 *   statement that runs the whole linkage pipeline — records ->
 *   normalize -> blocking -> scoring -> train-split threshold sweep —
 *   and yields the match edges (src, dst, dist). Implemented as an
 *   injected parser that intercepts the statement and falls through to
 *   the stock parser for everything else.
 *
 * The DataFrame API does not need this — use
 * [[graft.functions.GraftFunctions]] / [[Pipeline]] directly.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo("graft.functions.JaroWinkler", null, "jaro_winkler",
        "jaro_winkler(str1, str2) - Jaro-Winkler similarity in [0, 1].",
        "", "", "", "string_funcs", "", "", "built-in"),
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1))))
    e.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
  }
}

/**
 * Delegating parser adding the `LINK RECORDS FROM '<dir>'` statement.
 * The statement is EAGER (the threshold sweep is an action), like SQL
 * commands; everything else goes to the stock parser untouched.
 */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val Link =
    """(?is)\s*LINK\s+RECORDS\s+FROM\s+'([^']+)'\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Link(dir) =>
      EntryStages.matchEdges(session, dir).queryExecution.logical
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
