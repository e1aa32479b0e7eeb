package graft

import org.scalatest.funsuite.AnyFunSuite

/** The injected SQL surface: custom function + LINK statement. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val sf = SparkTestSession.sf0001

  test("jaro_winkler is callable from SQL (injected function)") {
    val r = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS jw").head().getDouble(0)
    assert(math.abs(r - 0.9611111111111111) < 1e-12)
  }

  test("LINK RECORDS FROM runs the whole pipeline as one SQL statement") {
    val viaSql = spark.sql(s"LINK RECORDS FROM '$sf'")
    val direct = EntryStages.matchEdges(spark, sf)
    assert(viaSql.columns.toSeq == Seq("src", "dst", "dist"))
    assert(viaSql.count() == direct.count())
    assert(viaSql.exceptAll(direct).isEmpty && direct.exceptAll(viaSql).isEmpty)
    // ordinary SQL still parses through the delegate
    assert(spark.sql("SELECT 1 AS one").head().getInt(0) == 1)
  }
}
