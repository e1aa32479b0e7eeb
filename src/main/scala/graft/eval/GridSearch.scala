package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Hyperparameter grid-search harness — the engine analogue of the
 * reference's per-combination test loops
 * (/root/reference/tests/er/test_transe.py:90-121, which iterate a
 * params grid and log quality per combo). Here each combination's
 * one-row eval DataFrame is collected and stacked into a single result
 * table sorted by F1, so the sweep is a queryable artifact instead of
 * log lines.
 */
object GridSearch {

  /** Cartesian product of named parameter value lists. */
  def grid(axes: (String, Seq[Double])*): Seq[Map[String, Double]] =
    axes.foldLeft(Seq(Map.empty[String, Double])) {
      case (acc, (name, values)) =>
        for (m <- acc; v <- values) yield m + (name -> v)
    }

  /**
   * Run `evalFn` per combination; each must return a one-row DataFrame
   * containing an `f1` column. Returns (param columns ++ f1) rows
   * sorted by descending f1.
   */
  def sweep(spark: SparkSession, combos: Seq[Map[String, Double]],
            evalFn: Map[String, Double] => DataFrame): DataFrame = {
    import spark.implicits._
    require(combos.nonEmpty)
    val paramNames = combos.head.keys.toSeq.sorted
    val rows = combos.map { params =>
      val r = evalFn(params).head()
      (paramNames.map(params), r.getAs[Double]("f1"))
    }
    rows.map { case (ps, f1) => (ps.mkString(","), f1) }
      .toDF("params", "f1")
      .selectExpr(
        paramNames.zipWithIndex.map { case (n, i) =>
          s"CAST(split(params, ',')[$i] AS DOUBLE) AS $n"
        } :+ "f1": _*)
      .orderBy(org.apache.spark.sql.functions.desc("f1"))
  }
}
