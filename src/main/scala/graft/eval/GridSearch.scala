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

  /** Quality columns carried per combo when the eval row provides them
    * (the reference logs per-combo IR metrics alongside F1,
    * /root/reference/common.py:300-308); absent columns come back NaN. */
  final val MetricCols: Seq[String] =
    Seq("f1", "precision", "recall", "mrr")

  /**
   * Run `evalFn` per combination; each must return a one-row DataFrame
   * containing an `f1` column (precision/recall/mrr are carried too
   * when present). Returns (param columns ++ metric columns) rows
   * sorted by descending f1.
   */
  def sweep(spark: SparkSession, combos: Seq[Map[String, Double]],
            evalFn: Map[String, Double] => DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    require(combos.nonEmpty)
    val paramNames = combos.head.keys.toSeq.sorted
    val rows = combos.map { params =>
      val r = evalFn(params).head()
      val has = r.schema.fieldNames.toSet
      Row.fromSeq(paramNames.map(params) ++
        MetricCols.map(c => if (has(c)) r.getAs[Double](c) else Double.NaN))
    }
    val schema = StructType(
      (paramNames ++ MetricCols).map(n => StructField(n, DoubleType)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .orderBy(org.apache.spark.sql.functions.desc("f1"))
  }
}
