package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.EntryStages

/**
 * Knowledge-graph encodings of the records table, the engine analogue
 * of the reference's four graph flavors (SURVEY.md §1.3):
 *
 * - ER: record ids and attribute VALUES all become entity nodes; one
 *   triple per (record, field value) with the field as the relation
 *   (/root/reference/data/census.py:190-298, ER/model.py:8-104).
 * - VEG: per-relation value-pair triples (val_a, val_b, rel) for KNOWN
 *   true links only (/root/reference/data/census.py:650-805).
 *
 * String interning is a dictionary join: distinct labels get dense ids
 * via row_number over a sorted window — NOT the reference's O(n^2)
 * `list.index` scans (SURVEY.md §4.1). Both builders are pure
 * relational plans with DuckDB oracles.
 */
object GraphBuild {

  final val Relations = Seq("block", "lang", "repo") // rel ids 0, 1, 2

  /** Long attribute-value table (record_label, value_label, rel_id). */
  private def rawTriples(spark: SparkSession, sfDir: String): DataFrame = {
    val k = EntryStages.keyed(spark, sfDir)
      .select(col("id"), col("block_key"), col("lang"), col("repo"))
    val base = k.select(concat(lit("r"), col("id")).as("rec"),
      col("block_key"), col("lang"), col("repo"))
    Relations.zipWithIndex.map { case (rel, rid) =>
      val valueCol = rel match {
        case "block" => col("block_key")
        case other => col(other)
      }
      base.select(col("rec"),
        concat(lit(s"$rel:"), valueCol).as("value"),
        lit(rid.toLong).as("rel_id"))
    }.reduce(_ unionByName _)
  }

  /** Entity dictionary: dense ids by sorted label (deterministic). */
  def erEntities(spark: SparkSession, sfDir: String): DataFrame = {
    val t = rawTriples(spark, sfDir)
    val labels = t.select(col("rec").as("label"))
      .union(t.select(col("value").as("label"))).distinct()
    labels.withColumn("ent_id",
      (row_number().over(Window.orderBy("label")) - 1).cast("long"))
  }

  /** ER triples (h, t, r) with dictionary-encoded entity ids. */
  def erTriples(spark: SparkSession, sfDir: String): DataFrame = {
    val ents = erEntities(spark, sfDir)
    val t = rawTriples(spark, sfDir)
    t.join(ents.withColumnRenamed("label", "rec")
        .withColumnRenamed("ent_id", "h"), "rec")
      .join(ents.withColumnRenamed("label", "value")
        .withColumnRenamed("ent_id", "t"), "value")
      .select(col("h"), col("t"), col("rel_id").as("r"))
  }

  /**
   * VEG value-evolution triples: for each TRUE candidate pair and each
   * relation, link the A-side and B-side observed values.
   */
  def vegTriples(spark: SparkSession, sfDir: String): DataFrame = {
    val keyed = EntryStages.keyed(spark, sfDir)
      .select(col("id"), col("side"), col("dni"), col("block_key"),
        col("lang"), col("repo"))
    val truth = EntryStages.cand(spark, sfDir)
      .filter(col("dni_a") === col("dni_b")).select("idA", "idB")
    val a = keyed.select(col("id").as("idA"), col("block_key").as("ba"),
      col("lang").as("la"), col("repo").as("ra"))
    val b = keyed.select(col("id").as("idB"), col("block_key").as("bb"),
      col("lang").as("lb"), col("repo").as("rb"))
    val joined = truth.join(a, "idA").join(b, "idB")
    Seq(("ba", "bb", 0L), ("la", "lb", 1L), ("ra", "rb", 2L))
      .map { case (ca, cb, rid) =>
        joined.select(col(ca).as("val_a"), col(cb).as("val_b"),
          lit(rid).as("r"))
      }.reduce(_ unionByName _)
      .groupBy("val_a", "val_b", "r").agg(count(lit(1)).as("n"))
  }
}
