package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.EntryStages

/**
 * Knowledge-graph encodings of the records table, the engine analogue
 * of the reference's four graph flavors (SURVEY.md §1.3):
 *
 * - ER: record ids and attribute VALUES all become entity nodes; one
 *   triple per (record, field value) with the field as the relation —
 *   7 triples per record, as the census ER builder emits
 *   (/root/reference/data/census.py:190-298, ER/model.py:8-104).
 * - VEG: per-relation value-pair triples (val_a, val_b, rel) for KNOWN
 *   true links only (/root/reference/data/census.py:650-805) — the
 *   `st` field genuinely EVOLVES between snapshots (fin->done, ...),
 *   so VEG is where that evolution is learned.
 * - EAR: the ER triples split into RELATIONAL triples (record ->
 *   shared entity: block, repo) and ATTRIBUTIONAL triples (record ->
 *   literal value: lang, st, w1f, prif, valf), as the reference's EAR
 *   model separates them (/root/reference/EAR/model.py:19-28,
 *   /root/reference/data/census.py:322-480).
 *
 * String interning is a dictionary join: distinct labels get dense ids
 * via row_number over a sorted window — NOT the reference's O(n^2)
 * `list.index` scans (SURVEY.md §4.1). All builders are pure
 * relational plans with DuckDB oracles.
 */
object GraphBuild {

  /** Field relations, in rel-id order. */
  final val Relations = Seq("block", "lang", "repo", "st", "w1f", "prif", "valf")

  /** EAR split: which relations are relational (entity-to-entity) vs
    * attributional (entity-to-literal-value). */
  final val RelationalRels = Seq("block", "repo")
  final val AttributionalRels = Seq("lang", "st", "w1f", "prif", "valf")

  private def valueCol(rel: String): Column = rel match {
    case "block" => col("block_key")
    case other => col(other)
  }

  /** Long attribute-value table (record_label, value_label, rel_id). */
  private def rawTriples(spark: SparkSession, sfDir: String): DataFrame = {
    val k = EntryStages.keyed(spark, sfDir)
      .select(Seq(col("id"), col("block_key")) ++
        Relations.filter(_ != "block").map(col): _*)
    val base = k.withColumn("rec", concat(lit("r"), col("id")))
    Relations.zipWithIndex.map { case (rel, rid) =>
      base.select(col("rec"),
        concat(lit(s"$rel:"), valueCol(rel)).as("value"),
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
   * EAR triples: the ER triples plus `is_attr` marking attributional
   * relations (record -> literal value) vs relational ones (record ->
   * shared entity node), the reference's EAR split
   * (/root/reference/EAR/model.py:19-28).
   */
  def earTriples(spark: SparkSession, sfDir: String): DataFrame = {
    val attrIds = Relations.zipWithIndex
      .collect { case (rel, rid) if AttributionalRels.contains(rel) => rid.toLong }
    erTriples(spark, sfDir).withColumn("is_attr",
      col("r").isInCollection(attrIds).cast("long"))
  }

  private def vegPairs(spark: SparkSession, sfDir: String,
                       truth: DataFrame): DataFrame = {
    val keyed = EntryStages.keyed(spark, sfDir)
      .select(Seq(col("id"), col("block_key")) ++
        Relations.filter(_ != "block").map(col): _*)
    val a = keyed.select(Seq(col("id").as("idA")) ++
      Relations.map(r => valueCol(r).as(s"a_$r")): _*)
    val b = keyed.select(Seq(col("id").as("idB")) ++
      Relations.map(r => valueCol(r).as(s"b_$r")): _*)
    val joined = truth.join(a, "idA").join(b, "idB")
    Relations.zipWithIndex.map { case (rel, rid) =>
      joined.select(col(s"a_$rel").as("val_a"), col(s"b_$rel").as("val_b"),
        lit(rid.toLong).as("r"))
    }.reduce(_ unionByName _)
      .groupBy("val_a", "val_b", "r").agg(count(lit(1)).as("n"))
  }

  /**
   * VEG value-evolution triples: for each TRUE candidate pair and each
   * relation, link the A-side and B-side observed values.
   */
  def vegTriples(spark: SparkSession, sfDir: String): DataFrame =
    vegPairs(spark, sfDir,
      EntryStages.cand(spark, sfDir)
        .filter(col("dni_a") === col("dni_b")).select("idA", "idB"))

  /**
   * VEG triples restricted to TRAIN-split true links — the training
   * graph for RLTransE, exactly as the reference trains on
   * graph.train_triples (/root/reference/VEG/rltranse.py:31-40).
   */
  def vegTrainTriples(spark: SparkSession, sfDir: String): DataFrame =
    vegPairs(spark, sfDir,
      EntryStages.cand(spark, sfDir)
        .filter(col("dni_a") === col("dni_b") &&
          col("split_a") === "train" && col("split_b") === "train")
        .select("idA", "idB"))
}
