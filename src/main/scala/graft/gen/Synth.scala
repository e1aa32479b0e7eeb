package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic source-code-repository table
 * `(id, side, repo, path, commit, lang, content, dni, split)` derived
 * purely from the driver's TPC-H `orders` parquet (TESTDATA.md), so the
 * DuckDB oracle can reproduce it with equivalent SQL
 * (see [[graft.oracle.OracleSql]]).
 *
 * Design mirrors the reference's datasets:
 *  - two "commits" c1/c2 play the role of the census year-pair A/B
 *    split (/root/reference/data/census.py:75-80);
 *  - `dni` (= o_orderkey) is the hidden ground-truth entity id, as the
 *    census DNI column (/root/reference/data/base_census.py:123);
 *  - side-B rows carry deterministic FEBRL-style org/dup perturbations
 *    (/root/reference/data/febrl.py:55-71) that PRESERVE the blocking
 *    token, so blocking recall is 1.0 and the F1 >= 0.99 target is
 *    reachable (SURVEY.md §7.7);
 *  - ~6% of entities exist on only one side (unmatched records);
 *  - customers with custkey % 100 == 0 collapse into one hot block
 *    ('c0') to force Zipf-style blocking skew, exercising salting.
 *
 * Everything is a pure Column expression over `orders` — no UDFs, no
 * RNG, no wall clock — so the whole derivation is pushed into
 * whole-stage codegen and reproducible bit-for-bit at any scale factor.
 */
object Synth {

  /** 29-word and 31-word vocabularies; coprime moduli give 899 combos. */
  val W1: Seq[String] = Seq(
    "alpha", "bravo", "cedar", "delta", "ember", "futon", "gamma", "haiku",
    "idiom", "jolly", "kappa", "lemur", "mango", "noble", "ocean", "piano",
    "quark", "raven", "sable", "tango", "umber", "viola", "waltz", "xenon",
    "yodel", "zebra", "acorn", "brook", "crane")
  val W2: Seq[String] = Seq(
    "anvil", "basil", "cobra", "dwell", "eagle", "fable", "gusto", "hazel",
    "inlet", "joust", "kayak", "llama", "maple", "nymph", "olive", "prism",
    "quill", "ridge", "slate", "thorn", "ultra", "vexed", "wharf", "xylem",
    "yacht", "zesty", "amber", "blitz", "cliff", "dunes", "elfin")

  private def wordAt(words: Seq[String], idx: Column): Column =
    element_at(array(words.map(lit): _*), idx.cast("int") + 1)

  private def ducklist(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /**
   * Deterministic filler tokens that stretch `content` to a realistic
   * source-file size (~250 chars): per round i, two dictionary words
   * indexed by affine functions of (k, ck) and one numeric token.
   * Single source of truth for BOTH the Spark columns and the DuckDB
   * oracle fragments — the two derivations cannot drift.
   */
  final val FillerRounds = 8

  /** Spark columns for the filler tokens; expects cols k, ck. */
  def fillerCols: Seq[Column] = {
    val k = col("k"); val ck = col("ck")
    (0 until FillerRounds).flatMap { i =>
      Seq(
        wordAt(W1, (k * (3 + i) + i) % 29),
        wordAt(W2, (k * (5 + i) + ck + i) % 31),
        ((k * (7 + 2 * i) + ck * (3 + i)) % 99991).cast("string"))
    }
  }

  /** DuckDB SQL fragments for the same filler tokens (k, ck in scope). */
  def fillerSql: Seq[String] =
    (0 until FillerRounds).flatMap { i =>
      Seq(
        s"list_extract(${ducklist(W1)}, CAST((k * ${3 + i} + $i) % 29 AS INT) + 1)",
        s"list_extract(${ducklist(W2)}, CAST((k * ${5 + i} + ck + $i) % 31 AS INT) + 1)",
        s"CAST((k * ${7 + 2 * i} + ck * ${3 + i}) % 99991 AS VARCHAR)")
    }

  def orders(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/orders.parquet")

  /**
   * The synthetic records table. Columns:
   * id (unique long, 2k/2k+1), side ('A'/'B'), repo, path, commit,
   * lang, content, dni (truth entity id), split (train/val/test).
   */
  def records(spark: SparkSession, sfDir: String): DataFrame = {
    val pre = orders(spark, sfDir).select(
      col("o_orderkey").as("k"), col("o_custkey").as("ck"),
      col("o_orderstatus").as("st"), col("o_totalprice").as("tp"),
      col("o_orderpriority").as("pri"))
    val k = col("k")
    val ck = col("ck")

    val custtok = when(ck % 100 === 0, lit("c0"))
      .otherwise(concat(lit("c"), ck.cast("string")))
    val stword = when(col("st") === "F", "fin")
      .when(col("st") === "O", "open").otherwise("pend")
    val priw = lower(regexp_replace(col("pri"), "-", " "))
    val valtok = floor(col("tp")).cast("bigint").cast("string")
    val ktok = k.cast("string")
    val w1 = wordAt(W1, k % 29)
    val w2 = wordAt(W2, (k * 7 + ck) % 31)
    val langC = when(k % 5 === 0, "scala").when(k % 5 === 1, "java")
      .when(k % 5 === 2, "python").when(k % 5 === 3, "rust").otherwise("go")
    val extC = when(k % 5 === 0, "scala").when(k % 5 === 1, "java")
      .when(k % 5 === 2, "py").when(k % 5 === 3, "rs").otherwise("go")

    val contentToks: Seq[Column] =
      Seq(lit("fn"), custtok, w1, stword, priw, w2,
        lit("val"), valtok, lit("k"), ktok) ++ fillerCols

    val base = pre.select(
      k, ck, custtok.as("custtok"), langC.as("lang"), extC.as("ext"),
      concat_ws(" ", contentToks: _*).as("content_a"))

    val ca = col("content_a")
    // FEBRL-style deterministic perturbations for the B side; cases 1
    // and 2 normalize away (exact dup after normalization), 3 and 4
    // survive as near-dups. All preserve the 'c<ck>' blocking token.
    val contentB = when(col("k") % 5 === 1,
        concat(upper(ca.substr(lit(1), lit(2))), ca.substr(lit(3), length(ca))))
      .when(col("k") % 5 === 2, regexp_replace(ca, " val ", "  val "))
      .when(col("k") % 5 === 3, ca.substr(lit(4), length(ca)))
      .when(col("k") % 5 === 4, regexp_replace(ca, " val ", " value "))
      .otherwise(ca)

    val sideA = base.filter(col("k") % 17 =!= 5).select(
      (col("k") * 2).as("id"), lit("A").as("side"), col("k"), col("ck"),
      col("custtok"), col("lang"), col("ext"), ca.as("content"))
    val sideB = base.filter(col("k") % 19 =!= 7).select(
      (col("k") * 2 + 1).as("id"), lit("B").as("side"), col("k"), col("ck"),
      col("custtok"), col("lang"), col("ext"), contentB.as("content"))

    sideA.unionByName(sideB).select(
      col("id"), col("side"),
      concat(lit("repo"), (col("ck") % 50).cast("string")).as("repo"),
      concat(lit("src/"), col("custtok"), lit("/f"), col("k").cast("string"),
        lit("."), col("ext")).as("path"),
      when(col("side") === "A", "c1").otherwise("c2").as("commit"),
      col("lang"), col("content"), col("k").as("dni"),
      when(col("k") % 10 < 6, "train").when(col("k") % 10 < 8, "val")
        .otherwise("test").as("split"))
  }
}
