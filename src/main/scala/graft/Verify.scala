package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Usage: `Verify <sfDir> <outDir> [onlyCsv]` — the optional third arg
  * restricts the dump to a comma-separated subset of query names
  * (builder-side iteration on one oracle without re-running all 78);
  * the driver passes two args and always gets the full dump. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      // pair scoring is CPU-bound per row, not byte-bound: AQE's
      // byte-based coalescing would squeeze the scorer onto a couple
      // of tasks, so keep the shuffle width explicit
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // single-file local tables: split scans so stages parallelize
      .config("spark.sql.files.maxPartitionBytes", s"${512 * 1024}")
      .config("spark.sql.files.openCostInBytes", "65536")
      // queries are submitted from a pool: FAIR keeps a long
      // driver-bound fit from starving concurrent scan-bound queries
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // The dump is a bag of independent queries over shared memoized
    // stages (EntryStages caches are race-safe Once cells): submit
    // from a small pool so driver-bound sequential fits (RLTransE SGD,
    // SEEA rounds, Hungarian blocks) overlap with executor-bound scans
    // — the sequential dump's wall-clock is nearly the SUM of both.
    // Longest-known-first keeps the tail short.
    val heavyFirst = Seq(
      "grid_rltranse", "seea_pairs", "werl_batch_weights", "ir_metrics",
      "grid_transe", "werl_weights", "etranse_eval", "rltranse_batch_model",
      "rltranse_batch_fields",
      "logistic_rltranse_batch_feats", "logistic_rltranse_batch_weights",
      "mtranse_eval", "embed_logistic_weights", "embed_logistic_features",
      "krear_eval", "grid_veer", "scored_pairs_full",
      "ckpt_lineage").zipWithIndex.toMap
    val ordered = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy { case (name, _) => heavyFirst.getOrElse(name, Int.MaxValue) }
    // 6 measured faster than 4 at sf0.01/32 cores (the tail is two
    // driver-bound sequential fits; extra threads pack the scan-bound
    // queries behind them), and the sequential retry pass bounds the
    // memory-race downside
    val nThreads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "6").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    def dump(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(
          f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        true
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        false
      }
    }
    val failed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val done = ordered.map { case (name, fn) =>
      pool.submit(new Runnable {
        override def run(): Unit = if (!dump(name, fn)) failed.add(name)
      })
    }
    done.foreach(_.get())
    pool.shutdown()
    // concurrent execution-memory pressure can abort a task that would
    // succeed alone (UNABLE_TO_ACQUIRE_MEMORY under 32 cores x
    // nThreads queries): retry stragglers sequentially so parallelism
    // can only ever cost time, never a correctness row
    failed.forEach { name =>
      System.err.println(s"[verify] retrying $name sequentially")
      dump(name, SparkEntry.queries(name))
      ()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // staged oracles read already-verified anchor dumps: bind the
    // {{GRAFT_OUT}} token to THIS dump directory (absolute, since the
    // driver's DuckDB may run from any cwd)
    val outAbs = Paths.get(outDir).toAbsolutePath.toString
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(oracle.OracleSql.OutDirToken, outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
