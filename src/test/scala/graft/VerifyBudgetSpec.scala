package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Guard on the driver correctness gate's wall-clock budget (round-4
 * verdict: the oracle suite outgrew the driver's check window
 * SILENTLY — `CORRECTNESS_r04.json` came back `{}` with no in-repo
 * signal that the gate had crossed the line).
 *
 * `tools/verify_budget.py` runs the driver-shaped gate end to end at
 * the gated SF (Spark Verify dump + DuckDB oracle diff) and records
 * the wall-clock split plus a fingerprint of the oracle-SQL surface
 * into `VERIFY_BUDGET.json`. This spec goes red when:
 *
 *   - the recorded total exceeds [[VerifyBudgetSpec.CeilingSecs]];
 *   - the recording is STALE: the oracle surface changed since the
 *     last run (fingerprint mismatch) — a new or edited oracle must
 *     re-measure before it can claim to fit the window;
 *   - the recorded run had failures, or ran at the wrong SF.
 */
class VerifyBudgetSpec extends AnyFunSuite {
  import VerifyBudgetSpec._

  private val path = java.nio.file.Paths.get("VERIFY_BUDGET.json")

  test("VERIFY_BUDGET.json exists (run tools/verify_budget.py)") {
    assert(java.nio.file.Files.exists(path),
      "no VERIFY_BUDGET.json at the repo root — run " +
        "`python3 tools/verify_budget.py` after changing the oracle surface")
  }

  private lazy val budget: com.fasterxml.jackson.databind.JsonNode = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.readTree(path.toFile)
  }

  test("recorded gate run is green and at the gated SF") {
    assert(budget.get("failed").size() == 0,
      s"recorded gate run had failures: ${budget.get("failed")}")
    assert(budget.get("sf").asText().endsWith("sf0.01"),
      s"budget must be recorded at the gated SF (sf0.01), " +
        s"got ${budget.get("sf")}")
    assert(budget.get("n_oracles").asLong() == SparkEntry.oracleSql.size,
      s"oracle count drifted: recorded ${budget.get("n_oracles")}, " +
        s"surface has ${SparkEntry.oracleSql.size}")
  }

  test("recorded measurement matches the CURRENT oracle surface") {
    assert(budget.get("oracle_fingerprint").asText() == fingerprint,
      "oracle surface changed since VERIFY_BUDGET.json was recorded — " +
        "re-run `python3 tools/verify_budget.py` so the budget row " +
        "measures the SQL the driver will actually run")
  }

  test(s"gate total fits the driver window (<= $CeilingSecs s)") {
    val total = budget.get("total_secs").asDouble()
    assert(total <= CeilingSecs,
      f"correctness gate took $total%.0f s at sf0.01 — over the " +
        f"$CeilingSecs s ceiling; cut oracle/dump wall-time before " +
        "adding more (see VERDICT r4 'what's wrong' #1)")
  }
}

object VerifyBudgetSpec {
  /** Gate ceiling at sf0.01, dump + DuckDB, seconds. Re-armed in
    * round 6 (the r5 verdict falsified the old 900 s guess — the
    * driver wrote `{}` with a recorded 724.6 s): 750 s is just above
    * the round-6 recording (680.4 s: dump 159.8 after the round's
    * Spark-side cuts + DuckDB 520.6, which is FROZEN oracle SQL this
    * round), so any growth of the suite — or a degraded-window
    * recording — trips the guard instead of hiding behind 30% slack.
    * The structural fix the verdict asks for (one full training
    * replay per family at the driver surface, rest demoted to
    * ScalaTest-side oracle checks) requires editing oracle SQL and is
    * out of scope for the optimization round. */
  final val CeilingSecs = 750.0

  /** sha256 over the sorted (name, sql) pairs — byte-for-byte the
    * hashing in tools/verify_budget.py (the python side normalizes
    * its dump-dir binding back to the {{GRAFT_OUT}} token these
    * strings already carry). */
  def fingerprint: String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
      md.update(name.getBytes("UTF-8")); md.update(0.toByte)
      md.update(sql.getBytes("UTF-8")); md.update(1.toByte)
    }
    md.digest().map(b => f"$b%02x").mkString
  }
}
