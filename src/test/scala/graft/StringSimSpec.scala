package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StringSim

/**
 * Golden values cross-checked against DuckDB v1.0
 * `jaro_winkler_similarity` / `levenshtein` (the oracle), see
 * SURVEY.md §7.7 on oracle drift.
 */
class StringSimSpec extends AnyFunSuite {

  test("jaro-winkler golden values match the DuckDB oracle bit-for-bit") {
    assert(StringSim.jaroWinkler("martha", "marhta") == 0.9611111111111111)
    assert(StringSim.jaroWinkler("dwayne", "duane") == 0.8400000000000001)
    assert(StringSim.jaroWinkler("dixon", "dicksonx") == 0.8133333333333332)
    assert(StringSim.jaroWinkler("jellyfish", "smellyfish") == 0.8962962962962964)
    assert(StringSim.jaroWinkler("crate", "trace") == 0.7333333333333334)
    assert(StringSim.jaroWinkler("abcdxy", "abcdyx") == 0.9666666666666667)
    assert(StringSim.jaroWinkler("ab", "abcdefgh") == 0.8)
    // boost threshold: no Winkler prefix bonus when jaro <= 0.7
    assert(StringSim.jaroWinkler("abxxxxxxxx", "abyyyyyyyy") == 0.4666666666666666)
  }

  test("jaro-winkler edge cases (DuckDB semantics)") {
    assert(StringSim.jaroWinkler("", "") == 0.0)
    assert(StringSim.jaroWinkler("a", "") == 0.0)
    assert(StringSim.jaroWinkler("", "abc") == 0.0)
    assert(StringSim.jaroWinkler("a", "a") == 1.0)
    assert(StringSim.jaroWinkler("ab", "ba") == 0.0) // window 0, no matches
    assert(StringSim.jaroWinkler("x", "y") == 0.0)
  }

  test("bit-parallel levenshtein == reference DP on 50k fuzzed pairs") {
    val rnd = new scala.util.Random(7)
    val alphabets = Seq("ab", "abcdef XY_09", "日本語のテキスト abc")
    var i = 0
    while (i < 50000) {
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      def mk(len: Int) = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val a = mk(rnd.nextInt(200))
      val b = if (rnd.nextBoolean()) {
        val cs = a.toCharArray
        if (cs.nonEmpty) cs(rnd.nextInt(cs.length)) = alpha(rnd.nextInt(alpha.length))
        new String(cs)
      } else mk(rnd.nextInt(200))
      val got = StringSim.levenshtein(a, b)
      val want = StringSim.levenshteinDP(a, b)
      assert(got == want, s"myers=$got dp=$want for ${a.take(40)}.. vs ${b.take(40)}..")
      i += 1
    }
  }

  test("levenshtein matches classic edit distance") {
    assert(StringSim.levenshtein("kitten", "sitting") == 3)
    assert(StringSim.levenshtein("", "abc") == 3)
    assert(StringSim.levenshtein("abc", "abc") == 0)
    assert(StringSim.levenshtein("flaw", "lawn") == 2)
    assert(StringSim.levSim("abcd", "abcd") == 1.0)
    assert(StringSim.levSim("", "") == 1.0)
    assert(StringSim.levSim("ab", "abcd") == 0.5)
  }

  test("jaro_winkler Catalyst expression equals the Scala kernel and works in SQL") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(("martha", "marhta"), ("fn c1 open", "fn c1 fin"), ("", ""))
      .toDF("a", "b")
    val got = df.select(
      graft.functions.GraftFunctions.jaro_winkler(col("a"), col("b"))).as[Double].collect()
    val want = Seq("martha" -> "marhta", "fn c1 open" -> "fn c1 fin", "" -> "")
      .map { case (a, b) => StringSim.jaroWinkler(a, b) }
    assert(got.toSeq == want)
    // SQL registration via GraftExtensions
    df.createOrReplaceTempView("jwtest")
    val sqlGot = spark.sql("SELECT jaro_winkler(a, b) FROM jwtest").as[Double].collect()
    assert(sqlGot.toSeq == want)
  }
}
