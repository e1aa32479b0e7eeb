package graft.tools

import graft.functions.StringSim

/**
 * Dev tool: emit deterministic random string pairs with our
 * jaro_winkler/levenshtein values as TSV, for bit-equality diffing
 * against the DuckDB oracle implementation.
 */
object JwFuzz {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefgh XY_0123"
    def mk(len: Int): String = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    var i = 0
    val sb = new StringBuilder
    while (i < n) {
      val a = mk(rnd.nextInt(30))
      val b = if (rnd.nextBoolean()) {
        // perturb a: closer pairs exercise the boost branch
        val chars = a.toCharArray
        if (chars.nonEmpty) chars(rnd.nextInt(chars.length)) = alpha(rnd.nextInt(alpha.length))
        new String(chars) + (if (rnd.nextInt(4) == 0) "z" else "")
      } else mk(rnd.nextInt(30))
      sb.append(a).append('\t').append(b).append('\t')
        .append(java.lang.Double.toString(StringSim.jaroWinkler(a, b))).append('\t')
        .append(StringSim.levenshtein(a, b)).append('\n')
      i += 1
    }
    print(sb)
  }
}
