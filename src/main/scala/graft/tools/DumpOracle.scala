package graft.tools
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val m = graft.SparkEntry.oracleSql
    val json = m.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + k + "\": " + new String(com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsBytes(v))
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)), json.getBytes("UTF-8"))
  }
}
