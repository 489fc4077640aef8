package graft

/** Scratch diagnostic: print a named oracle SQL to a file (Test scope;
  * `sbt "Test/runMain graft.OracleDump <query> <outfile>"`).
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)),
      SparkEntry.oracleSql(args(0)))
  }
}
