package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic for sizing BPE constants (Test scope; run via
  * `sbt "Test/runMain graft.BpeProbe <batch> <cap> <rounds> <sfDir>"`).
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val batch = args(0).toInt; val cap = args(1).toInt
    val rounds = args(2).toInt; val sf = args(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val words = graft.queries.TextOps.bpeWords(spark, sf)
    val t0 = System.nanoTime()
    val (m, _) = graft.queries.TextOps.bpeInduce(spark, words,
      rounds = rounds, batch = batch, cap = cap)
    val t = (System.nanoTime() - t0) / 1e9
    println(f"PROBE sf=$sf batch=$batch cap=$cap rounds=$rounds " +
      f"merges=${m.size} t=$t%.1fs per_merge=${t / m.size}%.4f")
    spark.stop()
  }
}
