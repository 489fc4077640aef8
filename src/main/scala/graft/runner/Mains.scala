package graft.runner

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.SparkSession

/** CLI twins of the reference's spark-submit jobs (bulk_runner.py and the
  * replay DAG tasks): a user launches these exactly like the originals.
  */
object RunnerSession {
  def build(app: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName(app)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(s)
    s
  }
}

/** Bulk backfill: `runMain graft.runner.BulkMain <rawJsonlPath> <warehouse>
  * [ingestionDate]` — EP2 (bulk_runner.py:86-110).
  */
object BulkMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BulkMain <rawJsonlPath> <warehouse> [ingestionDate]")
    val Array(rawPath, warehouse) = args.take(2)
    val date = args.lift(2).getOrElse(java.time.LocalDate.now().toString)
    val spark = RunnerSession.build("graft-bulk")
    val raw = spark.read.text(rawPath)
    val (b, s, f) = Bulk.run(spark, raw, warehouse, date)
    println(s"bulk complete: bronze=$b silver=$s fact=$f")
    spark.stop()
  }
}

/** Incremental replay: `runMain graft.runner.ReplayMain <stagingBase>
  * <warehouse> <startIsoMinute> <ticks>` — EP1, the 15-minute loop
  * (dags/replay_september_15min_dag.py semantics, in-process).
  */
object ReplayMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: ReplayMain <stagingBase> <warehouse> <startIsoMinute> <ticks>")
    val Array(staging, warehouse, startStr, ticksStr) = args
    val start = LocalDateTime.parse(startStr, DateTimeFormatter.ISO_LOCAL_DATE_TIME)
    val spark = RunnerSession.build("graft-replay")
    val mb = new MicroBatch(spark, staging, warehouse)
    mb.runRange(start, ticksStr.toInt).zipWithIndex.foreach { case ((b, s, f), i) =>
      println(s"tick $i (${start.plusMinutes(15L * i)}): bronze=$b silver=$s fact=$f")
    }
    spark.stop()
  }
}
