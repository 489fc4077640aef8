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

/** Per-job environment switch — the reference's `--test-mode` flag
  * (staging_to_bronze_iceberg.py:30-42 flips DB, warehouse path, and
  * table suffix). Test mode redirects every sink to a parallel
  * `<warehouse>_test_warehouse` root AND suffixes each table dir with
  * `_test`, so a test run can never touch production tables.
  */
object RunnerEnv {
  val TestFlag = "--test-mode"
  /** (positional args with the flag removed, testMode). */
  def split(args: Array[String]): (Array[String], Boolean) =
    (args.filterNot(_ == TestFlag), args.contains(TestFlag))
  def warehouse(base: String, testMode: Boolean): String =
    if (testMode) s"${base}_test_warehouse" else base
  def tableSuffix(testMode: Boolean): String = if (testMode) "_test" else ""
}

/** Bulk backfill: `runMain graft.runner.BulkMain <rawJsonlPath> <warehouse>
  * [ingestionDate] [--test-mode]` — EP2 (bulk_runner.py:86-110).
  */
object BulkMain {
  def main(args: Array[String]): Unit = {
    val (a, testMode) = RunnerEnv.split(args)
    require(a.length >= 2,
      "usage: BulkMain <rawJsonlPath> <warehouse> [ingestionDate] [--test-mode]")
    val rawPath = a(0)
    val warehouse = RunnerEnv.warehouse(a(1), testMode)
    val date = a.lift(2).getOrElse(java.time.LocalDate.now().toString)
    val spark = RunnerSession.build("graft-bulk")
    val raw = spark.read.text(rawPath)
    val (b, s, f) = Bulk.run(spark, raw, warehouse, date,
      tableSuffix = RunnerEnv.tableSuffix(testMode))
    println(s"bulk complete: bronze=$b silver=$s fact=$f")
    spark.stop()
  }
}

/** Incremental replay: `runMain graft.runner.ReplayMain <stagingBase>
  * <warehouse> <startIsoMinute> <ticks|catchup:untilIsoMinute>
  * [--test-mode]` — EP1, the 15-minute loop
  * (dags/replay_september_15min_dag.py semantics, in-process). The
  * `catchup:` form recovers missed ticks: it resumes after the bronze
  * sink's high-water interval (or seeds from <startIsoMinute> on a fresh
  * warehouse) and processes every 15-min tick up to the given instant,
  * in order — the DAG's catchup=True + max_active_runs=1 guarantees.
  */
object ReplayMain {
  def main(args: Array[String]): Unit = {
    val (a, testMode) = RunnerEnv.split(args)
    require(a.length == 4,
      "usage: ReplayMain <stagingBase> <warehouse> <startIsoMinute> " +
        "<ticks|catchup:untilIsoMinute> [--test-mode]")
    val Array(staging, warehouseBase, startStr, ticksStr) = a
    val warehouse = RunnerEnv.warehouse(warehouseBase, testMode)
    val start = LocalDateTime.parse(startStr, DateTimeFormatter.ISO_LOCAL_DATE_TIME)
    val spark = RunnerSession.build("graft-replay")
    val mb = new MicroBatch(spark, staging, warehouse,
      RunnerEnv.tableSuffix(testMode))
    if (ticksStr.startsWith("catchup:")) {
      val until = LocalDateTime.parse(ticksStr.stripPrefix("catchup:"),
        DateTimeFormatter.ISO_LOCAL_DATE_TIME)
      mb.catchUp(start, until).zipWithIndex.foreach { case ((b, s, f), i) =>
        println(s"catchup tick $i: bronze=$b silver=$s fact=$f")
      }
    } else {
      mb.runRange(start, ticksStr.toInt).zipWithIndex.foreach { case ((b, s, f), i) =>
        println(s"tick $i (${start.plusMinutes(15L * i)}): bronze=$b silver=$s fact=$f")
      }
    }
    spark.stop()
  }
}
