package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalRollupSpec extends SparkSpec {
  import spark.implicits._

  private def agg(fact: DataFrame): DataFrame = fact
    .groupBy($"d", $"k")
    .agg(count(lit(1)).as("n"), sum($"v").as("s"))

  // partition values like "2024-01-01" are type-inferred to DATE on
  // read-back — normalize to string for comparison
  private def rows(path: String): Set[(String, String, Long, Long)] =
    spark.read.parquet(path).select($"d".cast("string"), $"k", $"n", $"s")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet

  /** (relative path, mtime, size) of every data file under a partition. */
  private def partFiles(root: String, part: String): Set[(String, Long, Long)] = {
    val dir = new java.io.File(s"$root/d=$part")
    if (!dir.exists()) Set.empty
    else dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified(), f.length())).toSet
  }

  test("update recomputes ONLY affected partitions; untouched files stay put") {
    val base = tmpDir("graft_incr_rollup_spec")
    val fact = s"$base/fact"; val roll = s"$base/roll"
    def batch(d: String, ks: Seq[(String, Long)]): DataFrame =
      ks.map { case (k, v) => (d, k, v) }.toDF("d", "k", "v")

    // tick 1: two dates
    (batch("2024-01-01", Seq("a" -> 1L, "a" -> 2L, "b" -> 5L))
      .union(batch("2024-01-02", Seq("a" -> 7L))))
      .write.mode("append").partitionBy("d").parquet(fact)
    IncrementalRollup.update(spark, fact, roll, "d",
      Seq("2024-01-01", "2024-01-02"), agg)
    assert(rows(roll) == Set(
      ("2024-01-01", "a", 2L, 3L), ("2024-01-01", "b", 1L, 5L),
      ("2024-01-02", "a", 1L, 7L)))
    val jan1Before = partFiles(roll, "2024-01-01")
    assert(jan1Before.nonEmpty)

    // tick 2: a NEW date only — jan 1's rollup files must not be touched
    Thread.sleep(1100) // mtime granularity can be 1s on some filesystems
    batch("2024-01-03", Seq("b" -> 9L))
      .write.mode("append").partitionBy("d").parquet(fact)
    IncrementalRollup.update(spark, fact, roll, "d", Seq("2024-01-03"), agg)
    assert(partFiles(roll, "2024-01-01") == jan1Before,
      "dynamic overwrite rewrote an unaffected partition")
    assert(rows(roll).contains(("2024-01-03", "b", 1L, 9L)))

    // tick 3: LATE data for jan 1 — that partition is affected again and
    // heals to the full-recompute value; jan 2/3 remain untouched
    val jan2Before = partFiles(roll, "2024-01-02")
    batch("2024-01-01", Seq("a" -> 10L))
      .write.mode("append").partitionBy("d").parquet(fact)
    IncrementalRollup.update(spark, fact, roll, "d", Seq("2024-01-01"), agg)
    assert(partFiles(roll, "2024-01-02") == jan2Before)
    // equality with a full rebuild over the whole fact
    val full = agg(spark.read.parquet(fact).withColumn("d", $"d".cast("string")))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(rows(roll) == full)
  }

  test("agg that drops the partition column is rejected") {
    val base = tmpDir("graft_incr_rollup_bad")
    Seq(("2024-01-01", "a", 1L)).toDF("d", "k", "v")
      .write.partitionBy("d").parquet(s"$base/fact")
    val e = intercept[IllegalArgumentException] {
      IncrementalRollup.update(spark, s"$base/fact", s"$base/roll", "d",
        Seq("2024-01-01"), f => f.groupBy($"k").agg(count(lit(1)).as("n")))
    }
    assert(e.getMessage.contains("partition-local"))
  }

  test("empty affected set is a no-op") {
    val base = tmpDir("graft_incr_rollup_empty")
    IncrementalRollup.update(spark, s"$base/nope", s"$base/roll", "d",
      Seq.empty, identity)
    assert(!new java.io.File(s"$base/roll").exists())
  }
}
