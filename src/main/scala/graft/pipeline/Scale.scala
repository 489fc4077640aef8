package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: small-file compaction and skew-salted aggregation —
  * the two §4 techniques the core pipeline doesn't need at test scale
  * but a 100 TB deployment does.
  */
object Scale {

  /** Small-file compaction (the reference runs Iceberg
    * `rewrite_data_files` binpack at 128 MB, README.md:231-242): rewrite
    * a partitioned parquet table so each partition lands in few,
    * right-sized files. `maxRecordsPerFile` bounds the top end; AQE's
    * coalescing bounds the bottom.
    */
  def compact(df: DataFrame, outPath: String, partitionCols: Seq[String],
              maxRecordsPerFile: Long = 1000000L): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(outPath)

  /** Two-phase skew-salted aggregation: counts per key where a handful
    * of keys dominate. Phase 1 aggregates on (key, salt) — spreading a
    * hot key over `buckets` reducers — phase 2 merges the partials per
    * key. Both phases get map-side partial aggregation from Catalyst,
    * so the extra pass costs one small shuffle over the partials.
    *
    * Salting matters when a single key's rows exceed what one task
    * should hold; AQE's skew-join handling covers joins, this covers
    * aggregations with algebraic merge functions.
    */
  def saltedCount(df: DataFrame, key: Column, buckets: Int = 16): DataFrame = {
    require(buckets > 0)
    df.groupBy(key.as("k"), pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(buckets)).as("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("cnt"))
  }

  /** Salted distinct-count sketch-free variant: exact COUNT(DISTINCT v)
    * per hot key via two-phase dedup — phase 1 dedups (key, value)
    * pairs spread across reducers by hashing the value, phase 2 counts.
    * This is how the DAU countDistinct survives a key whose value set
    * doesn't fit one task.
    */
  def saltedCountDistinct(df: DataFrame, key: Column, value: Column): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .where(col("v").isNotNull)
      .distinct() // shuffles on (k, v) — no single-reducer hot key
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_distinct"))
}
