package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located tables: pay the shuffle ONCE at write time so every
  * subsequent equi-join or aggregation on the bucket key plans with ZERO
  * Exchange on the bucketed side.
  *
  * The reference re-joins fact events to dims on the same keys every run
  * (`replay_silver_to_gold backup.py:238-261` — user/event/recipe key
  * joins repeated per batch); at its scale the dims broadcast, which the
  * repo already does (`SilverToGold`). At 100 TB the *fact × fact* shapes
  * — retention self-join, searchclick CTE join, incremental dedup's
  * corpus probe — join two huge tables on `user_id`/`doc_id` where
  * NEITHER side broadcasts, and every run re-shuffles both sides. Spark's
  * native answer is hash bucketing (the same design as Iceberg's
  * `bucket(N, col)` partition transform the reference's Iceberg tables
  * could declare): `bucketBy(N, key)` + `sortBy(key)` at write time makes
  * the scan itself report `HashPartitioning(key, N)`, so Catalyst plans a
  * SortMergeJoin of two co-bucketed tables with no ShuffleExchange at
  * all, and a `groupBy(key)` over one table with a single final
  * HashAggregate (no partial/exchange/final split). At a 1000-executor
  * scale that converts the per-run O(total bytes) shuffle of the biggest
  * tables into a one-time write-side cost amortized over every downstream
  * run.
  *
  * Bucket-count choice at scale: buckets ≈ table bytes / 128 MB target,
  * and both join sides must agree (Spark joins co-bucketed scans
  * shuffle-free when bucket counts match; one side must be a multiple of
  * the other otherwise). Files per bucket stay bounded because the write
  * repartitions by the bucket expression first (one task per bucket, not
  * tasks × buckets small files).
  */
object Bucketed {

  /** Write `df` as a catalog parquet table hash-bucketed (and sorted)
    * on `key`. The explicit pre-repartition on the bucket column keeps
    * file count = bucket count (each bucket written by exactly the task
    * that owns it) instead of one file per (input task × bucket).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.repartition(buckets, df(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their shared bucket key. With
    * matching bucket counts the physical plan is a SortMergeJoin whose
    * children are the bucketed scans directly — no ShuffleExchange on
    * either side (asserted in CatalogBulkSpec).
    */
  def bucketJoin(spark: SparkSession, left: String, right: String,
                 key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
