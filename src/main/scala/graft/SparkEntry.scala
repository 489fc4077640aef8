package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's verify-gate entry;
  * `oracleSql` the DuckDB twins. Column names are aliased identically on
  * both sides (driver sorts columns by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The DAU rollup is the reference's headline dashboard shape
    * (SURVEY.md §7.3): 4-level unionByName segment rollup + countDistinct.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_dau_rollup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Medallion.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.VectorOps.queries ++
      graft.queries.MultimodalQ.queries ++
      graft.queries.Formats.queries ++
      graft.queries.Diagnostics.queries ++
      graft.queries.TemporalOps.queries ++
      graft.queries.StreamingParity.queries ++
      graft.queries.GraphOps.queries ++
      graft.queries.GoldE2E.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Medallion.oracles ++
      graft.queries.Analytics.oracles ++
      graft.queries.TextOps.oracles ++
      graft.queries.VectorOps.oracles ++
      graft.queries.MultimodalQ.oracles ++
      graft.queries.Formats.oracles ++
      graft.queries.Diagnostics.oracles ++
      graft.queries.TemporalOps.oracles ++
      graft.queries.StreamingParity.oracles ++
      graft.queries.GraphOps.oracles ++
      graft.queries.GoldE2E.oracles
}
