package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog/DDL surface (S7/S8): database + partitioned-table DDL via
  * spark.sql, saveAsTable sinks, refreshTable — the catalog-backed twin
  * of the path-based [[Warehouse]] sinks.
  *
  * Reference: `CREATE TABLE IF NOT EXISTS ... PARTITIONED BY` in every
  * job (staging_to_bronze_iceberg.py:74-81), `CREATE DATABASE IF NOT
  * EXISTS` + `USE` (staging_to_bronze_iceberg.py:64-67), refreshTable
  * (silver_to_gold_processor.py:339). Iceberg's hidden `days()` transform
  * becomes an explicit partition column (SURVEY.md §4).
  */
object Catalog {

  def ensureDatabase(spark: SparkSession, db: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"USE $db")
  }

  /** Declare the silver table shape (partitioned, parquet). */
  def ensureSilverTable(spark: SparkSession, table: String): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $table (
         |  event_id STRING, event_name STRING, user_id STRING,
         |  anonymous_id STRING, session_id STRING,
         |  kst_timestamp TIMESTAMP, utc_timestamp TIMESTAMP, date DATE,
         |  hour INT, day_of_week STRING,
         |  page_name STRING, page_url STRING, user_segment STRING,
         |  cooking_style STRING, ab_test_group STRING,
         |  prop_recipe_id BIGINT, prop_list_type STRING, prop_action STRING,
         |  prop_search_keyword STRING, prop_result_count INT,
         |  processed_at TIMESTAMP, data_source STRING, pipeline_version STRING,
         |  year INT, month INT, day INT
         |) USING PARQUET PARTITIONED BY (year, month, day)""".stripMargin)

  /** Append into a catalog table (S5 sink; dynamic-partition aware). */
  def append(df: DataFrame, table: String): Unit =
    df.write.mode("append").insertInto(table)

  /** Overwrite-rebuild a dim table (S6 sink). */
  def overwriteTable(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").saveAsTable(table)

  def refresh(spark: SparkSession, table: String): Unit =
    spark.catalog.refreshTable(table)
}
