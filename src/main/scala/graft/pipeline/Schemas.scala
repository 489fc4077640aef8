package graft.pipeline

import org.apache.spark.sql.types._

/** Fixed StructTypes for the medallion pipeline (SURVEY.md §1).
  *
  * The raw event is one JSON object per line with two doubly-encoded
  * JSON-string fields (`context`, `event_properties`) that are parsed in a
  * second `from_json` pass. Shapes follow the reference DDLs:
  *   - event envelope: bronze_to_silver_iceberg.py:121-128
  *   - context:        bronze_to_silver_iceberg.py:129-139
  *   - properties:     bronze_to_silver_iceberg.py:140-145
  *   - bronze table:   staging_to_bronze_iceberg.py:74-81
  *   - silver table:   bronze_to_silver_iceberg.py:73-85
  *   - fact table:     silver_to_gold_processor.py:77-87
  */
object Schemas {

  /** Top-level JSON event envelope. `context` and `event_properties` stay
    * STRING here — they are JSON-in-JSON, parsed by a second from_json.
    */
  val jsonEventSchema: StructType = StructType(Seq(
    StructField("anonymous_id", StringType),
    StructField("context", StringType),
    StructField("date", StringType),
    StructField("event_id", StringType),
    StructField("event_name", StringType),
    StructField("event_properties", StringType),
    StructField("session_id", StringType),
    StructField("timestamp", StringType),
    StructField("user_id", StringType)
  ))

  /** Nested context payload (page struct + user traits + ab_test struct). */
  val contextSchema: StructType = StructType(Seq(
    StructField("page", StructType(Seq(
      StructField("name", StringType),
      StructField("url", StringType),
      StructField("path", StringType)
    ))),
    StructField("user_segment", StringType),
    StructField("activity_level", StringType),
    StructField("cooking_style", StringType),
    StructField("ab_test", StructType(Seq(
      StructField("scenario", StringType),
      StructField("group", StringType),
      StructField("start_date", StringType),
      StructField("end_date", StringType)
    )))
  ))

  /** Per-event-type properties; fixed projection (schema-on-read discards
    * unprojected keys).
    */
  val eventPropertiesSchema: StructType = StructType(Seq(
    StructField("page_name", StringType),
    StructField("referrer", StringType),
    StructField("recipe_id", StringType),
    StructField("list_type", StringType),
    StructField("action", StringType),
    StructField("search_keyword", StringType),
    StructField("result_count", IntegerType),
    // Per-event-type array properties the reference generator emits
    // (create_event_logs.py:297-311 targeting_tags, :674-681
    // selected_filters, :722 displayed_recipe_ids) but its silver ETL
    // never projects (bronze_to_silver_iceberg.py:140-145 declares only
    // scalars) — schema-on-read closure for the array corner: absent
    // keys parse to null, present ones to typed arrays.
    StructField("selected_filters", ArrayType(StringType)),
    StructField("displayed_recipe_ids", ArrayType(StringType)),
    StructField("targeting_tags", ArrayType(StringType)),
    // Ads-serving properties (create_event_logs.py:865-874 position on
    // view_ads/click_ads, :307-312 personalization_score from the AB
    // targeting logic): the one NUMERIC double event-property in the
    // generator's surface — parsing it exercises JSON double round-trip
    // through the doubly-encoded envelope, not just strings/ints/arrays.
    StructField("position", StringType),
    StructField("personalization_score", DoubleType)
  ))

  /** Bronze: raw string preservation + ingestion metadata, partitioned by
    * ingestion_date.
    */
  val bronzeSchema: StructType = StructType(Seq(
    StructField("raw_event_string", StringType),
    StructField("source_file", StringType),
    StructField("ingestion_timestamp", TimestampType),
    StructField("ingestion_date", DateType)
  ))

  /** Silver: parsed + deduped, event-time partitioned by (year,month,day). */
  val silverColumns: Seq[String] = Seq(
    "event_id", "event_name", "user_id", "anonymous_id", "session_id",
    "kst_timestamp", "utc_timestamp", "date",
    "year", "month", "day", "hour", "day_of_week",
    "page_name", "page_url", "user_segment", "cooking_style", "ab_test_group",
    "prop_recipe_id", "prop_list_type", "prop_action", "prop_search_keyword",
    "prop_result_count", "prop_ad_position", "prop_personalization_score",
    "processed_at", "data_source", "pipeline_version")
}
