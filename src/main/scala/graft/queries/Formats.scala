package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** A8 + the remaining §2.8 scalar-function surface: ROUND(AVG(...)),
  * format_number / format_string (Trino format_number / format),
  * from_utc_timestamp (AT TIME ZONE 'Asia/Seoul'), weekofyear (ISO),
  * string concat — each verified against the DuckDB twin.
  */
object Formats {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kpi_format" -> { (s, dir) =>
      import s.implicits._
      load(s, dir, "events")
        .withColumn("kst", from_utc_timestamp($"ts", "Asia/Seoul"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          round(avg($"value"), 2).as("avg_value"),
          min(weekofyear($"kst")).cast("long").as("first_kst_week"),
          max(weekofyear($"kst")).cast("long").as("last_kst_week"))
        .withColumn("n_fmt", format_number($"n", 0))
        .withColumn("avg_fmt", format_string("%.2f", $"avg_value"))
        .withColumn("label", concat($"event_type", lit(" ("), $"n_fmt", lit(" events)")))
        .orderBy($"event_type")
    },

    // Path-based JSON extraction (get_json_object) — the schema-free
    // complement of from_json: pull one path out of the payload without
    // declaring any structure (the exploratory/one-field read that a
    // full parse wastes work on). Narrow codegen'd map + one bounded
    // shuffle; exact integer stats per event type.
    "q_json_extract" -> { (s, dir) =>
      import s.implicits._
      load(s, dir, "events")
        .select($"event_type",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .where($"k".isNotNull)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"event_type")
    },

    // from_json to MAP — the third from_json target shape (struct and
    // array are gated in q_silver_parse / q_array_props): parse the
    // free-form props payload as map<string,bigint> WITHOUT a declared
    // struct schema (the dynamic-keys case a fixed StructType can't
    // model), explode to (key, value) grain, aggregate per key. Narrow
    // parse + one bounded-key shuffle; exact integer stats.
    "q_map_props" -> { (s, dir) =>
      import s.implicits._
      load(s, dir, "events")
        .where($"props".isNotNull)
        .select(explode(from_json($"props",
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.LongType)))
          .as(Seq("key", "val")))
        .where($"val".isNotNull)
        .groupBy($"key")
        .agg(count(lit(1)).as("n"), sum($"val").as("sum_val"),
          min($"val").as("min_val"), max($"val").as("max_val"))
        .orderBy($"key")
    }
  )

  val oracles: Map[String, String] = Map(
    "q_kpi_format" ->
      """WITH agg AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    round(AVG(value), 2) AS avg_value,
        |    CAST(MIN(weekofyear(ts + INTERVAL 9 HOUR)) AS BIGINT) AS first_kst_week,
        |    CAST(MAX(weekofyear(ts + INTERVAL 9 HOUR)) AS BIGINT) AS last_kst_week
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_type, n, avg_value, first_kst_week, last_kst_week,
        |  format('{:,}', n) AS n_fmt,
        |  format('{:.2f}', avg_value) AS avg_fmt,
        |  event_type || ' (' || format('{:,}', n) || ' events)' AS label
        |FROM agg ORDER BY event_type""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |WHERE k IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // DuckDB's json table functions aren't available offline; the
    // scalar pair json_keys + json_extract_string covers the map shape.
    "q_map_props" ->
      """WITH kv AS (
        |  SELECT unnest(json_keys(props)) AS key, props
        |  FROM events WHERE props IS NOT NULL
        |), v AS (
        |  SELECT key,
        |    CAST(json_extract_string(props, '$."' || key || '"') AS BIGINT) AS val
        |  FROM kv
        |)
        |SELECT key, COUNT(*) AS n, CAST(SUM(val) AS BIGINT) AS sum_val,
        |  MIN(val) AS min_val, MAX(val) AS max_val
        |FROM v WHERE val IS NOT NULL
        |GROUP BY key ORDER BY key""".stripMargin
  )
}
