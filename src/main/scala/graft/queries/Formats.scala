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
        |FROM agg ORDER BY event_type""".stripMargin
  )
}
