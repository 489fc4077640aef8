package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver → Gold fact build: the 4 left joins (J1–J4) with their distinct
  * null-handling variants, plus the metric expressions (engagement-score
  * when-chain, conversion isin, session seconds via split).
  *
  * Reference semantics: silver_to_gold_processor.py:237-383.
  *
  * Scale notes: all four dims are small relative to the fact stream
  * (README.md:268-275 — 15..17,520 rows at reference scale; ≤ millions at
  * 100 TB), so each join is pinned to a broadcast hash join — the silver
  * stream is never shuffled. A missed join yields SK 0 via coalesce, so
  * the fact row count always equals the silver row count (left joins on
  * unique dim keys never fan out).
  */
object SilverToGold {

  val ConversionEvents = Seq("auth_success", "click_bookmark", "create_comment")

  /** Engagement-score lookup chain (silver_to_gold_processor.py:285-292). */
  def engagementScore(eventName: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(eventName === "auth_success", 10.0)
      .when(eventName === "create_comment", 9.0)
      .when(eventName === "click_bookmark", 8.0)
      .when(eventName === "click_recipe", 7.0)
      .when(eventName === "search_recipe", 5.0)
      .when(eventName === "view_recipe", 4.0)
      .when(eventName === "view_page", 2.0)
      .otherwise(1.0)

  /** Session seconds: `prop_action` is "verb:seconds"; element 2 of the
    * split when present, else 60 (silver_to_gold_processor.py:278-280).
    */
  def sessionSeconds(propAction: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(propAction.isNotNull && (size(split(propAction, ":")) >= 2),
      coalesce(split(propAction, ":").getItem(1).cast("bigint"), lit(60L)))
      .otherwise(60L)

  /** Pure transform: silver + 4 dims → fact rows. */
  def buildFact(silver: DataFrame, dimUser: DataFrame, dimRecipe: DataFrame,
                dimEvent: DataFrame, dimPage: DataFrame): DataFrame = {
    val s = silver.alias("s")

    // J1 — left join on composite natural key (user_id, anonymous_id)
    val j1 = s.join(
      broadcast(dimUser.alias("du")),
      col("s.user_id") === col("du.user_id") &&
        col("s.anonymous_id") === col("du.anonymous_id"),
      "left")

    // J2 — cast-normalized key: both sides compared as string
    val j2 = j1.join(
      broadcast(dimRecipe.alias("dr")),
      col("s.prop_recipe_id").cast("string") === col("dr.recipe_id").cast("string"),
      "left")

    // J3 — equi-join with explicit null guard on the key
    val j3 = j2.join(
      broadcast(dimEvent.alias("de")),
      (col("s.event_name") === col("de.event_name")) && col("s.event_name").isNotNull,
      "left")

    // J4 — null-coalesced compound key + at-least-one-non-null guard
    val j4 = j3.join(
      broadcast(dimPage.alias("dp")),
      (coalesce(col("s.page_name"), lit("")) === coalesce(col("dp.page_name"), lit(""))) &&
        (coalesce(col("s.page_url"), lit("")) === coalesce(col("dp.page_url"), lit(""))) &&
        (col("s.page_name").isNotNull || col("s.page_url").isNotNull),
      "left")

    j4.select(
      col("s.event_id"),
      coalesce(col("du.user_sk"), lit(0L)).as("user_dim_key"),
      date_format(col("s.kst_timestamp"), "yyyyMMddHH").cast("bigint").as("time_dim_key"),
      coalesce(col("dr.recipe_sk"), lit(0L)).as("recipe_dim_key"),
      coalesce(col("dp.page_sk"), lit(0L)).as("page_dim_key"),
      coalesce(col("de.event_sk"), lit(0L)).as("event_dim_key"),
      lit(1).as("event_count"),
      sessionSeconds(col("s.prop_action")).as("session_duration_seconds"),
      lit(30L).as("page_view_duration_seconds"),
      col("s.event_name").isin(ConversionEvents: _*).as("is_conversion"),
      lit(1.0).as("conversion_value"),
      engagementScore(col("s.event_name")).as("engagement_score"),
      col("s.session_id"),
      col("s.anonymous_id"),
      col("s.kst_timestamp").as("created_at"),
      col("s.kst_timestamp").as("updated_at"))
  }

  /** A3 — join-success instrumentation (silver_to_gold_processor.py:299-310):
    * fraction of fact rows whose dim key resolved (non-zero SK).
    */
  def joinSuccess(fact: DataFrame): DataFrame =
    fact.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("user_dim_key") =!= 0, 1).otherwise(0)).as("user_joined"),
      sum(when(col("recipe_dim_key") =!= 0, 1).otherwise(0)).as("recipe_joined"),
      sum(when(col("event_dim_key") =!= 0, 1).otherwise(0)).as("event_joined"),
      sum(when(col("page_dim_key") =!= 0, 1).otherwise(0)).as("page_joined"))
}
