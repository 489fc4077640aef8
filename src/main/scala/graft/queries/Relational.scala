package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator coverage (SURVEY.md §2.3–2.7) over the driver
  * testdata star schema: aggregation, star joins (broadcast dims),
  * anti/semi joins, top-k. Each query has a DuckDB oracle twin in
  * [[oracles]]; column names and total row order are deterministic and
  * aligned on both sides.
  */
object Relational {
  import graft.Tables.load

  /** Exact cross-engine money arithmetic: scalar math stays in double
    * (bit-identical IEEE ops in Spark and DuckDB), each row is snapped to
    * decimal(18,4) (ties at the rounding point are vanishingly unlikely
    * for 2-decimal-derived money values, so rounding-mode differences
    * don't bite in practice), the sum is exact decimal, and the result is
    * emitted as double.
    */
  private def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A5/A8 — grouped aggregation with filter pushed to the parquet scan.
    // Reference: bronze_to_silver count instrumentation + Trino agg queries
    // (silver_to_gold_processor.py:300-304, daily_events.sql).
    "q1_agg" -> { (s, dir) =>
      import s.implicits._
      // Cutoff chosen inside the data's range (1995..2001) so the
      // predicate actually filters rows and is pushed to the parquet scan;
      // both engines compare against the same naive-timestamp literal
      // under a UTC-pinned session.
      load(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1997-06-30 00:00:00").cast(TimestampType))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          moneySum($"l_quantity").as("sum_qty"),
          moneySum($"l_extendedprice").as("sum_base_price"),
          moneySum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // J6 — star join fact→dims; small dims broadcast (DAU.sql:9-11 shape).
    "q2_star_join" -> { (s, dir) =>
      import s.implicits._
      val li = load(s, dir, "lineitem")
      val o = load(s, dir, "orders")
      val c = load(s, dir, "customer")
      val n = load(s, dir, "nation")
      val r = load(s, dir, "region")
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(
          moneySum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"r_name", $"n_name")
    },

    // T2 — top-k: ORDER BY aggregate DESC LIMIT k with key tiebreak
    // (top_10_clicked_recipe.sql:8-10). Catalyst: TakeOrderedAndProject.
    "q3_topk" -> { (s, dir) =>
      import s.implicits._
      val li = load(s, dir, "lineitem")
      // part stays ~2MB/SF — pin the broadcast rather than trusting the
      // size estimate at every scale (VERDICT r1 plan audit)
      val p = broadcast(load(s, dir, "part"))
      li.join(p, $"l_partkey" === $"p_partkey")
        .groupBy($"p_partkey", $"p_name")
        .agg(moneySum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("part_revenue"))
        .orderBy($"part_revenue".desc, $"p_partkey".asc)
        .limit(10)
    },

    // J5 — left anti join (incremental dim upsert shape,
    // replay_silver_to_gold.py:226-231): customers with no orders before
    // the cutoff. The cutoff keeps the result non-empty AND non-trivial
    // at every SF (every customer has *some* order, so an unfiltered
    // anti-join would pass vacuously with 0 rows).
    "q4_anti_join" -> { (s, dir) =>
      import s.implicits._
      val c = load(s, dir, "customer")
      val o = load(s, dir, "orders")
        .filter($"o_orderdate" < lit("1996-01-01 00:00:00").cast(TimestampType))
      c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_nationkey")
        .orderBy($"c_custkey")
    },

    // J9 — semi join against a top-k subquery
    // (top_10_interactions_per_events.sql:11-23).
    "q5_semi_topk" -> { (s, dir) =>
      import s.implicits._
      val o = load(s, dir, "orders")
      val top10 = o.groupBy($"o_custkey").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"o_custkey".asc).limit(10)
        .select($"o_custkey")
      o.join(top10, Seq("o_custkey"), "left_semi")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          moneySum($"o_totalprice").as("total_price"))
        .orderBy($"o_orderstatus")
    },

    // INTERSECT / EXCEPT distinct-set operators (the U-surface beyond
    // UNION ALL): high-value purchase users vs high-value error users,
    // all three set regions tagged in one output. Catalyst plans these
    // as left-semi / left-anti joins over distinct inputs — one shuffle
    // per branch on user_id, no global sort until the bounded output.
    // The 150 cutoff keeps every branch non-empty at all three sfs.
    "q_set_ops" -> { (s, dir) =>
      import s.implicits._
      val e = load(s, dir, "events")
      def users(t: String) = e
        .where($"event_type" === t && $"value" > 150.0)
        .select($"user_id").distinct()
      val p = users("purchase"); val err = users("error")
      p.intersect(err).withColumn("op", lit("both"))
        .unionByName(p.except(err).withColumn("op", lit("purchase_only")))
        .unionByName(err.except(p).withColumn("op", lit("error_only")))
        .select($"op", $"user_id")
        .orderBy($"op", $"user_id")
    },

    // FULL OUTER join (the one join type the reference never uses but a
    // metrics-reconciliation layer needs): per-user high-value purchase
    // stats ⋈ high-value error stats, keeping users present on either
    // side only. Both inputs aggregate BEFORE the join (user-cardinality
    // frames), so the full-outer shuffle carries one row per user per
    // side; no broadcast (full outer can't build-broadcast anyway).
    "q_full_outer" -> { (s, dir) =>
      import s.implicits._
      val e = load(s, dir, "events")
      val p = e.where($"event_type" === "purchase" && $"value" > 150.0)
        .groupBy($"user_id").agg(
          count(lit(1)).as("n_hi_purchase"),
          moneySum($"value").as("hi_purchase_value"))
      val err = e.where($"event_type" === "error" && $"value" > 150.0)
        .groupBy($"user_id").agg(count(lit(1)).as("n_hi_error"))
      p.join(err, Seq("user_id"), "full_outer")
        .select($"user_id", $"n_hi_purchase", $"hi_purchase_value",
          $"n_hi_error",
          ($"n_hi_purchase".isNotNull && $"n_hi_error".isNotNull)
            .as("on_both_sides"))
        .orderBy($"user_id")
    },

    // Correlated scalar aggregate subquery (TPC-H Q17 shape) — run
    // through spark.sql so Catalyst's RewriteCorrelatedScalarSubquery
    // path is exercised (decorrelates to an aggregate + join; the
    // DataFrame twin would hand-build that join and skip the rewrite).
    // Revenue of line items under half their part's average quantity.
    // Cross-engine float determinism: the per-part average is an exact
    // decimal SUM cast to double once, divided by the exact count — the
    // moment idiom — so the comparison threshold is bit-identical.
    "q_corr_subquery" -> { (s, dir) =>
      val view = s"lineitem_corr_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      load(s, dir, "lineitem").createOrReplaceTempView(view)
      val out = s.sql(
        s"""SELECT l_returnflag, COUNT(*) AS n_small,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS small_rev
           |FROM $view o
           |WHERE l_quantity < (
           |  SELECT 0.5 * (CAST(SUM(CAST(i.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
           |                / COUNT(*))
           |  FROM $view i WHERE i.l_partkey = o.l_partkey)
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      s.catalog.dropTempView(view)
      out
    }
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1997-06-30 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_star_join" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q3_topk" ->
      """SELECT p_partkey, p_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS part_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_partkey, p_name
        |ORDER BY part_revenue DESC, p_partkey ASC
        |LIMIT 10""".stripMargin,
    "q4_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q5_semi_topk" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_custkey IN (
        |  SELECT o_custkey FROM orders GROUP BY o_custkey
        |  ORDER BY COUNT(*) DESC, o_custkey ASC LIMIT 10)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q_set_ops" ->
      """WITH p AS (SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase' AND value > 150),
        |e AS (SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'error' AND value > 150)
        |SELECT 'both' AS op, user_id
        |  FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
        |UNION ALL
        |SELECT 'purchase_only', user_id
        |  FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM e)
        |UNION ALL
        |SELECT 'error_only', user_id
        |  FROM (SELECT user_id FROM e EXCEPT SELECT user_id FROM p)
        |ORDER BY op, user_id""".stripMargin,
    "q_full_outer" ->
      """WITH p AS (
        |  SELECT user_id, COUNT(*) AS n_hi_purchase,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS hi_purchase_value
        |  FROM events WHERE event_type = 'purchase' AND value > 150
        |  GROUP BY user_id
        |), e AS (
        |  SELECT user_id, COUNT(*) AS n_hi_error
        |  FROM events WHERE event_type = 'error' AND value > 150
        |  GROUP BY user_id
        |)
        |SELECT COALESCE(p.user_id, e.user_id) AS user_id,
        |  n_hi_purchase, hi_purchase_value, n_hi_error,
        |  (n_hi_purchase IS NOT NULL AND n_hi_error IS NOT NULL) AS on_both_sides
        |FROM p FULL OUTER JOIN e ON p.user_id = e.user_id
        |ORDER BY user_id""".stripMargin,
    "q_corr_subquery" ->
      """SELECT l_returnflag, COUNT(*) AS n_small,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS small_rev
        |FROM lineitem o
        |WHERE l_quantity < (
        |  SELECT 0.5 * (CAST(SUM(CAST(i.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |                / COUNT(*))
        |  FROM lineitem i WHERE i.l_partkey = o.l_partkey)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
