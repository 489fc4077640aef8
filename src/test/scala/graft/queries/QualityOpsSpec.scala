package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavior contracts for the corpus-quality trio added in round 11:
  * integer-exact PageRank (q_pagerank), DSIR importance weights
  * (q_dsir_weights), and CCNet perplexity bucketing (q_ppl_buckets).
  * Cross-engine value equality is the verify gate's job; these pin the
  * properties the gate can't see — mass conservation bounds, signal
  * direction, tie-inclusive selection, tertile balance. Runs on
  * sf0.001 testdata (tiny).
  */
class QualityOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("pagerank: deterministic, positive, mass within the floor-loss bound") {
    val q = graft.queries.GraphOps.queries("q_pagerank")
    val a = q(spark, sf).collect()
    val b = q(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "integer PageRank must be bit-deterministic")
    assert(a.nonEmpty)
    assert(a.forall(_.getLong(1) > 0L), "every page keeps at least teleport mass")
    // Each iteration's floors lose < 1 unit per edge (contrib div), plus
    // < 1 per node for teleport and < 1 per node for the dangling share;
    // mass never exceeds SCALE.
    val total = a.map(_.getLong(1)).sum
    val scale = 1000000000L
    val n = a.length
    import spark.implicits._
    val views = graft.Tables.load(spark, sf, "events")
      .where($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id",
        get_json_object($"props", "$.k").cast("long").as("page"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val e = views.withColumn("prev", lag($"page", 1).over(w))
      .where($"prev".isNotNull && $"prev" =!= $"page")
      .select($"prev", $"page").distinct().count()
    assert(total <= scale)
    assert(total >= scale - 10L * (e + 2L * n) - n,
      s"lost more mass than 10 iterations of floor rounding can explain: $total")
  }

  test("pagerank: dangling pages all hold the identical minimum-shape rank") {
    import spark.implicits._
    val ranks = graft.queries.GraphOps.queries("q_pagerank")(spark, sf)
    // out_weight = 0 identifies dangling nodes; with no in-edges their
    // rank is exactly teleport + dangling-share, identical across them.
    val dangliest = ranks.where($"out_weight" === 0L)
    if (dangliest.count() > 1) {
      val inEdges = {
        val views = graft.Tables.load(spark, sf, "events")
          .where($"event_type" === "view")
          .select($"user_id", $"ts", $"event_id",
            get_json_object($"props", "$.k").cast("long").as("page"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        views.withColumn("prev", lag($"page", 1).over(w))
          .where($"prev".isNotNull && $"prev" =!= $"page")
          .select($"page".as("dst")).distinct()
      }
      val isolated = dangliest.join(inEdges,
        dangliest("page") === inEdges("dst"), "left_anti")
      val distinctRanks =
        isolated.select($"rank_e9").distinct().collect().map(_.getLong(0))
      assert(distinctRanks.length <= 1,
        "isolated pages (no in- or out-edges) must share one exact rank")
    }
  }

  test("dsir: en-target scores point at en docs; selection is tie-inclusive top quarter") {
    import spark.implicits._
    val out = graft.queries.TextOps.queries("q_dsir_weights")(spark, sf)
      .join(graft.Tables.load(spark, sf, "documents").select($"doc_id", $"lang"),
        Seq("doc_id"))
      .select($"doc_id", $"score_fp", $"selected", $"lang")
      .collect()
    val n = out.length
    assert(n > 0)
    val sel = out.filter(_.getBoolean(2))
    assert(sel.length >= math.ceil(n / 4.0).toInt,
      "ties are kept inclusively, so at least ceil(N/4) docs are selected")
    val thr = sel.map(_.getLong(1)).min
    assert(out.filter(_.getLong(1) >= thr).forall(_.getBoolean(2)),
      "every doc at or above the threshold score is selected")
    // Signal direction: the length-normalized score of en docs beats
    // non-en on average (the target distribution IS the en slice).
    val enMean = out.filter(_.getString(3) == "en").map(_.getLong(1).toDouble).sum /
      out.count(_.getString(3) == "en")
    val otherMean = out.filter(_.getString(3) != "en").map(_.getLong(1).toDouble).sum /
      out.count(_.getString(3) != "en")
    assert(enMean > otherMean,
      s"en docs must score above non-en under an en target ($enMean vs $otherMean)")
  }

  test("ppl-buckets: per-language tertiles are balanced and perplexity-ordered") {
    import spark.implicits._
    val out = graft.queries.TextOps.queries("q_ppl_buckets")(spark, sf)
    val sizes = out.groupBy($"lang", $"ppl_bucket").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = sizes.keys.map(_._1).toSet
    for (l <- langs) {
      val h = sizes.getOrElse((l, "head"), 0L)
      val m = sizes.getOrElse((l, "middle"), 0L)
      val t = sizes.getOrElse((l, "tail"), 0L)
      assert(math.abs(h - t) <= 1 && math.abs(h - m) <= 1 && math.abs(m - t) <= 1,
        s"ntile(3) must balance within 1 for lang=$l (got $h/$m/$t)")
    }
    val byLang = out.select($"lang", $"ppl_bucket", $"mean_surprise")
      .collect().groupBy(_.getString(0))
    for ((l, rows) <- byLang) {
      def vals(b: String) = rows.filter(_.getString(1) == b).map(_.getDouble(2))
      val (h, m, t) = (vals("head"), vals("middle"), vals("tail"))
      if (h.nonEmpty && m.nonEmpty)
        assert(h.max <= m.min, s"head must not exceed middle for lang=$l")
      if (m.nonEmpty && t.nonEmpty)
        assert(m.max <= t.min, s"middle must not exceed tail for lang=$l")
    }
  }
}
