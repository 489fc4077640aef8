package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra-Gries native aggregate: the deterministic guarantees (not the
  * order-dependent buffer) are what's pinned — under-estimation, the
  * N/(k+1) error bound, guaranteed capture above the threshold — plus
  * exactness when k covers the vocabulary and correct merge across
  * many partitions.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact when k >= distinct items, across many partitions") {
    val df = spark.range(0, 10000, 1, 17) // 17 partitions force merges
      .select(concat(lit("w"), ($"id" % 7)).as("w"))
    val m = df.agg(HeavyHitters($"w", 16).as("hh"))
      .selectExpr("hh").as[Map[String, Long]].head()
    val exact = df.groupBy($"w").count()
      .as[(String, Long)].collect().toMap
    assert(m == exact, s"sketch $m != exact $exact")
  }

  test("under-estimates within N/(k+1), captures every item above threshold") {
    // Zipf-ish: item i appears ~10000/i times; k=8 over ~30 items.
    // Deliberately interleaved adversarially via sort on a hash so the
    // heavy items do NOT arrive grouped.
    val df = spark.range(1, 31).select(explode(sequence(lit(1), (lit(10000) / $"id").cast("int"))).as("rep"), $"id")
      .select(concat(lit("w"), $"id").as("w"), md5(concat($"id", lit(":"), $"rep")).as("h"))
      .repartition(13, $"h")
    val k = 8
    val n = df.count()
    val exact = df.groupBy($"w").count().as[(String, Long)].collect().toMap
    val m = df.agg(HeavyHitters($"w", k).as("hh"))
      .selectExpr("hh").as[Map[String, Long]].head()
    assert(m.size <= k)
    val bound = n / (k + 1)
    m.foreach { case (w, est) =>
      val t = exact(w)
      assert(est <= t, s"$w over-estimated: $est > $t")
      assert(t - est <= bound, s"$w error ${t - est} exceeds N/(k+1)=$bound")
    }
    exact.filter(_._2 > bound).keys.foreach { w =>
      assert(m.contains(w), s"heavy item $w (count ${exact(w)} > $bound) missing")
    }
  }

  test("SQL registration via extensions hook") {
    GraftExtensions.register(spark)
    Seq("x", "x", "y").toDF("w").createOrReplaceTempView("hh_in")
    val m = spark.sql("SELECT heavy_hitters(w, 4) AS hh FROM hh_in")
      .as[Map[String, Long]].head()
    assert(m == Map("x" -> 2L, "y" -> 1L))
  }

  test("non-literal k raises a clean analysis error, not a runtime NPE") {
    GraftExtensions.register(spark)
    Seq("x").toDF("w").createOrReplaceTempView("hh_badk")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT heavy_hitters(w, length(w)) FROM hh_badk").collect()
    }
    assert(e.getMessage.contains("heavy_hitters"))
  }

  test("null inputs are skipped; works under groupBy keys") {
    val df = Seq(("a", Some("x")), ("a", Some("x")), ("a", None),
      ("b", Some("y"))).toDF("g", "w")
    val out = df.groupBy($"g").agg(HeavyHitters($"w", 4).as("hh"))
      .as[(String, Map[String, Long])].collect().toMap
    assert(out("a") == Map("x" -> 2L))
    assert(out("b") == Map("y" -> 1L))
  }
}
