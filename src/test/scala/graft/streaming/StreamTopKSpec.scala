package graft.streaming

import org.apache.spark.sql.functions.{explode, length, split}

import graft.SparkSpec

/** Streaming Misra-Gries heavy hitters: state carries the sketch across
  * drains (the second drain's sketch reflects BOTH batches), state is
  * O(k) per group, and the sketch obeys the Misra-Gries guarantees vs
  * the exact batch counts over everything drained so far — capture of
  * items above N/(k+1), under-estimation, bounded error — for an
  * arbitrary batch split of the stream.
  */
class StreamTopKSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "text", "lang").coalesce(1).write.mode("append").parquet(dir)

  test("cross-drain sketch obeys Misra-Gries guarantees vs exact counts") {
    val base = tmpDir("stopk")
    val docs = s"$base/docs"; val out = s"$base/out"; val ckpt = s"$base/ckpt"

    // one heavy token ("hot": 60% of stream) split across two drains, a
    // mid token, and a tail of singletons wide enough to exceed K=16
    // counters and force decrements
    val tail1 = (1 to 20).map(i => s"t$i").mkString(" ")
    val tail2 = (21 to 40).map(i => s"t$i").mkString(" ")
    writeDocs(docs, Seq(
      (1L, ("hot " * 30).trim, "en"),
      (2L, ("mid " * 8).trim + " " + tail1, "en"),
      (3L, ("solo " * 50).trim, "fr")))
    StreamTopK.run(spark, docs, out, ckpt)

    writeDocs(docs, Seq(
      (4L, ("hot " * 30).trim, "en"),
      (5L, ("mid " * 8).trim + " " + tail2, "en")))
    StreamTopK.run(spark, docs, out, ckpt)

    val sketch = StreamTopK.finalSketch(spark, out)
      .select($"lang", $"tok", $"est", $"n_seen")
      .as[(String, String, Long, Long)].collect()
    val en = sketch.filter(_._1 == "en")
    val fr = sketch.filter(_._1 == "fr")

    // state is O(k): no group carries more than K counters
    assert(en.size <= StreamTopK.K, s"en sketch exceeded K: ${en.size}")
    assert(fr.size <= StreamTopK.K, s"fr sketch exceeded K: ${fr.size}")

    // exact counts over BOTH drains (the cross-drain contract: the
    // second drain's sketch must account for the first drain's items)
    val exact = spark.read.parquet(docs)
      .select($"lang", explode(split($"text", " ")).as("tok"))
      .where(length($"tok") > 0)
      .groupBy($"lang", $"tok").count()
      .as[(String, String, Long)].collect()
      .map { case (l, t, c) => (l, t) -> c }.toMap
    val nEn = exact.collect { case ((l, _), c) if l == "en" => c }.sum
    assert(en.headOption.map(_._4).contains(nEn),
      s"en n_seen should be the full two-drain total $nEn: ${en.headOption}")

    // capture: every token above N/(K+1) must be tracked ("hot" is 60
    //  of ~136 en tokens; "mid" at 16 also clears the threshold)
    val threshold = nEn / (StreamTopK.K + 1)
    val tracked = en.map(_._2).toSet
    exact.foreach { case ((l, t), c) =>
      if (l == "en" && c > threshold)
        assert(tracked.contains(t), s"missed heavy token $t (exact $c > $threshold)")
    }

    // under-estimation + error bound: est <= exact <= est + N/(K+1)
    en.foreach { case (_, t, est, _) =>
      val ex = exact((("en"), t))
      assert(est <= ex, s"$t over-estimated: $est > $ex")
      assert(ex - est <= nEn / (StreamTopK.K + 1) + 1,
        s"$t error ${ex - est} beyond bound")
    }

    // the single-group fr stream is exact (never exceeded K counters)
    assert(fr.map(h => h._2 -> h._3).toMap == Map("solo" -> 50L),
      s"fr sketch should be exact: ${fr.toSeq}")
  }
}
