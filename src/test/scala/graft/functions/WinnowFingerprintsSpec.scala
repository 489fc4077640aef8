package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native WinnowFingerprints expression: bit-parity with the
  * composed md5/transform/slice/array_min chain it replaced in
  * q_winnow_fp, codegen placement, and edge semantics.
  */
class WinnowFingerprintsSpec extends SparkSpec {
  import spark.implicits._

  private val k = 8
  private val w = 16

  /** The pre-fusion q_winnow_fp selection, kept here as the parity
    * oracle: md5-hex each char k-gram, lexicographic min per w-window,
    * distinct.
    */
  private def composed(text: org.apache.spark.sql.Column) = {
    val grams = transform(
      sequence(lit(1), length(text) - (k - 1)),
      i => md5(text.substr(i, lit(k))))
    array_distinct(transform(
      sequence(lit(1), size(grams) - (w - 1)),
      j => array_min(slice(grams, j, lit(w)))))
  }

  test("matches the composed HOF chain as a SET on the real documents table") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .where(length($"text") >= k + w - 1)
    // compare as sorted arrays: the native expression emits first-window
    // occurrence order, the composed form first-position order — the
    // SET is the contract (q_winnow_fp aggregates over explode)
    val bad = docs.select(
        array_sort(WinnowFingerprints($"text", k, w)).as("native"),
        array_sort(composed($"text")).as("hof"))
      .where($"native" =!= $"hof")
      .count()
    assert(bad == 0, s"$bad docs diverged from the composed-HOF selection")
  }

  test("runs inside whole-stage codegen") {
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(WinnowFingerprints($"text", k, w).as("fp"))
    assert("""\*\(\d+\) Project \[winnowfingerprints""".r
      .findFirstIn(df.queryExecution.executedPlan.toString).isDefined)
  }

  test("guarantee: a shared substring of length >= k+w-1 shares a fingerprint") {
    val shared = "the quick brown fox jumps over!" // 31 chars >= 23
    val df = Seq(
      s"AAAA $shared BBBBBBBBBBBB",
      s"CCCCCCCCCCCCCCCC $shared DD").toDF("text")
      .select(WinnowFingerprints($"text", k, w).as("fp"))
    val Array(a, b) = df.collect().map(_.getSeq[String](0).toSet)
    assert((a & b).nonEmpty, "winnowing guarantee violated")
  }

  test("null and short-text edge semantics") {
    val rows = Seq(
      (1, null.asInstanceOf[String]),
      (2, "short"),                   // < k: zero grams
      (3, "a" * (k + w - 2)),         // one gram short of a full window
      (4, "b" * (k + w - 1))          // exactly one window
    ).toDF("id", "text")
      .select($"id", WinnowFingerprints($"text", k, w).as("fp"))
      .orderBy($"id").collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getSeq[String](1).isEmpty)
    assert(rows(2).getSeq[String](1).isEmpty)
    assert(rows(3).getSeq[String](1).size == 1)
  }
}
