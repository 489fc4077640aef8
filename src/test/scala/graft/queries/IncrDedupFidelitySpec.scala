package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the incremental-dedup banding-fidelity contract at sf0.1 — the
  * one scale where the synthetic 30-word vocabulary degenerates the
  * 2-row band signatures into over-cap mega-buckets (r6 status: 78/130
  * flags missed at 16 perms, documented in prose only). With the
  * adaptive escalation to 128 perms the output must equal the exact
  * oracle — computed here as a fenced, test-only all-pairs Jaccard join
  * (the quadratic baseline the production banding exists to avoid).
  */
class IncrDedupFidelitySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.1"

  private def toks(c: Column): Column =
    array_sort(transform(array_distinct(split(c, " ")), x => xxhash64(x)))

  test("incr-dedup escalates banding on the degenerate sf0.1 vocab and matches the exact oracle") {
    // same incoming/corpus split as q_incr_dedup
    val docs = graft.Tables.load(spark, sf, "documents")
    val newSrc = Seq("src0", "src1", "src2", "src3", "src4")
    val corpus = docs.where(!$"source".isin(newSrc: _*))
    val incoming = docs.where($"source".isin(newSrc: _*))
      .select($"doc_id", $"text")
      .unionByName(corpus.where($"doc_id" % 50 === 0)
        .select(($"doc_id" + 100000L).as("doc_id"), $"text"))

    // the escalation trigger is REAL at this sf: the 16-perm banding over
    // both sides' set reps produces at least one over-cap bucket
    val gIn = incoming.select($"doc_id", toks($"text").as("toks"))
      .groupBy($"toks").agg(min($"doc_id").as("doc_id"))
    val gEx = corpus.select($"doc_id", toks($"text").as("toks"))
      .groupBy($"toks").agg(min($"doc_id").as("doc_id"))
    val buckets = TextOps.bandBuckets(TextOps.minhashSignaturesFromHashedToks(gIn, 16), 16)
      .unionByName(TextOps.bandBuckets(TextOps.minhashSignaturesFromHashedToks(gEx, 16), 16))
      .groupBy($"band", $"bh").agg(count(lit(1)).as("n"))
    assert(buckets.where($"n" > 1000).count() > 0,
      "sf0.1 no longer degenerates the 16-perm banding — escalation untested here")

    // exact oracle: digest membership + all-pairs set Jaccard >= 0.9
    // against the distinct corpus token sets (test-only; quadratic)
    val exactOracle = incoming.withColumn("digest", md5($"text"))
      .join(corpus.select(md5($"text").as("digest")).distinct(), Seq("digest"), "left_semi")
      .select($"doc_id").as[Long].collect().toSet
    val nearOracle = incoming.select($"doc_id", toks($"text").as("ti"))
      .crossJoin(corpus.select(toks($"text").as("te")).distinct())
      .withColumn("inter", size(array_intersect($"ti", $"te")).cast("long"))
      .where($"inter" * 1.0 /
        (size($"ti").cast("long") + size($"te").cast("long") - $"inter") >= 0.9)
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(exactOracle.nonEmpty && nearOracle.nonEmpty)

    val got = SparkEntryAccess.run(spark, "q_incr_dedup", sf)
      .select($"doc_id", $"exact_dup", $"near_dup", $"keep")
      .as[(Long, Boolean, Boolean, Boolean)].collect()
    assert(got.nonEmpty)
    val misses = got.filter { case (id, e, n, k) =>
      e != exactOracle(id) || n != nearOracle(id) || k != !(e || n)
    }
    assert(misses.isEmpty,
      s"${misses.length}/${got.length} flags diverge from the exact oracle: " +
        misses.take(5).mkString(", "))
  }
}
