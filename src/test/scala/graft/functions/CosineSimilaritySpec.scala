package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native CosineSimilarity expression: parity with the HOF
  * composition, codegen path, SQL registration, and edge semantics.
  */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("matches the zip_with/aggregate composition bit-for-bit on real vectors") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val a = emb.limit(50).select($"vec_id".as("ia"), $"v".as("va"))
    val b = emb.limit(50).select($"vec_id".as("ib"), $"v".as("vb"))
    val pairs = a.join(b, $"ia" < $"ib")
    val hof = graft.queries.VectorOps.cosine($"va", $"vb")
    val diff = pairs.select(
      (CosineSimilarity($"va", $"vb") - hof).as("d")).agg(max(abs($"d"))).head().getDouble(0)
    assert(diff == 0.0, s"native vs HOF diverged by $diff")
  }

  test("runs inside whole-stage codegen") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(transform($"embedding", x => x.cast("double")).as("v"))
    val df = emb.select(CosineSimilarity($"v", $"v").as("c"))
    // a `*(n)` stage prefix on the projecting operator = inside
    // whole-stage codegen
    assert("""\*\(\d+\) Project \[cosinesimilarity""".r
      .findFirstIn(df.queryExecution.executedPlan.toString).isDefined)
    assert(df.where($"c" < 0.999999).count() == 0) // self-cosine = 1
  }

  test("SQL registration via extensions hook") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.6d, 0.8d)) AS c").head().getDouble(0)
    assert(math.abs(r - 0.6) < 1e-15)
  }

  test("null and edge semantics") {
    val rows = spark.sql(
      """SELECT
        |  cosine_sim(array(1.0d), array(1.0d, 2.0d)) AS len_mismatch,
        |  cosine_sim(array(0.0d, 0.0d), array(1.0d, 1.0d)) AS zero_norm,
        |  cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS null_side,
        |  cosine_sim(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 1.0d)) AS null_elem
        |""".stripMargin).head()
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
    assert(math.abs(rows.getDouble(3) - 1.0 / math.sqrt(2)) < 1e-15)
  }
}
