package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Similarity search over the `embeddings` table (64-dim float vectors,
  * unit-normalized by the generator).
  *
  * Scale design (100 TB): brute-force top-k is the *per-query* baseline —
  * a broadcast of the (small) query set against a scan of the corpus, one
  * shuffle for the per-query top-k. That is linear in corpus size and the
  * right plan when the query set is small. The scale path is
  * [[q_ann_lsh]]: random-hyperplane LSH buckets both sides, so candidate
  * scoring touches only same-bucket vectors (the shuffle keys on bucket
  * id); recall is tested against the brute-force oracle in ScalaTest.
  * All arithmetic is double-precision with a sequential left-fold, which
  * DuckDB's list functions reproduce exactly.
  */
object VectorOps {

  /** Sequential-left-fold dot product of two double arrays (codegen'd
    * higher-order functions; deterministic summation order).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Cosine similarity (vectors need not be normalized). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Deterministic pseudo-random hyperplanes: weight(p, d) derived from a
    * splitmix64-style integer mix of (p, d) — reproducible across runs
    * and engines, no RNG state.
    */
  // 4 planes → 16 buckets: sized for the testdata corpus (500–2000
  // vectors → ~30–125 candidates/bucket). At 100 TB you'd raise this so
  // the expected bucket population stays in the 10³–10⁴ range (each
  // +1 plane halves it) — the plan shape is unchanged.
  private val NumPlanes = 4
  private val Dim = 64
  private def planeWeight(p: Int, d: Int): Double = {
    var z = (p.toLong * 0x9E3779B97F4A7C15L) + (d.toLong * 0xBF58476D1CE4E5B9L) + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    // map to [-1, 1)
    (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }

  /** Sign-bit bucket id of a vector under the fixed hyperplanes. */
  def lshBucket(vec: Column): Column = {
    val bits = (0 until NumPlanes).map { p =>
      val plane = array((0 until Dim).map(d => lit(planeWeight(p, d))): _*)
      when(dot(vec, plane) >= 0.0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force cosine top-5 for a small query set: broadcast queries ×
    // corpus scan, per-query top-k via window. Output ids only — rank
    // order is float-robust (neighbor gaps >> ulp), values are not.
    "q_ann_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = load(s, dir, "embeddings")
        .select($"vec_id", asDouble($"embedding").as("v"))
      val queriesDf = emb.where($"vec_id" < 3)
        .select($"vec_id".as("query_id"), $"v".as("qv"))
      val scored = emb.join(broadcast(queriesDf), $"vec_id" =!= $"query_id")
        .withColumn("cos", dot($"qv", $"v"))
      val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .where($"rank" <= 5)
        .select($"query_id", $"rank", $"vec_id".as("neighbor_id"))
        .orderBy($"query_id", $"rank")
    },

    // LSH-bucketed ANN with multi-probe: corpus vectors are hashed to
    // sign-bit buckets once; each query probes its own bucket plus every
    // Hamming-1 neighbor (flip one plane's bit). Scoring touches only
    // probed buckets — candidate set ≈ (1+planes)/2^planes of the corpus,
    // the scale path vs. a full scan. No SQL oracle (bucket ids come from
    // the integer-mix planes); ScalaTest checks recall vs brute force.
    // Driver records a rows-only check.
    "q_ann_lsh" -> { (s, dir) =>
      import s.implicits._
      val emb = load(s, dir, "embeddings")
        .select($"vec_id", asDouble($"embedding").as("v"))
        .withColumn("bucket", lshBucket($"v"))
      val probes = (0 until NumPlanes).map(p => $"bucket".bitwiseXOR(1L << p))
      val queriesDf = emb.where($"vec_id" < 3)
        .select($"vec_id".as("query_id"), $"v".as("qv"),
          explode(array(($"bucket" +: probes): _*)).as("bucket"))
      val scored = emb.join(broadcast(queriesDf),
          Seq("bucket")).where($"vec_id" =!= $"query_id")
        // a neighbor can surface via several probes — dedup before ranking
        .dropDuplicates("query_id", "vec_id")
        .withColumn("cos", dot($"qv", $"v"))
      val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .where($"rank" <= 5)
        .select($"query_id", $"rank", $"vec_id".as("neighbor_id"))
        .orderBy($"query_id", $"rank")
    },

    // IVF-style ANN: deterministic coarse quantizer (first-k vectors as
    // centroids, two Lloyd refinement passes — all DataFrame ops, no
    // driver-side data loops beyond collecting k centroids), corpus
    // assigned to nearest centroid, each query probes the `nprobe`
    // closest cells. The scale path when hyperplane LSH recall is poor:
    // cells adapt to the data distribution. No SQL oracle (centroids are
    // iterative); ScalaTest checks recall vs brute force + cell sanity.
    "q_ann_ivf" -> { (s, dir) =>
      import s.implicits._
      val k = 8
      val nprobe = 3
      val emb = load(s, dir, "embeddings")
        .select($"vec_id", asDouble($"embedding").as("v")).cache()

      // seed centroids: first k vectors by id (deterministic)
      var centroids = emb.orderBy($"vec_id").limit(k)
        .select($"vec_id".cast("int").as("cell"), $"v".as("cv"))
      // two Lloyd passes: assign → recompute means element-wise
      for (_ <- 0 until 2) {
        val assigned = emb.crossJoin(broadcast(centroids))
          .withColumn("d", graft.functions.CosineSimilarity($"v", $"cv"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("vec_id").orderBy(desc("d"), asc("cell"))))
          .where($"rn" === 1)
        centroids = assigned
          .select($"cell", posexplode($"v").as(Seq("pos", "x")))
          .groupBy($"cell", $"pos").agg(avg($"x").as("mx"))
          .groupBy($"cell")
          .agg(array_sort(collect_list(struct($"pos", $"mx"))).as("pairs"))
          .select($"cell", transform($"pairs", p => p.getField("mx")).as("cv"))
      }
      val cents = broadcast(centroids)

      val corpus = emb.crossJoin(cents)
        .withColumn("d", graft.functions.CosineSimilarity($"v", $"cv"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(desc("d"), asc("cell"))))
        .where($"rn" === 1)
        .select($"vec_id", $"v", $"cell")

      val queryProbes = emb.where($"vec_id" < 3).crossJoin(cents)
        .withColumn("d", graft.functions.CosineSimilarity($"v", $"cv"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(desc("d"), asc("cell"))))
        .where($"rn" <= nprobe)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"cell")

      val scored = corpus.join(broadcast(queryProbes), Seq("cell"))
        .where($"vec_id" =!= $"query_id")
        .dropDuplicates("query_id", "vec_id")
        .withColumn("cos", graft.functions.CosineSimilarity($"qv", $"v"))
      val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .where($"rank" <= 5)
        .select($"query_id", $"rank", $"vec_id".as("neighbor_id"))
        .orderBy($"query_id", $"rank")
    },

    // Embedding-cosine near-dup: exact all-pairs baseline scored by the
    // native codegen'd CosineSimilarity expression (graft.functions) —
    // the oracle-checkable twin of the LSH-bucketed scale path above.
    // Output is ids only; membership at the threshold is float-robust
    // because both engines compute the identical sequential fold.
    "q_embed_neardup" -> { (s, dir) =>
      import s.implicits._
      val emb = load(s, dir, "embeddings")
        .select($"vec_id", asDouble($"embedding").as("v"))
      val a = emb.select($"vec_id".as("id_a"), $"v".as("va"))
      val b = emb.select($"vec_id".as("id_b"), $"v".as("vb"))
      a.join(b, $"id_a" < $"id_b")
        .where(graft.functions.CosineSimilarity($"va", $"vb") >= 0.3)
        .select($"id_a", $"id_b")
        .orderBy($"id_a", $"id_b")
    },

    // Per-label embedding stats: element means via per-row decimal snap
    // (order-free exact sums), plus vector norms — the "is my embedding
    // column sane" profiling pass.
    "q_embed_stats" -> { (s, dir) =>
      import s.implicits._
      val emb = load(s, dir, "embeddings")
        .withColumn("v", asDouble($"embedding"))
        .withColumn("e0", element_at($"v", 1).cast("decimal(18,9)"))
        .withColumn("e1", element_at($"v", 2).cast("decimal(18,9)"))
        .withColumn("norm_snap", sqrt(dot($"v", $"v")).cast("decimal(18,9)"))
      emb.groupBy($"label".cast("long").as("label"))
        .agg(
          count(lit(1)).as("n"),
          sum($"e0").cast("double").as("sum_e0"),
          sum($"e1").cast("double").as("sum_e1"),
          sum($"norm_snap").cast("double").as("sum_norm"))
        .orderBy($"label")
    }
  )

  val oracles: Map[String, String] = Map(
    "q_ann_topk" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), q AS (
        |  SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 3
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_inner_product(q.qv, e.v) AS cos
        |  FROM emb e JOIN q ON e.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q_embed_neardup" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    "q_embed_stats" ->
      """WITH emb AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    CAST(CAST(embedding AS DOUBLE[])[1] AS DECIMAL(18,9)) AS e0,
        |    CAST(CAST(embedding AS DOUBLE[])[2] AS DECIMAL(18,9)) AS e1,
        |    CAST(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
        |      CAST(embedding AS DOUBLE[]))) AS DECIMAL(18,9)) AS norm_snap
        |  FROM embeddings
        |)
        |SELECT label, COUNT(*) AS n,
        |  CAST(SUM(e0) AS DOUBLE) AS sum_e0,
        |  CAST(SUM(e1) AS DOUBLE) AS sum_e1,
        |  CAST(SUM(norm_snap) AS DOUBLE) AS sum_norm
        |FROM emb GROUP BY label ORDER BY label""".stripMargin
  )
}
