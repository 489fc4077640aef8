package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Data-diagnostics and approximate-join operators: the profiling a
  * pipeline runs BEFORE choosing its physical strategy (key-skew
  * histograms feed the salting/AQE decisions), plus similarity joins in
  * string space (the spelling-variant twin of the MinHash document
  * path) and cross-source corpus comparison.
  *
  * Scale design (100 TB): the skew profile is two bounded aggregates
  * (key-keyed with partial aggs, then a ≤64-bucket histogram); the
  * fuzzy join generates deletion-neighborhood keys per word TYPE (vocab
  * cardinality, never corpus) and joins on those keys — the same
  * bucket-the-candidates shape as MinHash banding, never all-pairs; the
  * vocabulary overlap joins distinct (source, token) rows on token, so
  * per-token work is bounded by sources², independent of corpus size.
  */
object Diagnostics {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Key-skew profile — the diagnostic that DRIVES the engine's skew
    // strategy (salting, AQE skew-join thresholds): per-key row counts
    // bucketed by binary magnitude (bucket = bitlen(count), an exact
    // integer on both engines — no libm), reported as keys/rows per
    // bucket. A healthy key space concentrates in low buckets; a hot
    // key shows up as a lone high bucket carrying a large row share.
    // The synthetic corpus is deliberately uniform, so a hot cohort is
    // engineered (every 97th key's rows replicated 15×) — the profile
    // must separate it into its own high buckets.
    "q_skew_profile" -> { (s, dir) =>
      import s.implicits._
      val ev = load(s, dir, "events").select($"user_id")
      val hot = ev.where($"user_id" % 97 === 0)
        .select($"user_id", explode(sequence(lit(1), lit(15))).as("i"))
        .drop("i")
      ev.unionByName(hot)
        .groupBy($"user_id").agg(count(lit(1)).as("c"))
        .withColumn("bucket", length(bin($"c")).cast("long"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_keys"), sum($"c").as("n_rows"))
        .orderBy($"bucket")
    },

    // Bloom-filter join pre-filter — the probe-instead-of-scan primitive
    // the micro-batch sidecar ([[graft.runner.BloomSidecar]], native
    // [[graft.functions.BloomMightContain]]) applies to every tick's
    // anti-join, surfaced as a registry gate. Build a bloom over the
    // "existing" key set (even order keys), probe EVERY key through the
    // codegen'd expression, and pin the two properties that make the
    // pattern safe at 100 TB: fn_ok — no existing key is ever missed
    // (bloom false negatives are impossible; a miss would corrupt the
    // dedup-append), and fpp_ok — false positives (extra exact-verify
    // work, never wrong results) stay under 5× the configured 1% rate.
    // Scale: the build is one treeAggregate into a fixed ~1 MB sketch,
    // the probe is a narrow whole-stage-codegen map; the exact
    // membership here is a modulo predicate so the DuckDB twin computes
    // the same rows without needing the sketch (the q_approx_dau
    // contract pattern). Spark's bloom hashing is fixed-seed, so the
    // booleans are reproducible run over run.
    "q_bloom_prefilter" -> { (s, dir) =>
      import s.implicits._
      val keys = load(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("okey"),
          $"o_orderkey".cast("string").as("key"),
          ($"o_orderkey" % 2 === 0).as("truly_present"))
      val existing = keys.where($"truly_present")
      val nExist = existing.count() // bounded driver scalar: sizes the sketch
      val bf = existing.stat.bloomFilter("key", math.max(nExist, 1L), 0.01)
      val probed = keys.withColumn("hit",
        graft.functions.BloomMightContain($"key", bf))
      val agg = probed.agg(
        sum(when($"hit" && !$"truly_present", 1L).otherwise(0L)).as("fp"),
        sum(when(!$"truly_present", 1L).otherwise(0L)).as("absent")).head()
      val fppOk = agg.getLong(0) <= agg.getLong(1) / 20 + 10
      probed.select($"okey", $"truly_present",
        (!$"truly_present" || $"hit").as("fn_ok"),
        lit(fppOk).as("fpp_ok"))
        .orderBy($"okey")
    },

    // Fuzzy string self-join (edit distance ≤ 1) via DELETION
    // neighborhoods — the scalable approximate string join (spelling
    // variants, near-identical entity names): every word type emits
    // itself plus each single-char-deletion as join keys; two words
    // within edit distance 1 MUST share a key (substitution → same
    // deletion position; insertion/deletion → the longer word's
    // deletion equals the shorter word), so the key equi-join finds
    // every true pair and levenshtein verifies the candidates. Work is
    // vocab-cardinality × word length — never all-pairs (the same
    // candidate-bucket shape as MinHash banding; over-hot keys would be
    // capped the same way at real vocabulary scale). Non-vacuity is
    // engineered: every word gets a planted "x"-suffixed variant at
    // distance exactly 1.
    "q_fuzzy_join" -> { (s, dir) =>
      import s.implicits._
      val base = load(s, dir, "documents")
        .select(explode(split($"text", " ")).as("token"))
        .where($"token".rlike("^[a-z0-9]{2,}$"))
        .distinct()
      val vocab = base.unionByName(base.select(concat($"token", lit("x")).as("token")))
        .distinct()
      val keys = vocab.select($"token", explode(array_distinct(expr(
        "concat(array(token), transform(sequence(1, length(token)), " +
          "i -> concat(left(token, i - 1), substring(token, i + 1, 1000000))))"
        ))).as("k"))
      keys.select($"token".as("t1"), $"k")
        .join(keys.select($"token".as("t2"), $"k"), Seq("k"))
        .where($"t1" < $"t2")
        .dropDuplicates("t1", "t2")
        .where(levenshtein($"t1", $"t2") <= 1)
        .select($"t1", $"t2")
        .orderBy($"t1", $"t2")
    },

    // Cross-source vocabulary overlap — the corpus-similarity matrix a
    // data recipe consults before mixing sources: distinct (source,
    // token) rows self-joined on token (per-token work ≤ sources², the
    // hot-token bound), shared-type counts per source pair plus exact
    // Jaccard from the per-source type counts — all-integer inputs, one
    // double division.
    "q_vocab_overlap" -> { (s, dir) =>
      import s.implicits._
      val st = load(s, dir, "documents")
        .select($"source", explode(split($"text", " ")).as("token"))
        .where(length($"token") > 0)
        .distinct()
      val pairs = st.as("a")
        .join(st.as("b"), col("a.token") === col("b.token"))
        .where(col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("shared"))
      val sizes = st.groupBy($"source").agg(count(lit(1)).as("n"))
      pairs
        .join(sizes.select($"source".as("src_a"), $"n".as("n_a")), Seq("src_a"))
        .join(sizes.select($"source".as("src_b"), $"n".as("n_b")), Seq("src_b"))
        .withColumn("jaccard",
          $"shared".cast("double") / ($"n_a" + $"n_b" - $"shared"))
        .select($"src_a", $"src_b", $"shared", $"n_a", $"n_b", $"jaccard")
        .orderBy($"src_a", $"src_b")
    }
  )

  val oracles: Map[String, String] = Map(
    "q_skew_profile" ->
      """WITH ev AS (
        |  SELECT user_id FROM events
        |  UNION ALL
        |  SELECT user_id FROM (
        |    SELECT user_id, unnest(generate_series(1, 15)) AS i
        |    FROM events WHERE user_id % 97 = 0)
        |), c AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM ev GROUP BY 1
        |)
        |SELECT CAST(length(bin(c)) AS BIGINT) AS bucket,
        |  COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows
        |FROM c GROUP BY 1 ORDER BY bucket""".stripMargin,

    // The oracle computes exact membership (the modulo predicate) and
    // asserts the two bloom contracts as literal TRUE — the Spark side
    // must deliver booleans that ARE true (no false negative anywhere,
    // false positives under bound) for the hash to match.
    "q_bloom_prefilter" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS okey,
        |  (o_orderkey % 2 = 0) AS truly_present,
        |  TRUE AS fn_ok, TRUE AS fpp_ok
        |FROM orders ORDER BY okey""".stripMargin,

    // The oracle verifies the PAIR SET with all-pairs levenshtein over
    // the (bounded) vocabulary — deletion-neighborhood candidate
    // generation is provably complete at distance 1, so the sets must
    // be identical; the Spark side is the scalable path.
    "q_fuzzy_join" ->
      """WITH base AS (
        |  SELECT DISTINCT token
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE regexp_matches(token, '^[a-z0-9]{2,}$')
        |), vocab AS (
        |  SELECT DISTINCT token
        |  FROM (SELECT token FROM base UNION ALL SELECT token || 'x' FROM base)
        |)
        |SELECT a.token AS t1, b.token AS t2
        |FROM vocab a JOIN vocab b ON a.token < b.token
        |WHERE levenshtein(a.token, b.token) <= 1
        |ORDER BY t1, t2""".stripMargin,

    "q_vocab_overlap" ->
      """WITH st AS (
        |  SELECT DISTINCT source, token
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  WHERE len(token) > 0
        |), pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(COUNT(*) AS BIGINT) AS shared
        |  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
        |  GROUP BY 1, 2
        |), sizes AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY 1
        |)
        |SELECT p.src_a, p.src_b, p.shared, sa.n AS n_a, sb.n AS n_b,
        |  CAST(p.shared AS DOUBLE) / (sa.n + sb.n - p.shared) AS jaccard
        |FROM pairs p
        |JOIN sizes sa ON p.src_a = sa.source
        |JOIN sizes sb ON p.src_b = sb.source
        |ORDER BY src_a, src_b""".stripMargin
  )
}
