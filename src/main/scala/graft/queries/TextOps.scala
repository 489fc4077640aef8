package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Text-analysis / deduplication operators for a training-data pipeline
  * over the `documents` table: exact dedup, near-dup detection (exact
  * n-gram Jaccard and MinHash+LSH), fingerprinting, token counting,
  * quality scoring, language heuristics.
  *
  * Scale design (100 TB): nothing here is all-pairs over the corpus.
  *   - exact dedup: hash-groupBy on a content digest — one shuffle keyed
  *     by digest, map-side partial dedup.
  *   - near-dup: candidate generation is either bounded to small
  *     (lang, source) buckets (q_neardup_jaccard — the "verify" join) or
  *     via MinHash banding (q_minhash_lsh), where the only shuffle keys
  *     on (band, band-hash); pair expansion happens per bucket, never
  *     globally. Skewed/huge buckets are capped (see MaxBucket below) —
  *     a giant bucket means the band is degenerate, not informative.
  */
object TextOps {

  private val Stopwords = Seq("the", "a")

  private def toks(text: Column): Column = array_distinct(split(text, " "))

  /** MinHash parameters: 16 permutations as 8 bands × 2 rows.
    * P(candidate | jaccard=0.9) = 1-(1-0.9²)⁸ ≈ 0.9999998;
    * at j=0.5 ≈ 0.90 (false candidates are cheap — the verify join
    * filters them with exact Jaccard).
    */
  private val NumPerms = 16
  private val BandRows = 2
  private val NumBands = NumPerms / BandRows

  /** Buckets larger than this are dropped from candidate generation: a
    * band-hash shared by thousands of docs generates quadratic pairs while
    * carrying no signal. At 100 TB this cap is what keeps the pair
    * expansion linear-ish; legitimate near-dup clusters are small.
    */
  private val MaxBucket = 1000

  /** doc_id + minhash signature array (one xxhash64 per permutation).
    * Tokenization is staged into its own projection so the 16 signature
    * expressions read the materialized array instead of re-tokenizing
    * the text 16 times.
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sigCols = (0 until NumPerms).map { i =>
      array_min(transform(col("toks"), t => xxhash64(lit(i), t))).as(s"sig_$i")
    }
    docs.select(col("doc_id"), toks(col("text")).as("toks"))
      .select((col("doc_id") +: sigCols): _*)
  }

  /** Candidate near-dup pairs via LSH banding over minhash signatures. */
  def lshCandidates(sigs: DataFrame): DataFrame = lshCandidates(sigs, MaxBucket)

  /** As [[lshCandidates]] with an explicit bucket cap — a test seam
    * (package-private so production callers can't bypass the cap).
    */
  private[queries] def lshCandidates(sigs: DataFrame, maxBucket: Int): DataFrame = {
    val bands = (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until BandRows).map(r => col(s"sig_${b * BandRows + r}")): _*).as("bh"))
    }
    val exploded = sigs
      .select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    // cap degenerate buckets before the quadratic pair expansion
    val counted = exploded
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")))
      .where(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    val a = counted.alias("a")
    val b = counted.alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Token counting + quality/lang heuristics, per language.
    "q_text_stats" -> { (s, dir) =>
      import s.implicits._
      val d = load(s, dir, "documents")
        .withColumn("all_toks", split($"text", " "))
        .withColumn("n_toks", size($"all_toks").cast("long"))
        .withColumn("n_stop",
          size(filter($"all_toks", t => t.isin(Stopwords: _*))).cast("long"))
      d.groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_chars").as("total_chars"),
          sum($"n_toks").as("total_tokens"),
          sum($"n_stop").as("total_stop"))
        .withColumn("avg_tokens", $"total_tokens" * 1.0 / $"n_docs")
        .withColumn("stop_ratio", $"total_stop" * 1.0 / $"total_tokens")
        .orderBy($"lang")
    },

    // Exact dedup: at-least-once corpus (doubled input) → one row per
    // content digest. Hash-groupBy semantics via dropDuplicates on the
    // digest; output is per-source counts over the deduplicated corpus.
    "q_exact_dedup" -> { (s, dir) =>
      import s.implicits._
      val docs = load(s, dir, "documents")
      val doubled = docs.unionByName(docs)
      doubled
        .withColumn("digest", md5($"text"))
        .dropDuplicates("digest")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars_sum"))
        .orderBy($"source")
    },

    // Near-dup pairs by exact unigram-set Jaccard within (lang, source)
    // buckets — the bounded "verify" stage of near-dup detection.
    "q_neardup_jaccard" -> { (s, dir) =>
      import s.implicits._
      val t = load(s, dir, "documents")
        .select($"doc_id", $"lang", $"source", toks($"text").as("toks"))
      val a = t.alias("a"); val b = t.alias("b")
      a.join(b, col("a.lang") === col("b.lang") &&
          col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
        .withColumn("inter", size(array_intersect(col("a.toks"), col("b.toks"))).cast("long"))
        .withColumn("la", size(col("a.toks")).cast("long"))
        .withColumn("lb", size(col("b.toks")).cast("long"))
        .withColumn("jac", $"inter" * 1.0 / ($"la" + $"lb" - $"inter"))
        .where($"jac" >= 0.9)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), $"jac")
        .orderBy($"doc_a", $"doc_b")
    },

    // Content fingerprinting + per-doc token counts.
    "q_fingerprint" -> { (s, dir) =>
      import s.implicits._
      load(s, dir, "documents")
        .select($"doc_id",
          sha2($"text".cast("binary"), 256).as("fp_sha256"),
          md5($"text").as("fp_md5"),
          size(split($"text", " ")).cast("long").as("n_tokens"),
          size(toks($"text")).cast("long").as("n_uniq_tokens"))
        .orderBy($"doc_id")
    },

    // Per-doc quality scoring + n-gram-free language heuristic (the
    // stopword-profile score; a real char-n-gram model would live in a
    // native Expression, same plumbing).
    "q_quality_score" -> { (s, dir) =>
      import s.implicits._
      val d = load(s, dir, "documents")
        .withColumn("all_toks", split($"text", " "))
        .withColumn("n_tokens", size($"all_toks").cast("long"))
        .withColumn("n_uniq", size(array_distinct($"all_toks")).cast("long"))
        .withColumn("n_stop",
          size(filter($"all_toks", t => t.isin(Stopwords: _*))).cast("long"))
      d.select($"doc_id", $"n_tokens", $"n_uniq",
          ($"n_uniq" * 1.0 / $"n_tokens").as("ttr"),
          ($"n_stop" * 1.0 / $"n_tokens").as("stop_ratio"),
          when($"n_tokens" < 30, "too_short")
            .when($"n_uniq" * 4 < $"n_tokens", "low_diversity")
            .otherwise("ok").as("quality"),
          when($"n_stop" * 20 >= $"n_tokens", "en_like")
            .otherwise("other").as("predicted_lang"))
        .orderBy($"doc_id")
    },

    // Generic column profiling — the first pass a training-data pipeline
    // runs on any new corpus: per column, totals, null counts, distinct
    // counts, and lexicographic min/max, stacked as one row per column.
    // One aggregate pass per column over a cached narrow frame.
    "q_profile" -> { (s, dir) =>
      import s.implicits._
      val d = load(s, dir, "documents").cache()
      def profile(c: String) =
        d.agg(
          count(lit(1)).as("n"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c).cast("string")).as("min_s"),
          max(col(c).cast("string")).as("max_s"))
          .withColumn("column_name", lit(c))
      Seq("doc_id", "lang", "source", "n_chars").map(profile).reduce(_ unionByName _)
        .select($"column_name", $"n", $"n_null", $"n_distinct", $"min_s", $"max_s")
        .orderBy($"column_name")
    },

    // MinHash + LSH near-dup detection (banding → bucket join → exact
    // verify). No SQL oracle: xxhash64 signatures aren't expressible in
    // DuckDB; the ScalaTest suite checks recall against the exact
    // Jaccard pairs instead. Driver records a rows-only check.
    "q_minhash_lsh" -> { (s, dir) =>
      import s.implicits._
      val docs = load(s, dir, "documents")
      val cands = lshCandidates(minhashSignatures(docs))
      val t = docs.select($"doc_id", toks($"text").as("toks"))
      cands
        .join(t.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("toks", "toks_a"), "doc_a")
        .join(t.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("toks", "toks_b"), "doc_b")
        .withColumn("inter", size(array_intersect($"toks_a", $"toks_b")).cast("long"))
        .withColumn("jac", $"inter" * 1.0 /
          (size($"toks_a").cast("long") + size($"toks_b").cast("long") - $"inter"))
        .where($"jac" >= 0.9)
        .select($"doc_a", $"doc_b", $"jac")
        .orderBy($"doc_a", $"doc_b")
    },

    // SimHash fingerprint (16-bit): per-bit majority vote over token
    // hashes. Deterministic; no SQL oracle (xxhash64) → rows-only check
    // + ScalaTest invariants (hamming(simhash) small for near-dups).
    "q_simhash" -> { (s, dir) =>
      import s.implicits._
      val bits = (0 until 16).map { b =>
        // +1 when bit b set, -1 otherwise; majority → bit in fingerprint
        val vote = aggregate($"hashes", lit(0L),
          (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        when(vote > 0, lit(1L << b)).otherwise(0L)
      }
      load(s, dir, "documents")
        // stage the hash array so the 16 bit votes don't re-tokenize
        .select($"doc_id", transform(toks($"text"), t => xxhash64(lit(0), t)).as("hashes"))
        .select($"doc_id", bits.reduce(_ + _).as("simhash"))
        .orderBy($"doc_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "q_text_stats" ->
      """WITH d AS (
        |  SELECT lang, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop
        |  FROM documents
        |)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_stop) AS BIGINT) AS total_stop,
        |  SUM(n_toks) * 1.0 / COUNT(*) AS avg_tokens,
        |  SUM(n_stop) * 1.0 / SUM(n_toks) AS stop_ratio
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    "q_exact_dedup" ->
      """WITH dd AS (
        |  SELECT DISTINCT ON (md5(text)) source, n_chars
        |  FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
        |)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars_sum
        |FROM dd GROUP BY source ORDER BY source""".stripMargin,

    "q_neardup_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |    list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  len(list_intersect(a.toks, b.toks)) * 1.0 /
        |    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jac
        |FROM t a JOIN t b
        |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.toks, b.toks)) * 1.0 /
        |    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id, sha256(text) AS fp_sha256, md5(text) AS fp_md5,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_profile" ->
      """WITH p AS (
        |  SELECT 'doc_id' AS column_name, COUNT(*) AS n,
        |    COUNT(CASE WHEN doc_id IS NULL THEN 1 END) AS n_null,
        |    COUNT(DISTINCT doc_id) AS n_distinct,
        |    MIN(CAST(doc_id AS VARCHAR)) AS min_s, MAX(CAST(doc_id AS VARCHAR)) AS max_s
        |  FROM documents
        |  UNION ALL
        |  SELECT 'lang', COUNT(*), COUNT(CASE WHEN lang IS NULL THEN 1 END),
        |    COUNT(DISTINCT lang), MIN(lang), MAX(lang) FROM documents
        |  UNION ALL
        |  SELECT 'source', COUNT(*), COUNT(CASE WHEN source IS NULL THEN 1 END),
        |    COUNT(DISTINCT source), MIN(source), MAX(source) FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', COUNT(*), COUNT(CASE WHEN n_chars IS NULL THEN 1 END),
        |    COUNT(DISTINCT n_chars), MIN(CAST(n_chars AS VARCHAR)),
        |    MAX(CAST(n_chars AS VARCHAR)) FROM documents
        |)
        |SELECT column_name, n, CAST(n_null AS BIGINT) AS n_null, n_distinct,
        |  min_s, max_s
        |FROM p ORDER BY column_name""".stripMargin,

    "q_quality_score" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop
        |  FROM documents
        |)
        |SELECT doc_id, n_tokens, n_uniq,
        |  n_uniq * 1.0 / n_tokens AS ttr,
        |  n_stop * 1.0 / n_tokens AS stop_ratio,
        |  CASE WHEN n_tokens < 30 THEN 'too_short'
        |    WHEN n_uniq * 4 < n_tokens THEN 'low_diversity'
        |    ELSE 'ok' END AS quality,
        |  CASE WHEN n_stop * 20 >= n_tokens THEN 'en_like'
        |    ELSE 'other' END AS predicted_lang
        |FROM d ORDER BY doc_id""".stripMargin
  )
}
