package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-tier evidence bench (VERDICT r9 #3): the brief's bar is "plans
  * you'd want at 100× scale" — this proves the next decade of that claim
  * with a measurement instead of an argument. It replicates the sf0.1
  * documents/embeddings tables 10× to an sf1-class corpus (distinct ids,
  * per-replica text/vector perturbation so rows are not byte-identical;
  * ~50k docs / 20k vectors) and times the heavy text/vector queries at
  * BOTH tiers, reporting the time ratio per query. Near-linear scaling
  * (ratio ≲ 10 at 10× data) is the pass condition: these plans' shuffles
  * key on grams/bands/cells with map-side partial aggregation, so time
  * should track data volume, not its square.
  *
  * Run manually (`sbt "runMain graft.BenchScale"`), writes
  * BENCH_scale.json in-repo. Not part of the driver's per-round Bench —
  * the sf1 build + double-tier timing costs ~10 min.
  */
object BenchScale {

  /** The queries the r9 verdict named as the top-heavy set, plus the
    * round-10 sampled substring-dup twin. q_semdedup is represented by
    * its PRODUCTION path (cell-keyed prune): the registry query also
    * carries a fenced all-pairs exact baseline as its oracle anchor,
    * which is quadratic by definition and allowlisted as such — timing
    * it at a scale tier measures the fence, not the design (it was the
    * round-10 60×-at-10× "offender" until named here; the production
    * path's fixed cell count was the real bug and is now adaptive).
    */
  private val Heavy = Seq("q_substring_dup", "q_substring_dup_sampled",
    "q_substring_strip_sampled",
    "q_incr_dedup", "q_dup_clusters", "q_semdedup_production", "q_ann_ivfpq",
    // the dedup family the r10 tier skipped (VERDICT r10 #4). NOTE on
    // reading q_minhash_lsh's ratio: it EMITS verified near-dup pairs,
    // and replicating every doc 10× multiplies true pairs ~100× (each
    // dup group's replicas inter-match) — its honest pass condition is
    // time ratio ≲ output-row ratio, which is why every row below also
    // carries out_base/out_x10.
    "q_minhash_lsh", "q_norm_dedup", "q_winnow_fp",
    // round-11 corpus-quality additions: the CCNet bigram-chain
    // bucketing (token/bigram-keyed shuffles) and DSIR (whose
    // probability tables stay 256-bucket broadcasts at every tier —
    // its ratio should track the pure scan/agg cost).
    "q_ppl_buckets", "q_dsir_weights")

  /** Temporal/relational heavies over the replicated events tier — the
    * shapes whose scale story is windows and range-bucketed joins
    * rather than banding: gap sessionization, bucketed range join,
    * as-of attribution, two-phase prefix sums.
    */
  private val HeavyEvents = Seq("q_sessionize", "q_range_join",
    "q_asof_join", "q_peak_concurrency_scaled",
    // round-11: 10 integer-PageRank iterations over the replicated
    // session graph — each iteration a src-keyed join + dst-keyed agg,
    // so the tier ratio measures the iterative-join scale story.
    "q_pagerank")

  private def queryFn(name: String): (SparkSession, String) => DataFrame =
    if (name == "q_semdedup_production") graft.queries.VectorOps.semDedupProduction
    else SparkEntry.queries(name)

  private val Rep = 10

  /** 10× documents: fresh doc_ids (base + r·nBase keeps every id far
    * under the 2M planted-variant offset) and a per-replica suffix token
    * so replicas are near- but not byte-identical — the realistic web
    * regime (copies with boilerplate deltas), and the one that keeps the
    * dedup operators' work honest.
    */
  private def replicateDocs(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val base = Tables.load(spark, srcDir, "documents")
    val nBase = base.count()
    base.withColumn("r", explode(sequence(lit(0), lit(Rep - 1))))
      .withColumn("doc_id", col("r") * nBase + col("doc_id"))
      .withColumn("text", concat(col("text"), lit(" rep"), col("r")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("r")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  /** 10× events for the GOLD-DASHBOARD tier (VERDICT r14 #4): fresh
    * event_ids but the ORIGINAL timestamps — the gold warehouse's time
    * spine (Jan–Feb 2024, GoldE2E.gold) must keep covering every row,
    * so the dashboard's star join drops nothing and the ×10 ratio
    * honestly measures 10× fact rows through the same plan. (The
    * 40-day-strided replica set below exists for the range/as-of
    * temporal joins, whose pair counts would otherwise grow ×rep²;
    * the star-join + rollup shape has no such fan-out — duplicate
    * timestamps are exactly what 10× more traffic on the same days
    * looks like.)
    */
  private def replicateEventsSameDates(spark: SparkSession, srcDir: String,
                                       outDir: String): Unit = {
    val base = Tables.load(spark, srcDir, "events")
    val nBase = base.count()
    base.withColumn("r", explode(sequence(lit(0), lit(Rep - 1))))
      .withColumn("event_id", col("r") * nBase + col("event_id"))
      .drop("r")
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
  }

  /** 10× events: fresh event_ids and each replica shifted r × 40 DAYS
    * later — byte-identical timestamps would inflate the range/as-of
    * join fan-out ×rep² (10 clicks × 10 purchases per original pair), a
    * data property masquerading as a plan regression. The 40-day stride
    * exceeds the fixture's ~30-day span, so replicas occupy DISJOINT
    * time ranges: every temporal relationship is preserved within a
    * replica and pair counts scale linearly (a 1-day shift would still
    * overlap replicas and reintroduce the quadratic fan-out).
    */
  private def replicateEvents(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val base = Tables.load(spark, srcDir, "events")
    val nBase = base.count()
    base.withColumn("r", explode(sequence(lit(0), lit(Rep - 1))))
      .withColumn("event_id", col("r") * nBase + col("event_id"))
      .withColumn("ts", col("ts") + (col("r") * expr("INTERVAL 40 DAYS")))
      .drop("r")
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
  }

  /** 10× embeddings: replica-major ids + the integer-derived per-dim
    * perturbation (same scheme as q_ann_ivfpq_scale's fixture).
    */
  private def replicateEmb(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val base = Tables.load(spark, srcDir, "embeddings")
    val nBase = base.count()
    base.select(col("vec_id").cast("long").as("base_id"),
        col("embedding"), col("label"))
      .withColumn("r", explode(sequence(lit(0), lit(Rep - 1))))
      .withColumn("vec_id", col("r") * nBase + col("base_id"))
      .withColumn("embedding", expr(
        """transform(embedding, (x, d) ->
             CAST(x + (pmod(vec_id * 31 + (d + 1) * 7, 1009) - 504) / 60000.0 AS FLOAT))"""))
      .select(col("vec_id"), col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  /** Steady-state stream-stream interval-join drain (the Bench
    * `stream_join` single's twin, parameterized by tier dir): one
    * seeded AvailableNow drain untimed, then the timed second drain
    * over the tier's full click/purchase set. Batch 2 shifts 1000 days
    * — past the 10× tier's 400-day replica span AND the persisted
    * watermark, for both tiers. Returns (sec, joined rows appended).
    */
  private def streamJoinTier(spark: SparkSession, dir: String): (Double, Long) = {
    val base = java.nio.file.Files.createTempDirectory("graft_scale_sj").toString
    val eventsDir = s"$base/events"
    val ev = Tables.load(spark, dir, "events")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id").cast("long").as("event_id"),
        col("ts").cast("timestamp").as("ts"),
        col("user_id").cast("long").as("user_id"),
        col("event_type"), col("value").cast("double").as("value"))
    ev.write.mode("append").parquet(eventsDir)
    graft.streaming.StreamJoin.run(spark, eventsDir, s"$base/out", s"$base/ckpt")
    val before = spark.read.parquet(s"$base/out").count()
    ev.withColumn("ts", col("ts") + expr("INTERVAL 1000 DAYS"))
      .withColumn("event_id", col("event_id") + lit(8000000000L))
      .write.mode("append").parquet(eventsDir)
    val t0 = System.nanoTime()
    graft.streaming.StreamJoin.run(spark, eventsDir, s"$base/out", s"$base/ckpt")
    val t = (System.nanoTime() - t0) / 1e9
    val appended = spark.read.parquet(s"$base/out").count() - before
    require(appended > 0, "scale stream_join drained nothing")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    (t, appended)
  }

  /** Streaming gold-stage drain (the Bench `streaming_gold` single's
    * twin): tick size scales with `rep` (16 = the Bench single's tick;
    * 160 = the 10× tick), bronze/silver pre-drained untimed so the
    * timed number isolates the gold stage — dim upserts + fact
    * anti-join append + maintained rollup. Returns (sec, facts
    * appended by the timed drain).
    */
  private def streamingGoldTier(spark: SparkSession, dir: String,
                                rep: Int): (Double, Long) = {
    val staging = java.nio.file.Files.createTempDirectory("graft_scale_sg").toString
    val wh = java.nio.file.Files.createTempDirectory("graft_scale_sgwh").toString
    val events0 = Tables.load(spark, dir, "events")
    val day0 = events0.select(min(to_date(col("ts")))).head().getDate(0)
    val day = events0.where(to_date(col("ts")) === lit(day0))
      .crossJoin(spark.range(rep).select(col("id").as("rep")))
      .withColumn("event_id", col("event_id") * rep + col("rep"))
    def stage(df: DataFrame, sub: String): Unit =
      graft.pipeline.RefEventsAdapter.toRawJson(df).write.text(s"$staging/$sub")
    def drainIngest(): Unit = {
      graft.streaming.StreamingIngest.runBronze(spark, s"$staging/*/part-*",
        s"$wh/bronze", s"$wh/ckpt_b", "2025-09-15")
      graft.streaming.StreamingIngest.runSilver(spark, s"$wh/bronze",
        s"$wh/silver", s"$wh/ckpt_s")
    }
    def drainGold(): Unit =
      graft.streaming.StreamingIngest.runGold(spark, s"$wh/silver", wh,
        s"$wh/ckpt_g", maintainRollup = true)
    stage(day.where(col("rep") < rep / 2).drop("rep"), "b1")
    drainIngest(); drainGold()
    val factBefore = spark.read.parquet(s"$wh/fact_user_events").count()
    stage(day.where(col("rep") >= rep / 2).drop("rep")
      .withColumn("ts", col("ts") + expr("INTERVAL 1 DAY")), "b2")
    drainIngest()
    val t0 = System.nanoTime()
    drainGold()
    val t = (System.nanoTime() - t0) / 1e9
    val appended = spark.read.parquet(s"$wh/fact_user_events").count() - factBefore
    require(appended > 0, "scale streaming_gold drained nothing")
    Seq(staging, wh).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    (t, appended)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Local-iteration section filter: SPARK_GRAFT_SCALE_ONLY=ann (or a
    // comma list of: queries,stream,ann,bpe) runs just those sections
    // and SKIPS writing BENCH_scale.json — the committed artifact must
    // always come from a full run.
    val onlySections: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_SCALE_ONLY").map(_.split(",").toSet)
    def sectionOn(s: String): Boolean = onlySections.forall(_.contains(s))

    val sf1 = java.nio.file.Files.createTempDirectory("graft_sf1").toString
    val buildT0 = System.nanoTime()
    if (sectionOn("queries") || sectionOn("stream")) {
      replicateDocs(spark, sfDir, sf1)
      replicateEmb(spark, sfDir, sf1)
      replicateEvents(spark, sfDir, sf1)
    }
    val buildSec = (System.nanoTime() - buildT0) / 1e9

    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def releaseAll(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
    }
    def timeQuery(name: String, dir: String): (Double, Long) = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        exec(queryFn(name)(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      // untimed output cardinality — the denominator for judging
      // pair-emitting ops, whose work scales with OUTPUT pairs
      val rows = queryFn(name)(spark, dir).count()
      releaseAll()
      (runs.min, rows)
    }

    // JIT warmup outside the timings
    SparkEntry.queries("q1_agg")(spark, sfDir).count()

    // Query-name filter for local iteration on one offender
    // (SPARK_GRAFT_SCALE_QUERIES=q_range_join). Like the section filter,
    // a filtered run never writes the artifact.
    val onlyQueries: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_SCALE_QUERIES").map(_.split(",").toSet)
    val rows = (if (sectionOn("queries")) Heavy ++ HeavyEvents
                else Seq.empty[String])
      .filter(q => onlyQueries.forall(_.contains(q))).map { q =>
      val (tBase, nBase) = timeQuery(q, sfDir)
      val (t10x, n10x) = timeQuery(q, sf1)
      val ratio = t10x / tBase
      System.err.println(f"[scale] $q%-24s sf0.1=$tBase%7.2fs sf1=$t10x%7.2fs " +
        f"ratio=$ratio%5.2f out=$nBase%d->$n10x%d")
      (q, tBase, t10x, ratio, nBase, n10x)
    }

    // Gold-dashboard tier (VERDICT r14 #4): DAU.sql's star-join +
    // 4-level COUNT(DISTINCT) rollup — the reference's flagship query
    // shape — over a bulk-built warehouse at 1× and 10× fact rows.
    // GoldE2E memoizes the warehouse per (session, dir), so of the two
    // timed runs the first pays build + dashboard and the second
    // dashboard-only; the reported MIN therefore isolates the DASHBOARD
    // ratio (the build's own scale story is already measured as
    // medallion_e2e vs medallion_e2e_1m in the per-round Bench).
    val goldRows = (if (sectionOn("queries") &&
        onlyQueries.forall(_.contains("q_gold_dau"))) {
      val sfG = java.nio.file.Files.createTempDirectory("graft_sfg").toString
      replicateEventsSameDates(spark, sfDir, sfG)
      val (tb, nb) = timeQuery("q_gold_dau", sfDir)
      val (tx, nx) = timeQuery("q_gold_dau", sfG)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sfG))
      Seq(("q_gold_dau", tb, tx, tx / tb, nb, nx))
    } else Seq.empty)
    goldRows.foreach { case (q, a, b, r, na, nb2) =>
      System.err.println(f"[scale] $q%-24s sf0.1=$a%7.2fs sf1=$b%7.2fs " +
        f"ratio=$r%5.2f out=$na%d->$nb2%d")
    }

    // Streaming ticks at both tiers (VERDICT r10 #4): stream_join over
    // the replicated events table (10× batch through the watermarked
    // interval join), streaming_gold at a 10× tick size (160 vs the
    // Bench single's 16 day-replicas). Drain cost should track batch
    // volume — state is watermark-bounded either way.
    val streamRows = (if (!sectionOn("stream")) Seq.empty else Seq(
      {
        val (tb, nb) = streamJoinTier(spark, sfDir); releaseAll()
        val (tx, nx) = streamJoinTier(spark, sf1); releaseAll()
        ("stream_join", tb, tx, tx / tb, nb, nx)
      },
      {
        val (tb, nb) = streamingGoldTier(spark, sfDir, rep = 16); releaseAll()
        val (tx, nx) = streamingGoldTier(spark, sfDir, rep = 160); releaseAll()
        ("streaming_gold", tb, tx, tx / tb, nb, nx)
      }))
    streamRows.foreach { case (q, a, b, r, na, nb2) =>
      System.err.println(f"[scale] $q%-24s sf0.1=$a%7.2fs sf1=$b%7.2fs " +
        f"ratio=$r%5.2f out=$na%d->$nb2%d")
    }

    // ANN tiers with build/query split (VERDICT r10 #5): the gate-shaped
    // 100k tier and the 1M tier — cells grow ~√n-style with the corpus
    // (256 → 1024) so the scanned-fraction bound TIGHTENS at scale
    // (2·nprobe/cells: 6.25% → 1.56%). Contracts (recall + bounded
    // scan) are REQUIRED in-run: a fast broken index measures nothing.
    // The 10M tier (VERDICT r12 #7). The √n ladder would want 4096
    // cells, but the replica fixture has exactly nBase (≈2000) distinct
    // cluster locations — replicas are sub-quantization jitters of a
    // base vector — so cells beyond ~2000 train empty/duplicate
    // centroids, concentrating 8 probes on ~2000 real cells and
    // breaking the scan bound. 2048 is the fixture's natural ceiling:
    // the scanned-fraction bound still tightens 1.56% → 0.78%, coarse
    // assignment is n × cells (20× the 1M tier's MACs — the classic
    // IVF trade for the tighter bound), training stays sample-bounded,
    // encode/explode stay linear in n.
    val annTiers = (if (!sectionOn("ann")) Seq.empty
      else Seq(("ann_tier_100k", 50, 256), ("ann_tier_1m", 500, 1024),
        ("ann_tier_10m", 5000, 2048)))
      .map { case (name, rep, cells) =>
        val st = graft.queries.VectorOps
          .annIvfPqScaleTier(spark, sfDir, rep, cells, nprobe = 8)
        require(st.recallFailures == 0,
          s"$name: ${st.recallFailures} queries below the recall floor")
        require(st.scanFailures == 0,
          s"$name: ${st.scanFailures} queries exceed the scanned-fraction bound")
        releaseAll()
        System.err.println(
          f"[scale] $name%-24s n=${st.n} build=${st.buildSec}%7.2fs " +
            f"query=${st.querySec}%7.2fs recall@k=${st.recallAtK}%.3f " +
            f"scanned=${st.scannedFrac}%.4f agree=${st.assignAgreement}%.3f split=" +
            st.split.map { case (s, v) => f"$s=$v%.1f" }.mkString(","))
        (name, st.n, cells, st.buildSec, st.querySec, st.split,
          st.recallAtK, st.scannedFrac, st.assignAgreement)
      }

    // BPE production-vocab tier (VERDICT r10 #3 stretch): the same
    // incremental induction the gate runs, with the round budget raised
    // 4× so the learned-merge count approaches production tokenizer
    // vocab sizes. The claim under test is that per-merge cost does NOT
    // grow with merge index — the incremental pair maintenance touches
    // only rows containing a committed merge's pattern, and late merges
    // are rare — so s/merge at the production tier should be ≤ the gate
    // tier's, not 4× it. Corpus prep (the chunk-frequency table) is
    // untimed: it is a fixed one-pass cost shared by any tokenizer
    // trainer, and the gate's bpe_per_merge singles already include it.
    val bpeTiers = (if (!sectionOn("bpe")) Seq.empty
      else Seq(
        ("bpe_tier_gate", graft.queries.TextOps.BpeRounds),
        ("bpe_tier_prod", graft.queries.TextOps.BpeRounds * 4))).map {
      case (name, rounds) =>
        val words = graft.queries.TextOps.bpeWords(spark, sfDir)
          .localCheckpoint(true)
        val t0 = System.nanoTime()
        val (merges, _) = graft.queries.TextOps.bpeInduce(
          spark, words, rounds = rounds)
        val sec = (System.nanoTime() - t0) / 1e9
        releaseAll()
        System.err.println(f"[scale] $name%-24s rounds=$rounds " +
          f"merges=${merges.size}%d sec=$sec%7.2f " +
          f"perMerge=${sec / merges.size}%.4f")
        (name, rounds, merges.size, sec, sec / merges.size)
    }

    // ------------------------------------------------------------------
    // Per-entry composition across the round's full runs (the Bench
    // precedent, VERDICT r10 #2): each tier time keeps its MINIMUM over
    // the runs merged so far — contention and accumulated-JVM-state
    // debris only ever slow a run, so the min is the honest cost — and
    // the ratio is recomputed from the per-tier minima. Tier counts and
    // contracts are deterministic, so they never need merging. Disabled
    // via SPARK_GRAFT_NO_MERGE=1 after a code change that legitimately
    // slows an operator (stale faster numbers would lie).
    // ------------------------------------------------------------------
    var mergedRows = rows ++ goldRows ++ streamRows
    var mergedAnn = annTiers
    var mergedBpe = bpeTiers
    var mergeCount = 1
    // Same code-version guard as Bench (ADVICE r11): per-entry minima
    // may only compose across runs of IDENTICAL sources.
    val srcFp = SrcFingerprint.current()
    val artifactPath = java.nio.file.Paths.get("BENCH_scale.json")
    if (onlySections.isEmpty && !sys.env.contains("SPARK_GRAFT_NO_MERGE") &&
        java.nio.file.Files.exists(artifactPath)) try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val old = om.readTree(java.nio.file.Files.readAllBytes(artifactPath))
      val oldFp = old.path("src_fingerprint").asText("")
      if (oldFp != srcFp) System.err.println(
        s"[scale] NOT merging: src fingerprint changed/absent - this run replaces the artifact")
      else if (old.path("base_sf").asText() == sfDir) {
        mergeCount = old.path("merge_count").asInt(1) + 1
        val oq = old.path("queries")
        mergedRows = mergedRows.map { case (q, a, b, r, na, nb) =>
          if (oq.has(q)) {
            val a2 = math.min(a, oq.get(q).path("base_sec").asDouble(a))
            val b2 = math.min(b, oq.get(q).path("x10_sec").asDouble(b))
            (q, a2, b2, b2 / a2, na, nb)
          } else (q, a, b, r, na, nb)
        }
        val oa = old.path("ann_tiers")
        mergedAnn = mergedAnn.map {
          case (name, n, cells, b, q, split, rk, scf, agr) =>
          if (oa.has(name) && oa.get(name).path("cells").asInt() == cells) {
            val ob2 = oa.get(name).path("build_sec").asDouble(b)
            // the split rides with whichever run supplied the winning
            // build time (an old min without a recorded split keeps ours)
            val split2 =
              if (ob2 < b && oa.get(name).has("build_split")) {
                import scala.jdk.CollectionConverters._
                val bs = oa.get(name).path("build_split")
                bs.fieldNames().asScala.map(f => f -> bs.get(f).asDouble()).toSeq
              } else split
            // recall/scanned/agreement are deterministic under a fixed
            // fingerprint — this run's measurements stand as-is
            (name, n, cells, math.min(b, ob2),
              math.min(q, oa.get(name).path("query_sec").asDouble(q)), split2,
              rk, scf, agr)
          } else (name, n, cells, b, q, split, rk, scf, agr)
        }
        val ob = old.path("bpe_tiers")
        mergedBpe = mergedBpe.map { case (name, rounds, m, sec, pm) =>
          if (ob.has(name) && ob.get(name).path("rounds").asInt() == rounds &&
              ob.get(name).path("merges").asInt() == m) {
            val s2 = math.min(sec, ob.get(name).path("sec").asDouble(sec))
            (name, rounds, m, s2, s2 / m)
          } else (name, rounds, m, sec, pm)
        }
        System.err.println(
          s"[scale] merged per-entry with existing BENCH_scale.json (run $mergeCount)")
      } else System.err.println(
        s"[scale] NOT merging: base_sf mismatch (${old.path("base_sf").asText()} vs $sfDir)")
    } catch {
      case e: Exception =>
        System.err.println(s"[scale] merge skipped: ${e.getMessage}")
    }

    val json = "{" +
      s""""rep":$Rep,"base_sf":"$sfDir","build_sec":$buildSec,"cpus":$cpus,""" +
      s""""merge_count":$mergeCount,"src_fingerprint":"$srcFp",""" +
      "\"queries\":{" + mergedRows.map { case (q, a, b, r, na, nb) =>
        s""""$q":{"base_sec":$a,"x10_sec":$b,"ratio":$r,""" +
          s""""out_base":$na,"out_x10":$nb}"""
      }.mkString(",") + "}," +
      "\"ann_tiers\":{" + mergedAnn.map {
        case (name, n, cells, b, q, split, rk, scf, agr) =>
        s""""$name":{"n":$n,"cells":$cells,"nprobe":8,""" +
          s""""build_sec":$b,"query_sec":$q,"build_split":{""" +
          split.map { case (s, v) => s""""$s":$v""" }.mkString(",") +
          s"""},"recall_at_k":${f"$rk%.4f"},"scanned_frac":${f"$scf%.5f"},""" +
          s""""assign_agreement":${f"$agr%.4f"},"contracts":"pass"}"""
      }.mkString(",") + "}," +
      // Cross-tier per-stage growth (VERDICT r14 #3): for each adjacent
      // tier pair, the build-stage time ratios next to the corpus-size
      // ratio — the field that makes a super-linear stage (r14's
      // residual_explode at 23× for 10× rows) a tracked number instead
      // of an archaeology exercise. Stages ≥5 s at the bigger tier must
      // not grow faster than ~n × cells-growth (assignment work is
      // n·cells-shaped by design and the ladder raises cells with √n;
      // 3× slack absorbs IO/JIT texture) — n² growth (ratio ≈ 100 for
      // 10× rows) always trips it. Sub-5 s stages are noise-dominated
      // and only reported.
      "\"ann_stage_ratios\":{" + mergedAnn.sliding(2).collect {
        case Seq((smName, smCount, smCells, _, _, smSplit, _, _, _),
                 (bgName, bgCount, bgCells, _, _, bgSplit, _, _, _)) =>
          val smM = smSplit.toMap
          val nRatio = bgCount.toDouble / smCount
          val cellsRatio = bgCells.toDouble / smCells
          val stages = bgSplit.collect {
            case (st, bv) if smM.getOrElse(st, 0.0) > 0 =>
              val r = bv / smM(st)
              require(bv < 5.0 || r <= 3.0 * nRatio * cellsRatio,
                f"stage $st grows super-linearly $bgName/$smName: " +
                  f"$r%.1fx for $nRatio%.1fx rows (${smM(st)}%.2fs -> $bv%.2fs)")
              (st, r)
          }
          s""""${bgName}_over_$smName":{"n_ratio":${f"$nRatio%.2f"},""" +
            stages.map { case (st, r) => s""""$st":${f"$r%.2f"}""" }
              .mkString("\"stages\":{", ",", "}") + "}"
      }.mkString(",") + "}," +
      "\"bpe_tiers\":{" + mergedBpe.map { case (name, rounds, m, sec, pm) =>
        s""""$name":{"rounds":$rounds,"merges":$m,"sec":$sec,""" +
          s""""sec_per_merge":$pm}"""
      }.mkString(",") + "}}"
    println(json)
    if (onlySections.isEmpty && onlyQueries.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_scale.json"),
        (json + "\n").getBytes("UTF-8"))
    else System.err.println(
      "[scale] partial run (SPARK_GRAFT_SCALE_ONLY/_QUERIES) - artifact NOT written")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sf1))
    spark.stop()
  }
}
