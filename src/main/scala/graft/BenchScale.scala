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
    "q_incr_dedup", "q_dup_clusters", "q_semdedup_production", "q_ann_ivfpq")

  /** Temporal/relational heavies over the replicated events tier — the
    * shapes whose scale story is windows and range-bucketed joins
    * rather than banding: gap sessionization, bucketed range join,
    * as-of attribution, two-phase prefix sums.
    */
  private val HeavyEvents = Seq("q_sessionize", "q_range_join",
    "q_asof_join", "q_peak_concurrency_scaled")

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
             CAST(x + (pmod(vec_id * 31 + (d + 1) * 7, 101) - 50) / 6000.0 AS FLOAT))"""))
      .select(col("vec_id"), col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
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

    val sf1 = java.nio.file.Files.createTempDirectory("graft_sf1").toString
    val buildT0 = System.nanoTime()
    replicateDocs(spark, sfDir, sf1)
    replicateEmb(spark, sfDir, sf1)
    replicateEvents(spark, sfDir, sf1)
    val buildSec = (System.nanoTime() - buildT0) / 1e9

    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def releaseAll(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
    }
    def timeQuery(name: String, dir: String): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        exec(queryFn(name)(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      releaseAll()
      runs.min
    }

    // JIT warmup outside the timings
    SparkEntry.queries("q1_agg")(spark, sfDir).count()

    val rows = (Heavy ++ HeavyEvents).map { q =>
      val tBase = timeQuery(q, sfDir)
      val t10x = timeQuery(q, sf1)
      val ratio = t10x / tBase
      System.err.println(f"[scale] $q%-24s sf0.1=$tBase%7.2fs sf1=$t10x%7.2fs ratio=$ratio%5.2f")
      (q, tBase, t10x, ratio)
    }

    val json = "{" +
      s""""rep":$Rep,"base_sf":"$sfDir","build_sec":$buildSec,"cpus":$cpus,""" +
      "\"queries\":{" + rows.map { case (q, a, b, r) =>
        s""""$q":{"base_sec":$a,"x10_sec":$b,"ratio":$r}"""
      }.mkString(",") + "}}"
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_scale.json"),
      (json + "\n").getBytes("UTF-8"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sf1))
    spark.stop()
  }
}
