package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.runner.Bulk

/** Catalog DDL (S7/S8), saveAsTable sinks (S5/S6), mtime file listing
  * (S9), and the EP2 bulk rebuild.
  */
class CatalogBulkSpec extends SparkSpec {
  import spark.implicits._

  test("database DDL + partitioned table DDL + append/overwrite + refresh") {
    spark.sql("DROP DATABASE IF EXISTS graft_test_db CASCADE")
    Catalog.ensureDatabase(spark, "graft_test_db")
    Catalog.ensureSilverTable(spark, "graft_test_db.silver_ddl")
    // dim overwrite sink
    val dim = Seq((1L, "u1"), (2L, "u2")).toDF("user_sk", "user_id")
    Catalog.overwriteTable(dim, "graft_test_db.dim_t")
    assert(spark.table("graft_test_db.dim_t").count() == 2)
    Catalog.overwriteTable(dim.where($"user_sk" === 1L), "graft_test_db.dim_t")
    assert(spark.table("graft_test_db.dim_t").count() == 1)
    Catalog.refresh(spark, "graft_test_db.dim_t")
    assert(spark.catalog.tableExists("graft_test_db.silver_ddl"))
  }

  test("mtime-window file listing picks only files modified in the interval") {
    val dir = tmpDir("mtime")
    Files.write(Paths.get(s"$dir/old.jsonl"), "x".getBytes)
    Files.write(Paths.get(s"$dir/new.jsonl"), "y".getBytes)
    Files.setLastModifiedTime(Paths.get(s"$dir/old.jsonl"),
      java.nio.file.attribute.FileTime.fromMillis(1000000L))
    val now = System.currentTimeMillis()
    val listed = StagingToBronze.listFilesModifiedIn(spark, dir, now - 3600000L, now + 3600000L)
    assert(listed.size == 1 && listed.head.endsWith("new.jsonl"))
    assert(StagingToBronze.listFilesModifiedIn(spark, s"$dir/missing", 0, now).isEmpty)
  }

  test("bulk rebuild: full medallion pass over adapter-generated raw lines") {
    val wh = tmpDir("bulkwh")
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val raw = RefEventsAdapter.toRawJson(events)
    val (b, s, f) = Bulk.run(spark, raw.unionByName(raw), wh, "2024-01-01")
    assert(b == 2000L) // doubled raw preserved in bronze (raw layer keeps dups)
    assert(s == 1000L) // silver deduped
    assert(f == 1000L) // fact 1:1 with silver
    // dims exist and have unique SKs
    val du = Warehouse.read(spark, s"$wh/dim_user")
    assert(du.count() == du.select("user_sk").distinct().count())
    // fact joins resolved: every event_name is in dim_event (non-zero SK)
    val fact = Warehouse.read(spark, s"$wh/fact_user_events")
    assert(fact.where($"event_dim_key" === 0).count() == 0)
    assert(fact.where($"user_dim_key" === 0).count() == 0)
    // clustered bulk writes bound the small-file spray: at most
    // filesPerPartition (2) parquet files per date partition, instead of
    // one per (shuffle task × date)
    def parquetFiles(dir: java.io.File): Seq[java.io.File] =
      Option(dir.listFiles()).toSeq.flatten.flatMap { f =>
        if (f.isDirectory) parquetFiles(f)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      }
    val silverDates = Warehouse.read(spark, s"$wh/user_events_silver")
      .select("year", "month", "day").distinct().count()
    val nSilverFiles = parquetFiles(new java.io.File(s"$wh/user_events_silver")).size
    assert(nSilverFiles <= silverDates * 2,
      s"$nSilverFiles silver files for $silverDates date partitions")
    // dim_recipe was built by READING the master parquet: one dim row per
    // master row, attributes carried through the rename
    val master = spark.read.parquet(s"$wh/recipe_master.parquet")
    val dr = Warehouse.read(spark, s"$wh/dim_recipe")
    assert(dr.count() == master.count() && dr.count() > 0)
    val joined = dr.join(master, dr("recipe_id") === master("id").cast("string"))
    assert(joined.count() == dr.count())
    assert(joined.where(dr("recipe_name") =!= master("name") ||
      dr("dish_type") =!= master("dish_type") ||
      dr("cooking_time") =!= master("cooking_time")).count() == 0)
  }

  test("co-bucketed join and aggregation plan with zero shuffle exchanges") {
    spark.sql("DROP DATABASE IF EXISTS graft_bucket_db CASCADE")
    Catalog.ensureDatabase(spark, "graft_bucket_db")
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", $"event_type", $"value")
    val users = events.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"))
    Bucketed.writeBucketed(events, "graft_bucket_db.ev_b", "user_id", 8)
    Bucketed.writeBucketed(users, "graft_bucket_db.us_b", "user_id", 8)

    // force the join shape under test: no broadcast fallback
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.bucketJoin(spark, "graft_bucket_db.ev_b",
        "graft_bucket_db.us_b", "user_id")
      val jPlan = joined.queryExecution.executedPlan.toString
      assert(jPlan.contains("SortMergeJoin"),
        "co-bucketed join not planned as SMJ:\n" + jPlan)
      assert(!jPlan.contains("Exchange"),
        "co-bucketed join still shuffles:\n" + jPlan)
      // same rows as the un-bucketed shuffle join
      val plain = events.join(users, Seq("user_id"))
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)

      // groupBy on the bucket key: one HashAggregate, no exchange
      val agg = spark.table("graft_bucket_db.ev_b")
        .groupBy($"user_id").agg(count(lit(1)).as("n"))
      val aPlan = agg.queryExecution.executedPlan.toString
      assert(!aPlan.contains("Exchange"),
        "bucketed groupBy still shuffles:\n" + aPlan)
      assert(agg.exceptAll(users.withColumnRenamed("n_events", "n")).isEmpty)

      // write-side file layout: bucket files bounded by the bucket count
      // (the pre-repartition keeps one writer task per bucket)
      val loc = spark.sql("DESCRIBE EXTENDED graft_bucket_db.ev_b")
        .where($"col_name" === "Location").select("data_type").head.getString(0)
      val files = Option(new java.io.File(new java.net.URI(loc)).listFiles())
        .toSeq.flatten.filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty && files.size <= 8,
        s"${files.size} files for 8 buckets")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("dimRecipeFromMaster reproduces the reference master rename + shape") {
    val master = Seq(
      (7L, "bibimbap", "rice", "veg", "raw", "daily", "easy", 20),
      (3L, "kimchi_stew", "stew", "meat", "boil", "party", "hard", 60))
      .toDF("id", "name", "dish_type", "ingredient_type", "method_type",
        "situation_type", "difficulty", "cooking_time")
    val dim = Dims.dimRecipeFromMaster(master)
    assert(dim.columns.toSeq == Seq("recipe_sk", "recipe_id", "recipe_name",
      "dish_type", "ingredient_type", "method_type", "situation_type",
      "difficulty", "cooking_time"))
    val rows = dim.orderBy("recipe_sk").collect()
    // deterministic SKs: row_number over recipe_id (string order)
    assert(rows.map(_.getString(1)).toSeq == Seq("3", "7"))
    assert(rows(0).getString(2) == "kimchi_stew" && rows(1).getString(2) == "bibimbap")
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }
}
