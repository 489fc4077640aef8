package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants over randomly generated event streams: the
  * algebraic laws the pipeline must hold regardless of input shape.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling loop (the scalatest-scalacheck bridge isn't
    * in the offline cache): five seeded draws per property.
    */
  private def forSamples[A](gen: Gen[List[A]])(body: List[A] => Unit): Unit =
    (1 to 5).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    }

  private val eventGen = for {
    user <- Gen.choose(0L, 5L)
    tsSec <- Gen.choose(0L, 6L * 3600) // 6h horizon → multi-session users
    eventId <- Gen.choose(0L, Long.MaxValue)
  } yield (eventId, user, tsSec)

  private val streamGen = Gen.listOfN(120, eventGen)

  test("dedup is idempotent and keyed: |dedup(xs ++ xs)| == |dedup(xs)| == distinct keys") {
    forSamples(streamGen) { events =>
      {
        val df = events.toDF("event_id", "user_id", "ts_sec")
        val doubled = df.unionByName(df)
        val dd = doubled.dropDuplicates("event_id")
        val expected = events.map(_._1).distinct.size.toLong
        assert(dd.count() == expected)
        assert(dd.dropDuplicates("event_id").count() == expected)
      }
    }
  }

  test("sessionization partitions events: session sizes sum to input, durations within gaps") {
    forSamples(streamGen) { events =>
      {
        val distinct = events.distinctBy(_._1)
        val df = distinct.toDF("event_id", "user_id", "ts_sec")
          .withColumn("ts", timestamp_seconds($"ts_sec"))
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sessions = df
          .withColumn("prev", lag($"ts", 1).over(byUser))
          .withColumn("new_s", when($"prev".isNull ||
            unix_timestamp($"ts") - unix_timestamp($"prev") > 1800, 1L).otherwise(0L))
          .withColumn("sidx", sum($"new_s").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id", $"sidx")
          .agg(count(lit(1)).as("n"),
            (unix_timestamp(max($"ts")) - unix_timestamp(min($"ts"))).as("dur"),
            min($"ts").as("start"), max($"ts").as("end"))
          .cache()
        // partition property: every event in exactly one session
        assert(sessions.agg(sum($"n")).head().getLong(0) == distinct.size.toLong)
        // no session outlives its event span; single-event sessions have 0 duration
        assert(sessions.where($"dur" < 0).count() == 0)
        assert(sessions.where($"n" === 1 && $"dur" =!= 0).count() == 0)
        // sessions of one user never overlap: next start > prev end + gap
        val w2 = Window.partitionBy("user_id").orderBy("sidx")
        val overlaps = sessions
          .withColumn("prev_end", lag($"end", 1).over(w2))
          .where($"prev_end".isNotNull &&
            unix_timestamp($"start") - unix_timestamp($"prev_end") <= 1800)
        assert(overlaps.count() == 0)
      }
    }
  }

  test("incremental dim upsert: SKs append-only, dense, unique; nulls never re-insert") {
    val keyGen = Gen.zip(
      Gen.oneOf("p1", "p2", "p3", "p4", null.asInstanceOf[String]),
      Gen.oneOf("u1", "u2", null.asInstanceOf[String]))
    forSamples(Gen.listOfN(60, keyGen)) { pairs =>
      {
        val batches = pairs.grouped(20).toList
        var existing = Seq.empty[(Long, String, String)].toDF("sk", "a", "b")
        var prevRows = Set.empty[(Long, Option[String], Option[String])]
        batches.foreach { batch =>
          val cand = batch.toDF("a", "b")
          val appended = Dims.dimUpsert(cand, existing, Seq("a", "b"), "sk")
          existing = existing.unionByName(appended).localCheckpoint(true)
          val rows = existing.collect().map(r =>
            (r.getLong(0), Option(r.getString(1)), Option(r.getString(2)))).toSet
          // append-only: every previously assigned (sk, key) row survives
          // unchanged — existing keys are never renumbered
          assert(prevRows.subsetOf(rows))
          prevRows = rows
        }
        val rows = prevRows.toSeq
        // one row per distinct natural key (null-SAFE: half-null keys must
        // not re-insert on later batches)
        val distinctKeys = pairs.map { case (a, b) => (Option(a), Option(b)) }.distinct
        assert(rows.map(r => (r._2, r._3)).toSet == distinctKeys.toSet)
        assert(rows.size == distinctKeys.size)
        // SKs dense 1..n and unique
        assert(rows.map(_._1).sorted == (1L to rows.size.toLong))
      }
    }
  }

  test("salted count agrees with plain count on arbitrary key skew") {
    forSamples(Gen.listOfN(300, Gen.choose(0, 3))) { keys =>
      {
        val df = keys.toDF("k")
        val plain = df.groupBy("k").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        val salted = Scale.saltedCount(df, $"k").collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        assert(salted == plain)
      }
    }
  }
}
