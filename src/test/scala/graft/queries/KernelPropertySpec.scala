package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants for the round-8 kernels — the algebraic
  * claims the oracle gates rely on, pinned against randomly generated
  * inputs (deterministic seeded draws, same bridge-free loop as
  * PropertySpec).
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[A](gen: Gen[List[A]])(body: List[A] => Unit): Unit =
    (1 to 5).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    }

  // ---- BPE bracket-replace == leftmost-non-overlapping merge --------

  /** Reference merge: scan left to right, fuse the first (a, b)
    * adjacency, continue AFTER the fused token — the Sennrich rule.
    */
  private def refMerge(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  // multi-char symbols on purpose: the symbol "ab" must NOT be confused
  // with the adjacency (a, b) — exactly what the bracket framing claims
  private val bpeAlphabet = Vector("a", "b", "c", "ab", "ba")
  private val bpeSeqGen: Gen[List[List[String]]] = Gen.listOfN(30,
    Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(bpeAlphabet))))

  test("BPE: engine replace over bracket-framed strings == reference leftmost merge") {
    for (a <- bpeAlphabet; b <- bpeAlphabet) {
      forSamples(bpeSeqGen) { seqs =>
        val framed = seqs.zipWithIndex
          .map { case (s, i) => (i, s.map(x => s"[$x]").mkString) }
        val got = framed.toDF("id", "seq")
          .withColumn("seq", replace($"seq", lit(s"[$a][$b]"), lit(s"[$a$b]")))
          .as[(Int, String)].collect().sortBy(_._1)
          .map { case (i, s) =>
            (i, s.stripPrefix("[").stripSuffix("]").split("\\]\\[").toList)
          }
        got.foreach { case (i, merged) =>
          assert(merged == refMerge(seqs(i), a, b),
            s"pair ($a,$b) on ${seqs(i)}: engine $merged")
        }
      }
    }
  }

  // ---- batched BPE: selected merges commute -------------------------

  // candidate windows over a tiny symbol alphabet WITH concatenation
  // traps ("a","b" alongside "ab") — the case where operand-only
  // disjointness would wrongly batch (a,b) with (ab,x)
  private val candGen: Gen[List[(String, String, Long)]] = Gen.listOfN(24, for {
    a <- Gen.oneOf("a", "b", "c", "d", "ab", "cd")
    b <- Gen.oneOf("a", "b", "c", "d", "ab", "cd")
    c <- Gen.choose(1L, 50L)
  } yield (a, b, c))

  test("batched-BPE selection: any application order yields identical strings") {
    val wordGen: Gen[List[List[String]]] = Gen.listOfN(20,
      Gen.choose(1, 10).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "ab", "cd"))))
    forSamples(candGen) { cands0 =>
      // dedup + deterministic rank order, as the engine's window provides
      val cands = cands0.distinct.sortBy { case (a, b, c) => (-c, a, b) }
      val sel = TextOps.bpeSelectBatch(cands, batch = 8)
      assert(sel.nonEmpty)
      forSamples(wordGen) { words =>
        def apply(order: Seq[(String, String, Long)]) = words.map { w =>
          order.foldLeft(w.map(x => s"[$x]").mkString) { case (s, (a, b, _)) =>
            s.replace(s"[$a][$b]", s"[$a$b]") }
        }
        // the whole point of the conflict rule: the batch commutes
        assert(apply(sel) == apply(sel.reverse),
          s"selected batch $sel is order-dependent")
      }
    }
  }

  // ---- z-order: per-dimension monotonicity --------------------------

  private val dimGen: Gen[List[(Long, Long, Long)]] = Gen.listOfN(40, for {
    a <- Gen.choose(0L, 1023L); b <- Gen.choose(0L, 1023L)
    c <- Gen.choose(0L, 1023L)
  } yield (a, b, c))

  test("zvalueN is monotonic in each dimension with the others held fixed") {
    forSamples(dimGen) { pts =>
      // each point paired with a strict bump in one dimension
      val rows = pts.zipWithIndex.flatMap { case ((a, b, c), i) =>
        val bump = (i % 3) match {
          case 0 => (math.min(a + 1 + i % 7, 1023L), b, c)
          case 1 => (a, math.min(b + 1 + i % 7, 1023L), c)
          case _ => (a, b, math.min(c + 1 + i % 7, 1023L))
        }
        Seq((i, 0, a, b, c), (i, 1, bump._1, bump._2, bump._3))
      }
      val z = rows.toDF("pid", "side", "a", "b", "c")
        .withColumn("z", graft.pipeline.Scale.zvalueN(
          Seq((col("a"), 0L, 1023L), (col("b"), 0L, 1023L), (col("c"), 0L, 1023L)),
          bits = 10))
        .select($"pid", $"side", $"a", $"b", $"c", $"z")
        .as[(Int, Int, Long, Long, Long, Long)].collect()
        .groupBy(_._1)
      z.values.foreach { g =>
        val Array(base, bumped) = g.sortBy(_._2)
        val changed = base._3 != bumped._3 || base._4 != bumped._4 || base._5 != bumped._5
        if (changed)
          assert(bumped._6 > base._6,
            s"bump ${(base._3, base._4, base._5)} -> " +
              s"${(bumped._3, bumped._4, bumped._5)}: z ${base._6} !< ${bumped._6}")
      }
    }
  }

  // ---- deletion-neighborhood completeness at edit distance 1 --------

  private def lev(s: String, t: String): Int = {
    val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to s.length; j <- 1 to t.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    d(s.length)(t.length)
  }

  private def delKeys(w: String): Set[String] =
    (w +: (0 until w.length).map(i => w.take(i) + w.drop(i + 1))).toSet

  private val editGen: Gen[List[(String, Int, Int, Char)]] = Gen.listOfN(60, for {
    n <- Gen.choose(2, 8)
    w <- Gen.listOfN(n, Gen.oneOf('x', 'y', 'z')).map(_.mkString)
    op <- Gen.choose(0, 2); pos <- Gen.choose(0, n - 1)
    ch <- Gen.oneOf('x', 'y', 'z')
  } yield (w, op, pos, ch))

  test("any two words at edit distance 1 share a deletion-neighborhood key") {
    forSamples(editGen) { cases =>
      cases.foreach { case (w, op, pos, ch) =>
        val edited = op match {
          case 0 => w.take(pos) + w.drop(pos + 1)            // delete
          case 1 => w.take(pos) + ch + w.drop(pos)           // insert
          case _ => w.take(pos) + ch + w.drop(pos + 1)       // substitute
        }
        val d = lev(w, edited)
        assert(d <= 1, s"$w -> $edited: unexpected distance $d")
        if (d == 1)
          assert(delKeys(w).intersect(delKeys(edited)).nonEmpty,
            s"$w / $edited at distance 1 share no deletion key")
      }
    }
  }
}
