package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native CharNGrams expression: set-parity with the composed
  * array_distinct/transform/substr chain it replaced in q_lang_id,
  * codegen placement, and edge semantics.
  */
class CharNGramsSpec extends SparkSpec {
  import spark.implicits._

  private def composed(text: org.apache.spark.sql.Column, n: Int) =
    array_distinct(transform(
      sequence(lit(1), length(text) - (n - 1)),
      i => text.substr(i, lit(n))))

  test("matches the composed HOF chain on the real documents table") {
    val bad = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .where(length($"text") >= 3)
      .select(
        array_sort(CharNGrams($"text", 3)).as("native"),
        array_sort(composed($"text", 3)).as("hof"))
      .where($"native" =!= $"hof")
      .count()
    assert(bad == 0, s"$bad docs diverged from the composed-HOF trigrams")
  }

  test("first-occurrence order, matching array_distinct") {
    val r = Seq("abcabcd").toDF("text")
      .select(CharNGrams($"text", 3).as("g")).head().getSeq[String](0)
    assert(r == Seq("abc", "bca", "cab", "bcd"))
  }

  test("runs inside whole-stage codegen") {
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(CharNGrams($"text", 3).as("g"))
    assert("""\*\(\d+\) Project \[charngrams""".r
      .findFirstIn(df.queryExecution.executedPlan.toString).isDefined)
  }

  test("null and short-text edge semantics") {
    val rows = Seq((1, null.asInstanceOf[String]), (2, "ab"), (3, "abc"))
      .toDF("id", "text")
      .select($"id", CharNGrams($"text", 3).as("g"))
      .orderBy($"id").collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getSeq[String](1).isEmpty)
    assert(rows(2).getSeq[String](1) == Seq("abc"))
  }
}
