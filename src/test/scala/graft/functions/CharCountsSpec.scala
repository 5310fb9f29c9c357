package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.operators.TextAnalysis.charCounts

class CharCountsSpec extends AnyFunSuite {

  /** Driver-side reference: code-point counts sorted by code point. */
  private def reference(s: String): Seq[Long] =
    s.codePoints().toArray.groupBy(identity).toSeq.sortBy(_._1)
      .map(_._2.length.toLong)

  test("native CharCounts equals the HOF split/sort/run-length chain on real documents") {
    val hof = {
      // the retired q135 formulation: sorted ascii codes -> run starts ->
      // run lengths via zip_with against the shifted starts
      val sc = "array_sort(transform(split(text, ''), c -> ascii(c)))"
      expr(s"""zip_with(
              |  filter(sequence(1, size($sc)),
              |    i -> i = 1 OR element_at($sc, i) != element_at($sc, i - 1)),
              |  concat(slice(filter(sequence(1, size($sc)),
              |      i -> i = 1 OR element_at($sc, i) != element_at($sc, i - 1)),
              |    2, size(filter(sequence(1, size($sc)),
              |      i -> i = 1 OR element_at($sc, i) != element_at($sc, i - 1))) - 1),
              |    array(size($sc) + 1)),
              |  (a, b) -> CAST(b - a AS BIGINT))""".stripMargin)
    }
    val rows = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), charCounts(col("text")).as("native"), hof.as("hof"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("CharCounts handles unicode (incl. astral code points), empties, and nulls") {
    import spark.implicits._
    val cases = Seq(
      Some("aabac"),           // counts a=3, b=1, c=1 sorted by code point
      Some("你好你"), // CJK: two distinct code points
      Some("😀a😀"), // astral emoji counted once per pair
      Some(""),                 // empty string -> empty histogram
      None)
    val out = cases.toDF("s").select(charCounts(col("s")).as("c")).collect()
    assert(out(0).getSeq[Long](0) == Seq(3L, 1L, 1L))
    assert(out(1).getSeq[Long](0) == Seq(2L, 1L))
    assert(out(2).getSeq[Long](0) == Seq(1L, 2L))
    assert(out(3).getSeq[Long](0) == Seq.empty[Long])
    assert(out(4).isNullAt(0))
    cases.flatten.foreach { s =>
      val got = Seq(Some(s)).toDF("s").select(charCounts(col("s")))
        .collect()(0).getSeq[Long](0)
      assert(got == reference(s), s"'$s'")
    }
  }

  test("char_counts is callable from SQL after extension registration") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT char_counts('abca') AS c").collect()(0).getSeq[Long](0)
    assert(r == Seq(2L, 1L, 1L))
  }
}
