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

  test("wrong-arity SQL calls fail with an analysis error naming the signature") {
    graft.GraftExtensions.register(spark)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT char_counts()").collect()
    }
    assert(e1.getMessage.contains("char_counts"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(array(1.0))").collect()
    }
    assert(e2.getMessage.contains("vec_dot"), e2.getMessage)
  }

  test("empty-document convention: native path yields n_ch=0, n_distinct=0, entropy=0") {
    // The documented divergence (CharCounts scaladoc): the HOF chain /
    // DuckDB's string_split(text, '') tokenize '' as one empty token
    // (n_ch = 1, n_distinct_ch = 1), while the native histogram is empty
    // (n_ch = 0). The q135/q140 oracles rest on corpora having no empty
    // documents; this pins what the NATIVE side does if one ever appears,
    // end-to-end through q135's aggregate shapes.
    import spark.implicits._
    val out = Seq((1L, ""), (2L, "ab"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), charCounts(col("text")).as("__cnt"))
      .select(col("doc_id"),
        expr("aggregate(__cnt, CAST(0 AS BIGINT), (a, c) -> a + c)").as("n_ch"),
        size(col("__cnt")).cast("long").as("n_distinct_ch"))
      .orderBy(col("doc_id")).collect()
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 0L, out(0).toString)
    assert(out(1).getLong(1) == 2L && out(1).getLong(2) == 2L, out(1).toString)
  }

  test("registered corpora have no empty documents (the q135/q140 oracle precondition)") {
    // The convention above is safe only while every scale's corpus is
    // empty-free — enforce it loudly instead of by construction (ADVICE
    // r8 #4). sf0.01 is the driver's oracle scale; sf0.001 the test scale.
    for (dir <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val n = graft.Tables.documents(spark, dir)
        .filter(length(col("text")) === 0 || col("text").isNull).count()
      assert(n == 0L, s"$dir has $n empty/null documents")
    }
  }
}
