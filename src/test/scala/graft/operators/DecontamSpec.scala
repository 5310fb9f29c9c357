package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark

/** Span-removal decontamination (operators/Decontam): window merging,
  * the scrub rewrite, and the end-to-end guarantee that a scrubbed
  * corpus re-audits CLEAN — the property the whole policy exists for.
  *
  * Split buckets under bucketOf (id·2654435761 mod 100): 18/36/59 land
  * ≥95 (eval), 13/31 land 90–94 (val, neither side), small ids like
  * 0–7 land <90 (train).
  */
class DecontamSpec extends AnyFunSuite {

  private val N = 13

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  /** A 13-token secret that only engineered planting introduces. */
  private val secret = (1 to N).map(i => s"sec$i").mkString(" ")

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("gramHits finds planted 13-gram overlaps at the right windows, honoring the split") {
    val docs = docsDf(Seq(
      18L -> s"${toks("e", 5)} $secret ${toks("f", 4)}", // eval doc carrying the secret
      0L -> s"${toks("a", 10)} $secret ${toks("b", 10)}", // train: hit at i=11
      1L -> s"${toks("c", 20)}", // train: clean
      13L -> s"$secret ${toks("v", 10)}")) // val split: carries it but is NOT train
    val hits = Decontam.gramHits(docs, N).collect()
    assert(hits.map(_.getAs[Long]("doc_id")).toSet == Set(0L))
    assert(hits.map(_.getAs[Int]("i")).toSet == Set(11))
    assert(hits.map(_.getAs[Long]("eval_doc")).toSet == Set(18L))
  }

  test("mergedSpans coalesces overlapping and adjacent windows, keeps gaps apart") {
    import spark.implicits._
    // windows [5,17] and [10,22] overlap; [23,35] is adjacent to 22 → one
    // span [5,35]; [40,52] is separated by a gap → its own span
    val hits = Seq((1L, 5), (1L, 10), (1L, 23), (1L, 40)).toDF("doc_id", "i")
    val spans = Decontam.mergedSpans(hits, N).collect()
      .map(r => (r.getAs[Int]("lo"), r.getAs[Int]("hi"))).toSet
    assert(spans == Set((5, 35), (40, 52)))
  }

  test("scrubText excises exactly the span tokens and leaves other docs unchanged") {
    import spark.implicits._
    val docs = docsDf(Seq(
      1L -> (1 to 30).map(i => s"w$i").mkString(" "),
      2L -> "left alone"))
    val spans = Seq((1L, 1L, 10, 14)).toDF("doc_id", "span_id", "lo", "hi")
    val out = Decontam.scrubText(docs, spans).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    val expected = ((1 to 9) ++ (15 to 30)).map(i => s"w$i").mkString(" ")
    assert(out(1L) == expected)
    assert(out(2L) == "left alone")
  }

  test("end-to-end: scrubbed corpus re-audits clean; budget matches the rewrite") {
    // two train docs carrying the eval secret (one with TWO overlapping
    // plants), one clean train doc, the eval doc itself
    val docs = docsDf(Seq(
      18L -> s"${toks("e", 3)} $secret",
      0L -> s"${toks("a", 7)} $secret ${toks("b", 12)}",
      2L -> s"$secret ${toks("m", 2)} $secret",
      1L -> toks("c", 25)))
    val hits = Decontam.gramHits(docs, N)
    val spans = Decontam.mergedSpans(hits.select(col("doc_id"), col("i")), N)
    val scrubbed = Decontam.scrubText(docs, spans)
      .select(col("doc_id"), col("clean_text").as("text"))
    // the policy's reason to exist: no train-side hit survives the rewrite
    assert(Decontam.gramHits(scrubbed, N).count() == 0)
    // budget consistency: kept tokens == tokens of the rewritten text
    // (token count of the non-empty rewrites; a fully-scrubbed doc has
    // clean_text "" which split counts as one empty token, so compare
    // against the span-side arithmetic only where text survives)
    val budget = spans.groupBy(col("doc_id"))
      .agg(sum(col("hi") - col("lo") + 1).as("removed"))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens")), "doc_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tokens") - r.getAs[Long]("removed"))).toMap
    val keptTokens = scrubbed.filter(length(col("text")) > 0)
      .select(col("doc_id"), size(split(col("text"), " ")).as("kept"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("kept").toLong).toMap
    budget.filter(_._2 > 0).foreach { case (id, kept) =>
      assert(keptTokens(id) == kept, s"doc $id: budget $kept vs rewrite ${keptTokens.get(id)}")
    }
    // doc 2's two plants sit 2 tokens apart (m1 m2): hits at i=1 and
    // i=16, [1,13] vs [16,28] — a real gap, so they stay TWO spans and
    // the rewrite keeps exactly 'm1 m2'
    val spans2 = spans.filter(col("doc_id") === 2L).count()
    assert(spans2 == 2L)
    assert(keptTokens(2L) == 2L)
  }
}
