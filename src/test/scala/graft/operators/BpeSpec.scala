package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}

/** Iterative BPE trainer (q155): greedy-merge semantics on crafted runs,
  * the recount property (each round's count equals a fresh q110-style
  * pair count over the previous round's corpus), and determinism.
  */
class BpeSpec extends AnyFunSuite {

  /** l+Joiner+r — the merged-token string under the reserved separator. */
  private def J(l: String, r: String): String = l + Bpe.Joiner + r

  private def applied(tokens: Seq[String], l: String, r: String): Seq[String] = {
    import spark.implicits._
    Seq(tokens).toDF("t")
      .select(Bpe.applyMerge(col("t"), l, r).as("t"))
      .collect()(0).getSeq[String](0).toSeq
  }

  test("applyMerge: greedy left-to-right, non-overlapping, run parity") {
    // simple hit + miss
    assert(applied(Seq("x", "a", "b", "y"), "a", "b") == Seq("x", J("a", "b"), "y"))
    assert(applied(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    // overlapping run of the same token: "a a a" has candidates at 1,2 —
    // greedy merges at 1, consumes 2
    assert(applied(Seq("a", "a", "a"), "a", "a") == Seq(J("a", "a"), "a"))
    // even run: candidates 1,2,3 — merges at 1 and 3
    assert(applied(Seq("a", "a", "a", "a"), "a", "a") == Seq(J("a", "a"), J("a", "a")))
    // pair at the very end; no out-of-bounds probe past it
    assert(applied(Seq("x", "a", "b"), "a", "b") == Seq("x", J("a", "b")))
    // single token and the pair-as-whole-doc edge
    assert(applied(Seq("a"), "a", "a") == Seq("a"))
    assert(applied(Seq("a", "b"), "a", "b") == Seq(J("a", "b")))
    // adjacent DIFFERENT candidates interleave: "a b a b" candidates at
    // 1,3 (not a run) — both merge
    assert(applied(Seq("a", "b", "a", "b"), "a", "b") == Seq(J("a", "b"), J("a", "b")))
  }

  test("train: each round's winner matches a fresh recount of the evolving corpus") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf0001)
    val merges = Bpe.train(docs, rounds = 3).orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.map(_._1).toSeq == Seq(1L, 2L, 3L))

    // replay the loop driver-side: greedy apply + full recount per round
    def pairsOf(t: Seq[String]): Seq[(String, String)] =
      if (t.length < 2) Nil else t.zip(t.tail)
    def apply1(t: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < t.length) {
        if (i + 1 < t.length && t(i) == l && t(i + 1) == r) {
          out += l + Bpe.Joiner + r; i += 2
        } else { out += t(i); i += 1 }
      }
      out.toSeq
    }
    var corpus = docs.select(col("text")).collect()
      .map(_.getString(0).split(" ", -1).toSeq)
    merges.foreach { case (_, l, r, cnt) =>
      val counts = corpus.flatMap(pairsOf).groupBy(identity).view.mapValues(_.size)
      val best = counts.toSeq.map { case ((a, b), c) => (-c, a, b) }.min
      assert((best._2, best._3) == (l, r), s"winner mismatch: got ($l,$r), expect $best")
      assert(counts((l, r)).toLong == cnt, s"count mismatch for ($l,$r)")
      corpus = corpus.map(t => apply1(t, l, r))
    }

    // determinism: identical merge table on a second run
    val again = Bpe.train(docs, rounds = 3).orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == again.toSeq)
  }

  test("train stops early when no pair remains") {
    import spark.implicits._
    val tiny = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    val merges = Bpe.train(tiny, rounds = 5).orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1 merges (a,b) -> a+Joiner+b; afterwards every doc is 1 token and
    // rounds 2+ have no candidate pair
    assert(merges.toSeq == Seq((1L, "a", "b", 1L)))
  }

  test("vocab apply round-trip: decode(encode(x)) == x over the training corpus; ids dense and flat/array forms consistent") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val path = java.nio.file.Files.createTempDirectory("bpe_vocab").toString
    Bpe.storeVocab(docs, Bpe.train(docs, rounds = 3), path)
    val encoded = Bpe.encodeStored(spark, docs, path)
    // ROUND TRIP — the encode half inverts exactly on its own training
    // corpus (no OOV possible there; the reserved U+0001 joiner makes
    // the merged-token split lossless)
    val roundTrip = Bpe.decodeStored(spark, encoded, path)
      .select(col("doc_id"), col("text").as("rt"))
    val diff = docs.join(roundTrip, "doc_id")
      .filter(col("text") =!= col("rt")).count()
    assert(diff == 0)
    assert(roundTrip.count() == docs.count())
    // no OOV on the training corpus; ids are dense 0..|V|-1
    val flat = Bpe.encodeStoredFlat(spark, docs, path)
    assert(flat.filter(col("token_id") < 0).count() == 0)
    val vocab = spark.read.parquet(s"$path/vocab")
    val vSize = vocab.count()
    assert(vocab.agg(min(col("id")), max(col("id"))).collect()(0)
      .toSeq == Seq(0L, vSize - 1))
    // the array form is the flat form reassembled in pos order
    val fromArrays = encoded
      .select(col("doc_id"), posexplode(col("token_ids")).as(Seq("pos0", "token_id")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("token_id"))
    assert(fromArrays.exceptAll(flat).count() == 0 &&
      flat.exceptAll(fromArrays).count() == 0)
    // a genuinely-OOV token maps to -1 (the documented contract for
    // encoding a NEW corpus against a stored vocab)
    import spark.implicits._
    val oov = Bpe.encodeStoredFlat(spark,
      Seq((99L, "definitely_not_in_corpus_xyzzy")).toDF("doc_id", "text"), path)
      .collect()
    assert(oov.length == 1 && oov(0).getAs[Long]("token_id") == -1L)
  }
}
