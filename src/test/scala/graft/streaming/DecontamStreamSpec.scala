package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark
import graft.operators.Decontam

/** Streaming eval-decontamination screen (DecontamStream): the q143/q147
  * machinery as an ingest guard — every micro-batch flagged, budgeted,
  * and span-scrubbed against a stored benchmark-gram index, with the
  * DedupStream idempotence discipline.
  */
class DecontamStreamSpec extends AnyFunSuite {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString
  private def toks(p: String, n: Int): String = (1 to n).map(i => s"$p$i").mkString(" ")
  private val secret = (1 to 13).map(i => s"sec$i").mkString(" ")

  test("screen flags carriers, budgets spans, rewrites text; output re-audits clean; replay idempotent") {
    import spark.implicits._
    val base = tmp("graft_decontam")
    val inbox = tmp("graft_decontam_inbox")
    val (idx, out, ckpt) = (s"$base/evalidx", s"$base/screened", s"$base/ckpt")

    DecontamStream.buildEvalIndex(
      Seq((100L, s"intro words $secret trailing")).toDF("doc_id", "text"), idx)
    // the index stores HASHES only — the benchmark text cannot leak
    assert(spark.read.parquet(s"$idx/grams").columns.toSeq == Seq("h"))
    // and a meta row recording the gram size + layout format
    assert(spark.read.parquet(s"$idx/meta").collect().map(r =>
      (r.getAs[Int]("format"), r.getAs[Int]("n"))).toSeq ==
      Seq((DecontamStream.IndexFormat, 13)))

    def publish(name: String, rows: Seq[(Long, String)]): Unit = {
      val body = "doc_id,text\n" + rows.map { case (id, t) => s"$id,$t" }.mkString("\n")
      Files.write(new java.io.File(inbox, name).toPath, body.getBytes)
      ()
    }
    def screen(): Unit = DecontamStream.screen(
      DedupStream.readDocs(spark, inbox), idx, out, ckpt).awaitTermination()
    def rows(): Map[Long, (Long, Long, Long, Long, String)] =
      spark.read.parquet(out).collect().map(r =>
        r.getAs[Long]("doc_id") -> ((r.getAs[Long]("contaminated"),
          r.getAs[Long]("n_spans"), r.getAs[Long]("tokens_removed"),
          r.getAs[Long]("n_tokens"), r.getAs[String]("clean_text")))).toMap

    publish("b1.csv", Seq(
      1L -> s"${toks("a", 7)} $secret ${toks("b", 12)}", // carrier: one 13-token span at i=8
      2L -> toks("c", 20))) // clean
    screen()
    val r1 = rows()
    assert(r1(1L) == ((1L, 1L, 13L, 32L, s"${toks("a", 7)} ${toks("b", 12)}")))
    assert(r1(2L) == ((0L, 0L, 0L, 20L, toks("c", 20))))

    // the property the guard exists for: screened output carries ZERO
    // eval grams (re-audit the clean_text against the same index)
    def reAudit(): Long = Decontam.grams(
      spark.read.parquet(out).select(col("doc_id"), col("clean_text").as("text")), 13)
      .join(spark.read.parquet(s"$idx/grams"), "h").count()
    assert(reAudit() == 0L)

    // batch 2 after a restart: adjacent double plant merges to ONE span
    // covering the whole doc — the rewrite empties it (a drop signal);
    // the malformed row (missing text) is dropped, not NULL-propagated
    publish("b2.csv", Seq(3L -> s"$secret $secret", 4L -> toks("d", 15)) :+ (5L -> ""))
    screen()
    val r2 = rows()
    assert(r2(3L) == ((1L, 1L, 26L, 26L, "")))
    assert(r2(4L) == ((0L, 0L, 0L, 15L, toks("d", 15))))
    assert(!r2.contains(5L), "empty-text row must be dropped, not screened")
    assert(reAudit() == 0L)

    // idle restart: no new files — nothing changes
    screen()
    assert(rows() == r2)

    // crash-replay (foreachBatch is at-least-once): re-running batch 0's
    // body with its original id must rewrite identical rows in place
    val before = rows()
    DecontamStream.screenBatch(spark,
      Seq(1L -> s"${toks("a", 7)} $secret ${toks("b", 12)}",
        2L -> toks("c", 20)).toDF("doc_id", "text"),
      0L, idx, out)
    assert(rows() == before, "replay changed the screened output")
  }

  test("screen fails loudly on n mismatch, missing meta, and an empty index") {
    import spark.implicits._
    val base = tmp("graft_decontam_guard")
    val batch = Seq(1L -> s"$secret trailing").toDF("doc_id", "text")

    // n mismatch: an n=13 index screened with n=10 would match nothing —
    // the guard must throw, never silently pass contaminated docs
    val idx = s"$base/idx13"
    DecontamStream.buildEvalIndex(Seq((100L, secret)).toDF("doc_id", "text"), idx)
    val eN = intercept[IllegalArgumentException] {
      DecontamStream.screenBatch(spark, batch, 0L, idx, s"$base/out1", n = 10)
    }
    assert(eN.getMessage.contains("n=13") && eN.getMessage.contains("n=10"))

    // missing meta (pre-format or wrong dir): loud failure, not a no-op
    val bare = s"$base/bare"
    Seq("deadbeef").toDF("h").write.parquet(bare) // hashes at the OLD layout root
    intercept[IllegalStateException] {
      DecontamStream.screenBatch(spark, batch, 0L, bare, s"$base/out2")
    }

    // empty gram set (benchmark docs all shorter than n): also loud
    val empty = s"$base/empty"
    DecontamStream.buildEvalIndex(Seq((100L, "too short")).toDF("doc_id", "text"), empty)
    val eE = intercept[IllegalArgumentException] {
      DecontamStream.screenBatch(spark, batch, 0L, empty, s"$base/out3")
    }
    assert(eE.getMessage.contains("empty"))
  }
}
