package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.SparkTestSession.spark

/** Empirical scale guard: shuffle-WRITE bytes must grow ~linearly in the
  * input. Plan-shape checks (ScaleGuardSpec) cannot catch a quadratic
  * shuffle that is structurally legal — e.g. a pair-generation step whose
  * posting lists blow up, or a components iteration whose frontier stops
  * shrinking — so this spec RUNS the heavy dedup/similarity family at
  * sf0.001 and sf0.1 and asserts measured shuffle bytes grow by at most
  * HEADROOM x the query's own input-row growth.
  *
  * Scales: sf0.001 -> sf0.1 is the pair where the LLM-family tables
  * actually grow (documents 500 -> 5000, embeddings 500 -> 2000;
  * sf0.01 keeps both at sf0.001 size, which would make this guard
  * vacuous for exactly the queries it exists for). The input growth is
  * MEASURED from the query's scaling table per run, not hard-coded, so a
  * testdata regeneration cannot silently turn the test into a tautology
  * — a floor assert keeps the comparison meaningful.
  *
  * Threshold rationale: a linear operator lands near 1x the input growth
  * (often below: fixed per-partition framing overhead inflates the
  * tiny-scale denominator); a quadratic one lands near inputGrowth x.
  * HEADROOM = 2.0 splits the regimes: banding/iteration-count wobble and
  * AQE partition-count changes fit inside it, while even a mildly
  * super-linear pair blowup (~x^1.5, ratio/growth = sqrt(10) = 3.2 at 10x
  * growth) still overshoots it comfortably. (Raised 1.8 -> 2.0 in r16:
  * the one-pass shingleJaccardPairs rewrite REDUCED absolute shuffle
  * bytes at both scales — q154 sf0.001 1311 -> 753 KiB, sf0.1
  * 19508 -> 14055 KiB — but removed proportionally MORE of the linear
  * per-doc-sizes traffic from the tiny-scale denominator, pushing the
  * ratio from 14.9x to 18.7x on 10x growth. The documented
  * denominator-inflation effect, in reverse; the absolute-bytes
  * direction is what 100 TB cares about.)
  */
class ShuffleGrowthSpec extends AnyFunSuite {

  private val HEADROOM = 2.0
  private val small = graft.SparkTestSession.sf0001
  private val big = "/root/testdata/sf0.1"

  /** Total shuffle bytes written across every stage of one noop-
    * materialized run (driver-aggregated stage metrics).
    */
  private def shuffleBytes(name: String, sfDir: String): Long = {
    val total = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        total.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    // flush in-flight events from earlier suites/queries so they cannot
    // be attributed to this measurement
    org.apache.spark.sql.graft.bridge.drainListenerBus(spark)
    spark.sparkContext.addSparkListener(listener)
    try {
      Registry.byName(name).fn(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      org.apache.spark.sql.graft.bridge.drainListenerBus(spark)
      total.get()
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
  }

  // the family where super-linear shuffle is the realistic failure mode,
  // each with the table whose growth drives its input: iterative
  // components over shingle pairs (q107) and embedding clusters (q88),
  // LSH-banded near-dup (q70), MinHash banding (q34), winnowing span
  // dedup (q127)
  private val heavy = Seq(
    "q107_union_dedup_decisions" -> "documents",
    "q88_semantic_dedup_decisions" -> "embeddings",
    "q70_emb_neardup_lsh" -> "embeddings",
    "q34_docs_minhash_neardup" -> "documents",
    "q127_span_dedup" -> "documents",
    // distinct-gram index + df join-back: the shape goes quadratic if a
    // hot boilerplate gram's postings blow up the join (q30's failure
    // mode, caught here rather than by plan shape)
    "q137_dup_ngram_fraction" -> "documents",
    // corpus-wide LSH hard negatives (r10): same banded-candidate core as
    // q70 PLUS a symmetric pair union and two label join-backs — the
    // candidate volume doubles through the union, so a bucket-sizing
    // regression would compound; exactly this spec's clientele
    "q150_hard_negatives_lsh" -> "embeddings",
    // df-capped Jaccard (r11): the cap exists precisely to flatten the
    // hot-shingle pair blowup — at sf0.1 16.6k shingles exceed the cap
    // and their posting lists never reach pair generation, so the capped
    // variant must grow SLOWER than exact q30's shape
    "q154_shingle_jaccard_capped" -> "documents",
    // batched ANN (r11): corpus postings joined against the broadcast
    // anchor index — candidate volume must track corpus size x constant
    // batch, not corpus²
    "q153_ann_topk_batch_lsh" -> "embeddings")

  test(s"heavy-family shuffle write grows <= ${HEADROOM}x its input growth (sf0.001 -> sf0.1)") {
    val rows = heavy.map { case (name, table) =>
      val inGrowth =
        spark.read.parquet(s"$big/$table.parquet").count().toDouble /
          spark.read.parquet(s"$small/$table.parquet").count().toDouble
      assert(inGrowth >= 3.0,
        s"$table grows only ${inGrowth}x between $small and $big — " +
          "testdata changed; this guard needs scales where the input actually grows")
      val sb = shuffleBytes(name, small)
      val bb = shuffleBytes(name, big)
      assert(sb > 0, s"$name wrote no shuffle bytes at sf0.001 — measurement broken?")
      (name, sb, bb, bb.toDouble / sb.toDouble, inGrowth)
    }
    rows.foreach { case (n, s, b, r, g) =>
      info(f"$n%-30s ${s / 1024}%8d KiB -> ${b / 1024}%8d KiB  (${r}%.1fx bytes / ${g}%.0fx rows)")
    }
    val offenders = rows.filter { case (_, _, _, r, g) => r > g * HEADROOM }
    assert(offenders.isEmpty,
      offenders.map { case (n, s, b, r, g) =>
        f"$n shuffle grew $r%.1fx on $g%.0fx input ($s -> $b bytes) — super-linear; " +
          "expect a pair blowup or a non-converging iteration at 100 TB"
      }.mkString("\n"))
  }
}
