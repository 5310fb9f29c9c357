package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.SparkTestSession.{spark, sf0001}
import java.nio.file.Files

/** The streaming KMV cardinality monitor's contract: the stream-grown
  * sketch is EQUAL to the sketch one batch pass over all delivered rows
  * would build (exact mergeability under real micro-batching), monitor
  * rows recount exactly, replays converge, and an empty batch leaves
  * the estimate untouched while still reporting its zero row count.
  */
class KmvStreamSpec extends AnyFunSuite {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def hashOf(k: Long): Long = {
    val r = (k * 2654435761L) % KmvStream.M
    if (r < 0) r + KmvStream.M else r
  }

  /** Driver-side direct sketch over a key set: K smallest hashes. */
  private def directSketch(keys: Seq[Long]): Seq[Long] =
    keys.map(hashOf).distinct.sorted.take(KmvStream.K)

  private def estOf(sk: Seq[Long]): Long =
    if (sk.size < KmvStream.K) sk.size.toLong
    else (KmvStream.K - 1).toLong * KmvStream.M / sk.last

  test("stream-grown sketch equals the direct batch sketch; monitor rows recount; replay and empty batch behave") {
    val keys = graft.Tables.orders(spark, sf0001)
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSeq
    // three deterministic chunks with heavy cross-chunk key overlap
    val chunks = Seq(
      keys.zipWithIndex.filter(_._2 % 3 != 2).map(_._1),
      keys.zipWithIndex.filter(_._2 % 3 != 0).map(_._1),
      keys.zipWithIndex.filter(_._2 % 3 != 1).map(_._1))

    val inbox = tmp("graft_kmv_inbox")
    val stateDir = tmp("graft_kmv_state")
    val monDir = tmp("graft_kmv_mon")
    val ckpt = tmp("graft_kmv_ckpt")
    val sch = StructType(Seq(StructField("k", LongType)))
    def run(): Unit = KmvStream.monitor(
      spark.readStream.schema(sch).csv(inbox), "k",
      stateDir, monDir, ckpt).awaitTermination()
    chunks.zipWithIndex.foreach { case (c, i) =>
      Files.write(new java.io.File(s"$inbox/b$i.csv").toPath,
        c.mkString("\n").getBytes)
      run() // one controlled micro-batch per file
    }

    // stream-grown state == direct sketch over every delivered row: the
    // mergeability proof under real micro-batching
    def stateAt(b: Long): Seq[Long] = spark.read
      .schema(StructType(Seq(StructField("h", LongType))))
      .parquet(s"$stateDir/batch_id=$b").collect().map(_.getLong(0)).sorted.toSeq
    val allDelivered = chunks.flatten
    assert(stateAt(2) == directSketch(allDelivered))

    // monitor rows recount: per-batch n_rows, cumulative estimate
    def monitor() = spark.read.parquet(monDir)
      .select("batch_id", "n_rows", "n_sketch", "kth_hash", "est_distinct")
      .collect()
      .map(r => (r.getAs[Int]("batch_id").toLong, r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_sketch"), r.getAs[Long]("kth_hash"),
        r.getAs[Long]("est_distinct"))).sortBy(_._1).toSeq
    val rows = monitor()
    val expected = chunks.indices.map { i =>
      val sk = directSketch(chunks.take(i + 1).flatten)
      (i.toLong, chunks(i).size.toLong, sk.size.toLong,
        if (sk.isEmpty) -1L else sk.last, estOf(sk))
    }
    assert(rows == expected, s"monitor table: $rows vs $expected")
    // the estimate is within KMV error of the true distinct count
    val exact = allDelivered.distinct.size
    assert(math.abs(rows.last._5 - exact).toDouble / exact < 0.51)

    // at-least-once replay of the last batch: state and monitor identical
    KmvStream.sketchBatch(spark, chunks(2).toDF("k"), 2L,
      "k", stateDir, monDir)
    assert(stateAt(2) == directSketch(allDelivered))
    assert(monitor() == rows, "replay changed the monitor table")

    // empty batch: estimate unchanged, zero row count reported
    KmvStream.sketchBatch(spark, Seq.empty[Long].toDF("k"), 3L,
      "k", stateDir, monDir)
    assert(stateAt(3) == stateAt(2), "empty batch moved the sketch")
    val m3 = monitor().find(_._1 == 3L).get
    assert(m3._2 == 0L && m3._5 == rows.last._5)

    // state-generation pruning (advisor r13): only the latest generation
    // and its replay-safety predecessor survive — the dir no longer
    // accumulates one generation per micro-batch forever
    val gens = new java.io.File(stateDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName.stripPrefix("batch_id=").toLong).sorted.toSeq
    assert(gens == Seq(2L, 3L), s"unpruned state generations: $gens")
  }
}
