package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.Tables

/** Semantic pins for the training-data-assembly family (q98–q101) beyond
  * the generic oracle sweep: coverage/conservation invariants that would
  * not be caught by Spark==DuckDB agreement alone (both engines could agree
  * on a wrong geometry).
  */
class AssemblySpec extends AnyFunSuite {
  import spark.implicits._

  private def run(name: String) = Registry.byName(name).fn(spark, sf0001)

  test("q98 chunking: stride-48/len-64 geometry covers every token exactly") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val chunks = run("q98_docs_chunking")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        max(col("chunk_id")).as("max_id"),
        min(col("n_tok")).as("min_ct"),
        max(col("n_tok")).as("max_ct"),
        max(struct(col("chunk_id"), col("n_tok"))).getField("n_tok")
          .as("last_ct"))
    val joined = docs.join(chunks, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("n_chunks") == (n - 1) / 48 + 1, s"doc ${r.get(0)}")
      assert(r.getAs[Long]("max_id") == r.getAs[Long]("n_chunks") - 1)
      assert(r.getAs[Long]("max_ct") <= 64 && r.getAs[Long]("min_ct") >= 1)
      // coverage: the last chunk starts at 1 + 48*max_id and must reach n
      val reach = 48 * r.getAs[Long]("max_id") + r.getAs[Long]("last_ct")
      assert(reach == n, s"doc ${r.get(0)}: gap or overrun ($reach vs $n)")
    }
  }

  test("q99 packing: token conservation and monotone sequence spans per shard") {
    val rows = run("q99_docs_seq_packing").collect()
    val totalTok = rows.map(_.getAs[Long]("n_tok")).sum
    val maxSeq = rows.map(_.getAs[Long]("seq_last"))
    rows.foreach { r =>
      assert(r.getAs[Long]("seq_last") >= r.getAs[Long]("seq_first"))
      assert(r.getAs[Long]("n_seqs") ==
        r.getAs[Long]("seq_last") - r.getAs[Long]("seq_first") + 1)
    }
    // every 256-token budget must hold ≥ the tokens accounted: per shard,
    // (max seq_last + 1) * 256 >= shard token sum (cut sequences can be
    // partially filled only at the shard tail)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      val toks = rs.map(_.getAs[Long]("n_tok")).sum
      val seqs = rs.map(_.getAs[Long]("seq_last")).max + 1
      assert(seqs * 256 >= toks && (seqs - 1) * 256 < toks,
        s"shard $shard: $toks tokens in $seqs sequences")
    }
    assert(maxSeq.max >= 0 && totalTok > 0)
  }

  test("q100 dim stats: 64 dims, full row count, fixed-point mean within 2^-20 of double mean") {
    val stats = run("q100_emb_dim_stats").collect()
    assert(stats.length == 64)
    val nRows = Tables.embeddings(spark, sf0001).count()
    val trueMean = Tables.embeddings(spark, sf0001)
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .filter(col("pos") === 0)
      .agg(avg(col("x").cast("double"))).as[Double].collect()(0)
    val r0 = stats.find(_.getAs[Long]("dim") == 1L).get
    assert(r0.getAs[Long]("n") == nRows)
    val fxMean = r0.getAs[Long]("sum_fx").toDouble / (1 << 20) / nRows
    assert(math.abs(fxMean - trueMean) < 1.0 / (1 << 20))
    assert(stats.forall(r => r.getAs[Long]("min_fx") <= r.getAs[Long]("max_fx")))
  }

  test("q101 error context: equals the naive inequality join, all deltas within band") {
    val got = run("q101_events_error_context").collect()
    assert(got.forall(r => math.abs(r.getAs[Long]("delta_us")) <= 3600000000L))
    val ev = Tables.events(spark, sf0001).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("us"))
    val naive = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("us").as("a_us"))
      .join(ev.select(col("user_id"), col("event_id"), col("us")), Seq("user_id"))
      .filter(col("us") >= col("a_us") - 3600000000L &&
        col("us") <= col("a_us") + 3600000000L &&
        col("event_id") =!= col("error_id"))
      .count()
    assert(got.length.toLong == naive, s"banded ${got.length} vs naive $naive")
  }
}
