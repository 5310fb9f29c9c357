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

  test("q165 balanced shards: every source placed once, per-class shard counts differ by <= 1") {
    val rows = run("q165_balanced_shards").collect()
    val nSources = Tables.documents(spark, sf0001)
      .select(col("source")).distinct().count()
    assert(rows.length == nSources, "each source assigned exactly once")
    assert(rows.forall { r =>
      val s = r.getAs[Long]("shard"); s >= 0 && s < 8
    })
    // round-robin balance: within a size class, shard populations differ
    // by at most one (the property hash placement lacks)
    rows.groupBy(_.getAs[Long]("size_class")).foreach { case (cls, rs) =>
      val counts = (0L until 8L).map(sh => rs.count(_.getAs[Long]("shard") == sh))
      assert(counts.max - counts.min <= 1,
        s"class $cls shard spread ${counts.mkString(",")}")
    }
    // classes honor the ladder: every member's tokens fit its class cap,
    // and exceed the previous cap (so the <2x spread argument holds)
    val caps = Seq(1000L, 2000L, 4000L, 8000L, 16000L)
    rows.foreach { r =>
      val (tok, cls) = (r.getAs[Long]("n_tok"), r.getAs[Long]("size_class"))
      assert(tok <= cls || cls == 16000L)
      val prev = caps.takeWhile(_ < cls).lastOption.getOrElse(0L)
      assert(tok > prev, s"source ${r.get(0)}: $tok not in ($prev, $cls]")
    }
  }

  test("q166 snapshot diff: classes match the gate and remap predicates, changes only") {
    val diff = run("q166_snapshot_diff").collect()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars"),
        array_contains(split(col("text"), " "), "spark").as("has_spark"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val byType = diff.groupBy(_.getAs[String]("change_type"))
      .map { case (k, v) => k -> v.map(_.getAs[Long]("doc_id")).toSet }
    assert(!byType.contains("added"), "filter+map successor cannot add docs")
    assert(byType.getOrElse("removed", Set.empty) ==
      docs.collect { case (id, (n, _)) if n < 100 => id }.toSet)
    assert(byType.getOrElse("modified", Set.empty) ==
      docs.collect { case (id, (n, sp)) if n >= 100 && sp => id }.toSet)
    // O(changes) output: unchanged docs are suppressed
    assert(diff.length ==
      byType.values.map(_.size).sum, "only change rows emitted")
    diff.filter(_.getAs[String]("change_type") == "modified").foreach { r =>
      assert(r.getAs[String]("old_md5") != r.getAs[String]("new_md5"))
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

  test("q102 passage dedup: kept passages == distinct passage hashes, copies lose") {
    val rows = run("q102_docs_passage_dedup").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_passages"))
    }
    // exactly one winner per distinct passage content
    val kept = rows.map(_.getAs[Long]("n_kept")).sum
    val distinctPassages = Tables.documents(spark, sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(explode(expr("transform(sequence(1, size(t), 64), i -> concat_ws(' ', slice(t, i, 64)))")).as("p"))
      .select(countDistinct(col("p"))).as[Long].collect()(0)
    assert(kept == distinctPassages, s"$kept winners vs $distinctPassages distinct passages")
    // the synthetic docs at sf0.001 happen to be passage-unique; the dedup
    // MECHANICS (first-occurrence-wins across docs) are pinned by seeding
    // an explicit copy through the same pipeline stages instead
    import spark.implicits._
    val seeded = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), expr("1L").as("p_id"),
        md5(concat_ws(" ", col("t"))).as("h"))
      .withColumn("ord", col("doc_id") * lit(1048576L) + col("p_id"))
    val w = seeded.groupBy("h").agg(min(col("ord")).as("w"))
    val keptIds = seeded.join(w, "h").filter(col("ord") === col("w"))
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds == Set(1L, 3L), s"copy (doc 2) must lose to doc 1: $keptIds")
  }

  test("q103 centering: row per vector, one vector recomputed end-to-end") {
    val rows = run("q103_emb_centering").collect()
    assert(rows.length == Tables.embeddings(spark, sf0001).count())
    rows.foreach(r => assert(r.getAs[Long]("sum_dx2") >= 0L))
    // recompute vec 7 directly: fx = floor(x * 2^20), mean_fx = floor-div
    val fx = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 1048576.0D) AS BIGINT)").as("fx"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byDim = fx.groupBy(_._2).map { case (dim, rs) =>
      val s = rs.map(_._3).sum
      val n = rs.length
      dim -> java.lang.Math.floorDiv(s, n)
    }
    val expected = fx.filter(_._1 == 7L)
      .map { case (_, dim, v) => v - byDim(dim) }
    val got = rows.find(_.getAs[Long]("vec_id") == 7L).get
    assert(got.getAs[Long]("sum_dx") == expected.sum)
    assert(got.getAs[Long]("sum_dx2") == expected.map(d => d * d).sum)
    assert(got.getAs[Long]("max_absdx") == expected.map(math.abs).max)
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

  test("q128 winnow: subset of q127, 63-token guarantee fires unaligned, postings shrink") {
    // subset: a shared fingerprint is a shared 48-window (xxhash64
    // injective in practice), so every q128-flagged doc must be
    // q127-flagged with the SAME-or-earlier source bound
    val exactRows = run("q127_span_dedup").collect()
    val exact = exactRows
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[Any]("earliest_src_doc")).map(_.asInstanceOf[Long])).toMap
    val winnowRows = run("q128_span_dedup_winnow").collect()
    val winnow = winnowRows.map(r => r.getAs[Long]("doc_id") ->
      Option(r.getAs[Any]("earliest_src_doc")).map(_.asInstanceOf[Long])).toMap
    winnow.foreach { case (id, src) =>
      if (src.isDefined)
        assert(exact(id).isDefined && exact(id).get <= src.get,
          s"doc $id: winnow flags $src but exact says ${exact(id)}")
    }
    // reduction: winnowed postings are a small fraction of the window count
    val nFp = winnowRows.map(_.getAs[Long]("n_fp")).sum.toDouble
    val nWin = exactRows.map(_.getAs[Long]("n_spans")).sum.toDouble
    assert(nFp <= nWin / 4, s"winnow posted $nFp of $nWin windows — no reduction")

    // guarantee: a 63-token run shared at an UNALIGNED offset must fire
    val a = (1 to 80).map(i => s"g$i")
    val corpus = Seq(
      (1L, a.mkString(" ")),
      (2L, ((1 to 11).map(i => s"h$i") ++ a.slice(9, 72) ++ // g10..g72: 63 tokens
        (1 to 7).map(i => s"k$i")).mkString(" ")),
      (3L, ((1 to 30).map(i => s"m$i") ++ (1 to 30).map(i => s"n$i")).mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    corpus.map { case (id, t) => (id, t, "en", "w", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Registry.byName("q128_span_dedup_winnow").fn(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shared_fp"),
          Option(r.getAs[Any]("earliest_src_doc")).map(_.asInstanceOf[Long])))).toMap
    assert(got(2L)._1 >= 1L, "63-token shared run missed by winnowing")
    assert(got(2L)._2 == Some(1L))
    assert(got(3L) == ((0L, None)))
  }
}
