package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.Tables

/** Semantic pins for the corpus-curation family (q80–q83) beyond the
  * generic oracle sweep: the oracle proves Spark==DuckDB, these prove the
  * operators mean what they claim.
  */
class CurationSpec extends AnyFunSuite {

  private def run(name: String) = Registry.byName(name).fn(spark, sf0001)

  test("q80 stratified sample: membership is a pure function of doc_id with per-lang rates") {
    val docs = Tables.documents(spark, sf0001)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = run("q80_docs_stratified_sample").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the multiplicative hash is uniform: expect ~rate% per stratum with a
    // generous band at n≈500 (binomial 3σ)
    kept.foreach { case (lang, n) =>
      val rate = if (lang == "en") 0.20 else 0.60
      val exp = total(lang) * rate
      val sigma = math.sqrt(total(lang) * rate * (1 - rate))
      assert(math.abs(n - exp) <= 3 * sigma + 1,
        s"$lang: kept $n of ${total(lang)}, expected ~$exp")
    }
    // determinism/purity: same doc_ids on a re-run (no RNG state anywhere)
    val a = run("q80_docs_stratified_sample").select("doc_id").collect().map(_.getLong(0)).toSeq
    val b = run("q80_docs_stratified_sample").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("q80 sample composes with q73 split: all three split classes survive sampling") {
    // regression pin for the correlated-hash hazard: with q73's multiplier
    // reused, every sampled doc (bucket < 60) would land in train
    // (bucket < 90) and val/test would be EMPTY after sample-then-split
    val sampled = run("q80_docs_stratified_sample").select("doc_id")
    val split = run("q73_docs_train_split").select("doc_id", "split")
    val classes = sampled.join(split, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(classes.keySet == Set("train", "val", "test"),
      s"sample-then-split lost classes: $classes")
  }

  test("q82 quantization round-trip: |x - q/scale| <= 0.5/scale for every dimension") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf0001)
    val bad = emb
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .select(col("vec_id"), col("v"),
        expr("array_max(transform(v, x -> abs(x)))").as("maxabs"))
      .filter(col("maxabs") > 0)
      .select(col("vec_id"), col("v"), (lit(127.0d) / col("maxabs")).as("scale"))
      .select(col("vec_id"),
        expr("""size(filter(zip_with(v,
               |  transform(v, x -> floor(x * scale + 0.5D) / scale),
               |  (x, r) -> abs(x - r) <= 0.5D / scale + 1e-12), ok -> NOT ok))"""
          .stripMargin).as("n_bad"))
      .filter(col("n_bad") > 0).count()
    assert(bad == 0)
  }

  test("q81 source cap: every source keeps exactly min(15, |source|) docs") {
    val docs = Tables.documents(spark, sf0001)
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = run("q81_docs_source_cap").groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == perSource.keySet) // no source vanishes
    kept.foreach { case (src, n) =>
      assert(n == math.min(15L, perSource(src)), s"$src kept $n of ${perSource(src)}")
    }
  }

  test("q82 int8 quantization: values bounded by ±127 and scale saturates the max dim") {
    val rows = run("q82_emb_quantize").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (minQ, maxQ) = (r.getLong(2), r.getLong(3))
      assert(minQ >= -127 && maxQ <= 127)
      // symmetric scaling by 127/max|x|: the extreme dim quantizes to ±127
      assert(maxQ == 127 || minQ == -127)
    }
  }

  test("q83 contamination: benchmark docs are fully contaminated, fractions in [0,1]") {
    val rows = run("q83_docs_contamination").collect()
    rows.foreach { r =>
      val (docId, nSh, nHit, frac) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nHit <= nSh && frac >= 0.0 && frac <= 1.0)
      // every shingle of a benchmark doc is in the benchmark set by construction
      if (docId % 50 == 0) assert(nHit == nSh && frac == 1.0, s"benchmark doc $docId")
    }
    // the screen must be non-trivial: some non-benchmark doc shares no 8-gram
    assert(rows.exists(r => r.getLong(0) % 50 != 0 && r.getLong(2) == 0))
  }

  test("q125 token-budget cut: two-level refinement equals the naive window, any bucket count") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf0001)
    // the naive single-window reference (the DuckDB twin's shape, in Spark)
    def naive(budget: Long) = {
      val w = Window.partitionBy(col("source"))
        .orderBy(pmod(col("doc_id") * lit(3266489917L), lit(1000000L)), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .filter(col("before") < budget)
        .select(col("doc_id"), col("source"), col("n_tok"))
    }
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // tight, mid, and over-total budgets; 1 bucket (pure window) and 32
    for (budget <- Seq(40L, 700L, 1000000L); nb <- Seq(1, 32)) {
      val got = ids(CurationQueries.tokenBudgetCut(docs, budget, nb))
      assert(got == ids(naive(budget)), s"budget=$budget nBuckets=$nb")
    }
    // the boundary doc that CROSSES the budget is kept: per-source kept
    // token mass is >= min(budget, source total) and every source appears
    val kept = CurationQueries.tokenBudgetCut(docs, 700L)
      .groupBy("source").agg(sum("n_tok").as("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == totals.keySet)
    kept.foreach { case (src, tok) =>
      assert(tok >= math.min(700L, totals(src)), s"$src kept only $tok")
    }
  }

  test("q130 temperature sample: exact integer recount on a skewed corpus, flattening ordering") {
    import spark.implicits._
    // skewed sources: 64 / 16 / 4 docs — alpha=0.5 weights 8:4:2, so keep
    // RATES must be ordered small-source-highest (the flattening property)
    val docs = ((1 to 64).map(i => (i.toLong, "big")) ++
      (1 to 16).map(i => (100L + i, "mid")) ++
      (1 to 4).map(i => (200L + i, "small")))
    val dir = java.nio.file.Files.createTempDirectory("graft-temp").toString
    docs.map { case (id, src) => (id, s"tok$id body", "en", src, 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // exact integer recount (same math, plain Scala)
    val n = docs.groupBy(_._2).map { case (s, xs) => s -> xs.size.toLong }
    val w = n.map { case (s, c) => s -> math.sqrt(c.toDouble * 1000000).toLong }
    val (nTotal, sW) = (n.values.sum, w.values.sum)
    val rate = n.keys.map { s =>
      s -> math.floor(nTotal.toDouble * w(s).toDouble * 1000000.0 /
        (2.0 * n(s).toDouble * sW.toDouble)).toLong
    }.toMap
    val expected = docs.filter { case (id, src) =>
      (id * 374761393L) % 1000000L < rate(src)
    }.map(_._1).toSet
    val got = Registry.byName("q130_temperature_sample").fn(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(got == expected)
    // flattening: keep fraction ordered small > mid > big (exact, from the
    // deterministic rates, not sampling noise — rates are n_total*w/(2*n*S))
    val frac = Seq("big", "mid", "small").map { s =>
      s -> docs.filter(_._2 == s).count(d => expected(d._1)).toDouble / n(s)
    }.toMap
    assert(frac("small") > frac("mid") && frac("mid") > frac("big"),
      s"no flattening: $frac")
  }

  test("q132 DSIR: exact integer replay at sf0.001, and en docs outscore zh on average") {
    // plain-Scala replay of the full pipeline: portable rolling hash →
    // 256-bucket counts → Laplace log-ratio micros (same IEEE tree) →
    // per-doc integer sums
    def fp(tok: String): Long =
      tok.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000000000000L)
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.flatMap { case (id, lang, text) =>
      text.split(" ", -1).filter(_.nonEmpty).map(t => (id, lang, fp(t) % 256))
    }
    val cr = toks.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val ct = toks.filter(_._2 == "en").groupBy(_._3).view
      .mapValues(_.length.toLong).toMap.withDefaultValue(0L)
    val (rTot, tTot) = (cr.values.sum, ct.values.sum)
    val contrib = cr.keys.map { b =>
      b -> math.floor(math.log(
        ((ct(b) + 1).toDouble / (tTot + 256).toDouble) /
          ((cr(b) + 1).toDouble / (rTot + 256).toDouble)) * 1000000 + 0.5).toLong
    }.toMap
    val expected = toks.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong, xs.map(x => contrib(x._3)).sum)
    }.toMap
    val got = Registry.byName("q132_dsir_importance").fn(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    // the weight measures en-likeness: mean log-w of en docs must exceed zh
    val byLang = docs.map { case (id, lang, _) => lang -> got(id)._2 }
    def mean(l: String) = { val v = byLang.filter(_._1 == l).map(_._2); v.sum.toDouble / v.length }
    assert(mean("en") > mean("zh"), s"en=${mean("en")} zh=${mean("zh")}")
  }

  test("q125 property: two-level cut equals the naive window on random corpora") {
    import org.scalacheck.Gen
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val docGen = for {
      id <- Gen.choose(1L, 4000L)
      src <- Gen.oneOf("s0", "s1", "s2")
      n <- Gen.choose(1, 40)
    } yield (id, src, n)
    val caseGen = for {
      docs <- Gen.listOfN(50, docGen)
      budget <- Gen.choose(1L, 400L)
      nb <- Gen.oneOf(1, 4, 32)
    } yield (docs, budget, nb)
    val seed0 = org.scalacheck.rng.Seed(7L)
    Iterator.iterate(seed0)(_.next).take(8).foreach { seed =>
      caseGen.apply(Gen.Parameters.default, seed).foreach { case (docs0, budget, nb) =>
        val docs = docs0.groupBy(_._1).map(_._2.head).toSeq
        val df = docs.map { case (id, src, n) =>
          (id, (1 to n).map(i => s"w$i").mkString(" "), "en", src, 0L) }
          .toDF("doc_id", "text", "lang", "source", "n_chars")
        val w = Window.partitionBy(col("source"))
          .orderBy(pmod(col("doc_id") * lit(3266489917L), lit(1000000L)), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val naive = df.select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
          .withColumn("before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
          .filter(col("before") < budget)
          .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
        val got = CurationQueries.tokenBudgetCut(df, budget, nb)
          .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
        assert(got == naive, s"budget=$budget nb=$nb docs=${docs.size}")
      }
    }
  }

  test("q129 funnel: monotone, stage-3 equals q75's keep count, final bounded by distinct texts") {
    val r = run("q129_curation_funnel").collect().head
    val Seq(raw, len, stop, rep, fin) =
      Seq("n_raw", "n_len_ok", "n_stop_ok", "n_rep_ok", "n_final").map(r.getAs[Long])
    assert(raw >= len && len >= stop && stop >= rep && rep >= fin)
    val q75Keep = run("q75_docs_quality_filter")
      .agg(sum(col("keep_flag"))).collect().head.getLong(0)
    assert(rep == q75Keep, s"funnel stage 3 ($rep) != q75 keep sum ($q75Keep)")
    val nTexts = Tables.documents(spark, sf0001).select("text").distinct().count()
    assert(fin <= nTexts)
    assert(raw == Tables.documents(spark, sf0001).count())
  }
}
