package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark

/** Property-based coverage (SURVEY §5): the reference's implicit invariants
  * made explicit and fuzzed.
  */
class PropertySpec extends AnyFunSuite {

  /** Minimal forAll over ScalaCheck generators (the scalatest-scalacheck
    * bridge artifact isn't in the offline cache).
    */
  private def forAll[A](gen: Gen[A], n: Int = 30)(body: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed0)(_.next).take(n).foreach { seed =>
      gen.apply(Gen.Parameters.default, seed).foreach(body)
    }
  }

  test("name normalization is idempotent and produces identifier-safe names") {
    forAll(Gen.asciiPrintableStr) { s =>
      val once = BronzeIngest.normalizeName(s)
      assert(BronzeIngest.normalizeName(once) == once)
      assert(!once.contains(" "))
      assert(once == once.toLowerCase)
    }
  }

  test("DQ algebra holds on generated data: clean + violating == total, single-pass == per-rule") {
    import spark.implicits._
    val rowGen = for {
      v  <- Gen.oneOf(Gen.choose(-100.0, 500.0).map(Option(_)), Gen.const(Option.empty[Double]))
      u  <- Gen.oneOf(Gen.choose(0L, 20L).map(Option(_)), Gen.const(Option.empty[Long]))
      et <- Gen.oneOf("view", "click", "error", "purchase")
    } yield (v, u, et)
    forAll(Gen.listOfN(60, rowGen), n = 8) { rows =>
      val df = rows.toDF("value", "user_id", "event_type")
      val rules = DqChecks.eventRules(DqThresholds())
      val report = DqChecks.evaluate(df, rules)
      rules.foreach { r =>
        assert(report.results.find(_.name == r.name).get.violations ==
          df.filter(r.predicate).count())
      }
      val anyViolation = rules.map(_.predicate).reduce(_ || _)
      assert(DqChecks.clean(df, rules).count() + df.filter(anyViolation).count() ==
        rows.size.toLong)
    }
  }

  test("inbox bucketing partitions the input for any batch count") {
    import spark.implicits._
    val df = (1L to 97L).map(i => (i, s"v$i")).toDF("event_id", "x")
    Seq(1, 2, 5, 8).foreach { n =>
      val bucketed = graft.streaming.InboxGenerator.bucket(df, "event_id", n)
      val sizes = bucketed.groupBy("__batch").count().collect()
        .map(r => r.getAs[Int]("__batch") -> r.getAs[Long]("count")).toMap
      assert(sizes.keys.toSet == (0 until n).toSet)
      assert(sizes.values.sum == 97L)
      // ntile: sizes differ by at most 1
      assert(sizes.values.max - sizes.values.min <= 1)
    }
  }

  test("PII scrub leaves no residual matches on fuzzed text with injected PII") {
    import spark.implicits._
    import graft.operators.TextAnalysis._
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val piiGen = Gen.oneOf(
      word.map(w => s"$w@example.com"),
      Gen.choose(0, 255).map(o => s"192.168.$o.$o"),
      Gen.choose(1000000L, 999999999L).map(n => s"+$n"))
    val docGen = for {
      words <- Gen.listOfN(8, word)
      pii <- Gen.listOfN(2, piiGen)
      all <- Gen.const(new scala.util.Random(7).shuffle(words ++ pii))
    } yield all.mkString(" ")
    forAll(Gen.listOfN(20, docGen), n = 5) { texts =>
      val df = texts.toDF("text")
        .select(
          scrubPii(col("text")).as("scrubbed"),
          (piiCount(col("text"), emailRe) + piiCount(col("text"), ipRe) +
            piiCount(col("text"), phoneRe)).as("n_before"))
      val rows = df.collect()
      // every doc had injected PII, every scrubbed doc has none
      assert(rows.forall(_.getAs[Long]("n_before") >= 1L))
      val residual = df
        .select((piiCount(col("scrubbed"), emailRe) + piiCount(col("scrubbed"), ipRe) +
          piiCount(col("scrubbed"), phoneRe)).as("n_after"))
        .agg(sum(col("n_after"))).collect()(0).getLong(0)
      assert(residual == 0L, s"residual PII after scrub: $residual")
    }
  }

  test("train/val/test split is total, deterministic, and in declared proportions") {
    val docs = graft.Tables.documents(spark, graft.SparkTestSession.sf0001)
    val q = graft.queries.Registry.byName("q73_docs_train_split")
    val rows = q.fn(spark, graft.SparkTestSession.sf0001).collect()
    assert(rows.length == docs.count())
    val byId = rows.map(r => r.getLong(0) -> r.getString(2)).toMap
    // deterministic: a second evaluation assigns identically
    val again = q.fn(spark, graft.SparkTestSession.sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId == again)
    val counts = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // 90/5/5 within a loose tolerance (multiplicative hash, not exact strata)
    assert(counts("train") > rows.length * 8 / 10)
    // every bucket in [0, 100)
    assert(rows.forall { r => val b = r.getLong(1); b >= 0 && b < 100 })
  }

  test("near-dup thresholds are monotonic: higher threshold yields a subset of pairs") {
    val docs = graft.Tables.documents(spark, graft.SparkTestSession.sf0001)
    val loose = graft.operators.Dedup.shingleJaccardPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tight = graft.operators.Dedup.shingleJaccardPairs(docs, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(loose))
  }
}
