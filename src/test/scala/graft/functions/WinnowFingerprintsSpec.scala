package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark
import graft.operators.TextAnalysis.winnowFingerprints

class WinnowFingerprintsSpec extends AnyFunSuite {

  /** Driver-side reference: DIRECT per-window polynomial hashes (no
    * rolling update) + naive window minima — catches rolling-update and
    * deque bugs in the expression's O(len) path.
    */
  private def reference(tokens: Seq[String], w: Int, v: Int): Seq[Long] = {
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    val th = tokens.map(fnv)
    val nW = math.max(th.size - w + 1, 1)
    val wh = (0 until nW).map(i => th.slice(i, i + w).foldLeft(0L)(_ * 1000003L + _))
    val nV = math.max(nW - v + 1, 1)
    (0 until nV).map(j => wh.slice(j, math.min(j + v, nW)).min).distinct.sorted
  }

  private def run(tokens: Seq[String], w: Int, v: Int): Seq[Long] = {
    import spark.implicits._
    Seq(Tuple1(tokens)).toDF("t")
      .select(winnowFingerprints(col("t"), w, v).as("fp"))
      .collect()(0).getSeq[Long](0)
  }

  test("matches a direct (non-rolling) recompute across sizes and boundaries") {
    val rnd = new scala.util.Random(11L)
    for (n <- Seq(1, 3, 47, 48, 49, 63, 64, 120, 400)) {
      val toks = Seq.fill(n)(s"t${rnd.nextInt(50)}")
      assert(run(toks, 48, 16) == reference(toks, 48, 16), s"n=$n")
      assert(run(toks, 3, 4) == reference(toks, 3, 4), s"n=$n small-w")
    }
  }

  test("short inputs: one window over all tokens, one winnow window over all hashes") {
    assert(run(Seq("a"), 48, 16).size == 1)
    assert(run(Seq("a", "b", "c"), 48, 16).size == 1)
    // 50 tokens -> 3 window hashes, still < v=16 -> exactly one minimum
    assert(run((1 to 50).map(i => s"x$i"), 48, 16).size == 1)
  }

  test("null token elements hash like empty tokens instead of crashing the task") {
    import spark.implicits._
    // arrays built from array(col...) are containsNull=true — split()
    // never produces this, but a library caller can
    val df = Seq((Some("a"), None: Option[String], Some("b")))
      .toDF("x", "y", "z")
      .select(winnowFingerprints(array(col("x"), col("y"), col("z")), 2, 2).as("fp"))
    val got = df.collect()(0).getSeq[Long](0)
    val viaEmpty = Seq(Tuple1(Seq("a", "", "b"))).toDF("t")
      .select(winnowFingerprints(col("t"), 2, 2).as("fp"))
      .collect()(0).getSeq[Long](0)
    assert(got == viaEmpty)
  }

  test("a shared w+v-1 run yields a shared fingerprint at any alignment") {
    val shared = (1 to 63).map(i => s"s$i") // w + v - 1 = 63
    val a = (1 to 17).map(i => s"a$i") ++ shared ++ (1 to 5).map(i => s"p$i")
    val b = (1 to 4).map(i => s"b$i") ++ shared ++ (1 to 29).map(i => s"q$i")
    val common = run(a, 48, 16).toSet intersect run(b, 48, 16).toSet
    assert(common.nonEmpty, "guaranteed shared fingerprint missing")
    // disjoint content shares nothing
    val c = (1 to 90).map(i => s"c$i")
    assert((run(a, 48, 16).toSet intersect run(c, 48, 16).toSet).isEmpty)
  }
}
