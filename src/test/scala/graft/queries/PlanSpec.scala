package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, sf0001}

/** Plan-shape assertions: correctness says what a query returns; these pin
  * HOW it executes — pushdown reaching the parquet scan, broadcast joins
  * for dims, single-pass DQ, codegen coverage. A regression here is a
  * silent 100x at scale even when every oracle still matches.
  */
class PlanSpec extends AnyFunSuite {

  private def plan(name: String): String =
    Registry.byName(name).fn(spark, sf0001).queryExecution.executedPlan.toString

  /** Plan string AFTER execution — AQE finalizes subplans (and codegen
    * annotations) only once the query runs.
    */
  private def finalPlan(name: String): String = {
    val df = Registry.byName(name).fn(spark, sf0001)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter predicates are pushed into the parquet scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_quantity,48.0)"), p)
    // projection pruning: scan reads only the referenced columns
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_tax"), "scan should not read unused columns")
  }

  test("q04: small dim join is a broadcast-hash join, no shuffle of the fact side") {
    val p = plan("q04_brand_volume")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q19: single-pass DQ — exactly one scan of events feeds all rule counts") {
    val p = plan("q19_events_dq_summary")
    val scans = "FileScan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 scan, plan:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("q79: props is parsed into a variant exactly once, shared by both extractions") {
    // the staged projection must survive optimization: CollapseProject
    // keeps a non-cheap alias referenced more than once, so a regression
    // to inline parse_json-per-field shows up as 2 parses here (r6 bench
    // measured the double parse at ~2x the query's runtime)
    val opt = Registry.byName("q79_events_variant").fn(spark, sf0001)
      .queryExecution.optimizedPlan
    // count parse invocations STRUCTURALLY: the optimizer rewrites
    // parse_json to a StaticInvoke of VariantExpressionEvalUtils — a
    // substring match on the rendered plan was brittle against renderer
    // renames and tryParseJson-style near-misses (r7 advisor)
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    val parses = opt.collect { case pl =>
      pl.expressions.flatMap(_.collect {
        case si: StaticInvoke
          if si.staticObject.getName.contains("VariantExpressionEvalUtils") &&
            si.functionName.startsWith("parseJson") => si
      })
    }.flatten.length
    assert(parses == 1, s"expected exactly 1 variant parseJson, got $parses:\n$opt")
    val p = opt.toString
    assert("variant_get".r.findAllIn(p).length == 2, p)
  }

  test("q01: grouped agg runs as two-phase hash aggregation under codegen") {
    val p = finalPlan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p) // partial + final
    assert(p.contains("*(1)"), s"no whole-stage-codegen span markers:\n$p")
  }

  test("q06/q07: EXISTS and NOT EXISTS plan as semi/anti joins") {
    assert(plan("q06_customers_with_orders").contains("LeftSemi"),
      plan("q06_customers_with_orders"))
    assert(plan("q07_customers_without_orders").contains("LeftAnti"),
      plan("q07_customers_without_orders"))
  }

  test("q14: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("q14_top20_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q29: the 1-row query side of cosine top-k is broadcast") {
    val p = plan("q29_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q126: NOT IN plans as a NULL-AWARE anti join, not a plain LeftAnti") {
    val p = plan("q126_not_in_null_aware")
    // BroadcastHashJoinExec prints its isNullAwareAntiJoin flag as the bare
    // trailing boolean ("LeftAnti, BuildRight, true"); a plain anti join
    // (wrong under NULLs) prints no trailing true, a nested-loop fallback
    // (wrong at scale) is a different node entirely
    assert(p.contains("LeftAnti, BuildRight, true"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q143: the unhinted decontam join still ends as a broadcast hash join when a side is small") {
    // the join is deliberately UNHINTED (an in-corpus eval split grows
    // with the corpus — ScaleGuardSpec forbids force-broadcasting it);
    // this pins the other half of the contract: the size-based pick
    // (static estimate or AQE runtime stats) still lands a broadcast
    // hash join of whichever side is small — in production the MB-scale
    // benchmark side, so the exploded train grams never shuffle-join.
    // Run at sf0.01: at sf0.001 the query's result is EMPTY and AQE's
    // empty-relation propagation collapses the final plan, hiding the
    // join. Unwrap to the FINAL adaptive plan so the assertion cannot
    // accidentally match the initial (pre-AQE) tree.
    val df = Registry.byName("q143_eval_decontam").fn(spark, "/root/testdata/sf0.01")
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case other => other.toString
    }
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q145: the fixed anchor batch is the broadcast side; corpus never shuffle-joins") {
    // the anchor side is a CONSTANT-size training batch (vec_id < 32),
    // so the label-mismatch join must plan as a broadcast nested-loop
    // with the batch as build side — the corpus scans once, no
    // SortMergeJoin/shuffle of the embedding table for the join
    val p = plan("q145_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q146: both retrieval legs cut with TakeOrderedAndProject before ranking") {
    // each leg's top-FuseDepth is a TakeOrdered (partial per-partition
    // top-k + driver merge), NOT a global sort; the rank windows then
    // run on constant-size frames
    val p = plan("q146_rrf_hybrid")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, p)
  }

  test("q149: the banded-Hamming join never carries the media payload") {
    // features detach from bytes at the hash projection: the band join's
    // exchange shuffles slim (id, hash, band, key) rows — the binary
    // `media` column must not appear in any exchange output.
    // AQE is OFF for this inspection: at sf0.001 the corpus has no
    // byte-level duplicates, so the (correctly) empty result lets AQE
    // collapse the adaptive plan to EmptyRelation and the exchanges
    // vanish from the executed tree — the static plan is the one that
    // carries the shape under test. (Before the r11 stubHash64 length
    // fix, sf0.001 "pairs" existed only as short-payload hash collisions
    // — the advisor's false-positive finding; at sf0.1 the query now
    // returns exactly the 8 true duplicate pairs.)
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allNodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allNodes(q.plan)
        case _ => Nil
      })
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val exchanges =
      try {
        // plan INSIDE the conf window — executedPlan is lazy and reads
        // the session conf at planning time
        val plan = Registry.byName("q149_media_phash_neardup").fn(spark, sf0001)
          .queryExecution.executedPlan
        allNodes(plan).collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(exchanges.nonEmpty)
    // the ONE exchange allowed to move bytes is Par.fanOut's round-robin
    // repartition before the decode (local-mode parallelism guard — a
    // no-op at scale where scans arrive pre-partitioned); every KEYED
    // exchange downstream of the hash projection must be payload-free
    exchanges.foreach { e =>
      val roundRobin = e.outputPartitioning
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning]
      assert(roundRobin || !e.output.map(_.name).contains("media"),
        s"media payload in keyed exchange: ${e.output.map(_.name)}")
    }
    assert(exchanges.exists(e => !e.outputPartitioning
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning]))
  }
}
