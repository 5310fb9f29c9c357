package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.{Alias, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Filter, Generate, GlobalLimit, LocalLimit, LogicalPlan, Project, Repartition, RepartitionByExpression, ResolvedHint, Sort, SubqueryAlias, Union, Window => LogicalWindow}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.SparkTestSession.{spark, sf0001}

/** Scale guards over EVERY registered query: plan shapes that are fine at
  * sf0.01 but fatal at 100 TB must not creep in. Correctness tests can't
  * catch these — the answer stays right while the plan goes O(n²) or the
  * driver OOMs on a forced broadcast. A failure here means a new/edited
  * query needs a scale-safe rewrite or an explicit, documented exemption.
  */
class ScaleGuardSpec extends AnyFunSuite {

  /** Queries allowed to plan a cartesian/nested-loop join, with the reason
    * each one is bounded. Two legitimate classes: documented brute-force
    * oracle baselines (scale path exists as a separate query), and
    * cross-joins of provably tiny frames (1-row aggregates / single-vector
    * lookups) that Spark necessarily plans as BroadcastNestedLoopJoin.
    */
  private val nestedLoopExempt: Map[String, String] = Map(
    "q29_cosine_topk" -> "brute-force oracle baseline (scale paths: q37/q63)",
    "q33_emb_neardup_pairs" -> "brute-force oracle baseline (scale path: q70)",
    "q37_ann_topk" -> "cross-join of the 1-row query vector",
    "q63_ivf_topk" -> "cross-joins of the 1-row query vector / <=nProbe list ids",
    "q52_above_average_orders" -> "cross-join of a 1-row global-average aggregate",
    "q61_tfidf_top_terms" -> "cross-join of the 1-row corpus-size aggregate",
    "q66_dq_structural" -> "cross-joins of 1-row count aggregates",
    "q122_pq_adc_topk" -> "cross-join of the 1-row query vector (ADC scoring touches codes only)",
    "q123_ivfpq_topk" -> "cross-joins of the 1-row query vector / <=nProbe probed list ids",
    "q118_rolling_active_users" -> "cross-join of the 1-row max-observed-day aggregate (report-day cap)",
    "q130_temperature_sample" -> "cross-join of the 1-row (n_total, sum-of-weights) totals aggregate",
    "q131_bm25_topk" -> "cross-join of the 1-row corpus-stats (N, total-length) aggregate",
    "q132_dsir_importance" -> "cross-join of the 1-row token-totals aggregate into the 256-row bucket frame",
    "q133_bigram_lm_score" -> "cross-join of the 1-row distinct-vocab aggregate",
    "q141_drift_psi" -> "cross-join of the 1-row Laplace-smoothing totals aggregate into the nBuckets-row contingency frame",
    "q142_drift_ks" -> "cross-join of the 1-row (total_a, total_b) aggregate into the grid-bounded cumulative frame",
    "q145_hard_negatives" -> "non-equi (label-mismatch) join against the structurally bounded <=32-row anchor batch",
    "q152_ann_topk_batch" -> "non-equi (self-exclusion) join against the structurally bounded <=16-row anchor batch (brute-force oracle baseline; scale path: q153)",
    "q157_pq_adc_topk_batch" -> "non-equi (self-exclusion) codes-only join against the structurally bounded <=16-row anchor batch; re-rank joins broadcast the limit-bounded candidate set",
    "q159_pq_adc_topk_batch_stored" -> "q157's stored-index twin: the same non-equi codes-vs-anchor-LUT join, corpus side now the stored code table (still zero corpus-side exchange; PqSpec plan walk)",
    "q160_ivfpq_topk_stored" -> "q123's stored-index twin: cross-joins of the 1-row query-vector/LUT frame and <=nProbe probed list ids against the stored code table",
    "q146_rrf_hybrid" -> "cross-joins of the 1-row corpus-stats / query-vector frames (the q131/q29 legs)",
    "q148_nb_quality_classifier" -> "cross-joins of the 1-row model-totals and class-prior aggregates",
    "q151_nb_calibration" -> "q148's pipeline (same 1-row totals/prior cross-joins) plus a 4-row confusion aggregate",
    "q164_kmv_distinct" -> "cross-join of the 1-row merged-sketch aggregate with the 1-row global exact-distinct aggregate (the 'ALL' report row)",
    "q167_sq8_topk" -> "cross-joins of the 1-row per-dim stats frame and the single-vector quantized query (brute-force scoring baseline, q29's standing; scale path scores ANN candidates q37/q153)",
    "q168_sq8_topk_batch_stored" -> "non-equi (self-exclusion) codes-vs-anchor join against the structurally bounded <=16-row quantized anchor batch (the q159 stored-probe shape; corpus side is the stored code table)",
    "q169_bm25_topk_stored" -> "cross-join of the 1-row effective corpus-stats frame (q131's shape over the stored per-batch stat increments)",
    "q170_rrf_hybrid_stored" -> "cross-joins of the 1-row effective-stats / query-vector frames (q146's shape with the stored lexical leg)",
    "q171_bm25_stored_tombstoned" -> "cross-join of the 1-row effective-stats frame (stored increments minus the tombstoned docs' O(|deletions|) doclen aggregate)",
    "q173_bm25_batch_stored" -> "cross-join of the 1-row effective-stats frame (q169's shape; the query batch itself joins equi on token, broadcast literal)",
    "q174_rrf_hybrid_both_stored" -> "cross-joins of the 1-row effective-stats / stored-query-vector frames (q170's shape with the dense leg now also stored)",
    "q175_rrf_hybrid_batch_stored" -> "cross-join of the 1-row effective-stats frame plus the non-equi (self-exclusion) stored-vector join against the structurally bounded <=3-row anchor batch (the q152/q158 fence)")

  /** TPC-H tables whose cardinality is CONSTANT in the scale factor —
    * the only relations a query may force-broadcast unconditionally.
    */
  private val constantTables = Set("region", "nation")

  // Full-tree inspection: operators that SHARE a bounded intermediate via
  // a lazy checkpoint (OrderStats) would otherwise hide their fact-side
  // subtree behind a LogicalRDD leaf — this guard must see through to the
  // scans, so sharing is disabled for every plan built here (and the
  // off-switch also keeps plan construction from executing jobs).
  private def unshared[A](body: => A): A = {
    spark.conf.set("spark.graft.orderstats.share", "off")
    try body finally spark.conf.unset("spark.graft.orderstats.share")
  }

  private def analyzed(q: Q): LogicalPlan =
    unshared(q.fn(spark, sf0001).queryExecution.analyzed)

  private def physical(q: Q): String =
    unshared(q.fn(spark, sf0001).queryExecution.executedPlan.toString)

  /** Strip row-count-preserving (or per-row-bounded) wrappers so the
    * boundedness check applies at the subtree's effective ROOT. Generate is
    * included because every generator in this codebase fans out a bounded
    * literal range/slice per row — the source below it still has to pass.
    */
  @annotation.tailrec
  private def stripBenign(p: LogicalPlan): LogicalPlan = p match {
    case x: Project => stripBenign(x.child)
    case x: SubqueryAlias => stripBenign(x.child)
    case x: Sort => stripBenign(x.child)
    case x: Generate => stripBenign(x.child)
    case x: Repartition => stripBenign(x.child)
    case x: RepartitionByExpression => stripBenign(x.child)
    case x: ResolvedHint => stripBenign(x.child) // row-preserving annotation
    case _ => p
  }

  /** A forced-broadcast subtree is bounded iff its ROOT (modulo benign
    * wrappers) is a no-grouping (1-row) aggregate, a limit, a literal-key
    * lookup filter, or a scan touching only constant-cardinality tables.
    * Root-level matters: a 1-row aggregate buried somewhere under a join
    * with a fact table must NOT launder the whole subtree as bounded.
    * (A literal-equality filter can't prove key uniqueness statically —
    * it covers the single-vector lookups here; non-key equality filters
    * on facts still need a manual look.)
    */
  /** Columns whose domain is a CONSTANT of the data model even though they
    * are not enum strings: `dim` is a posexplode position over fixed-width
    * embedding vectors, so an aggregate grouped only by it yields at most
    * |embedding width| rows regardless of input size (q103 broadcasts the
    * 64-row per-dim means back against the full table — the correct
    * two-pass shape); `lang` is an ISO language code, bounded by the
    * world's ~200 languages however large the corpus grows (q114
    * broadcasts the per-language repeat factors — the dimension side of
    * epoch mixing); `event_type` is a closed event-taxonomy code (q117
    * and its sketch scale path q120 broadcast the ≤|taxonomy|-row
    * p99-threshold frame back against the full event stream — the
    * fit-then-apply two-pass shape; q117's exact percentile FIT is the
    * oracle baseline, q120's approx_percentile fit is the 100 TB form,
    * the q46→q68 pairing). Keep this list short and physical: a key
    * belongs here
    * only if its cardinality is set by the SCHEMA or the physical world,
    * never by data volume. NOTE the asymmetry with enumCols: an AGGREGATE
    * on a bounded key is broadcast-safe (tiny output); a WINDOW
    * partitioned by one is the opposite (bounded parallelism) — the two
    * guards pull in opposite directions on purpose.
    */
  private val boundedAggCols = Set("dim", "lang", "event_type")

  private def isBoundedSubtree(p: LogicalPlan): Boolean = stripBenign(p) match {
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case a: Aggregate if a.groupingExpressions.nonEmpty &&
      a.groupingExpressions.forall(
        _.references.map(_.name).toSet.subsetOf(boundedAggCols)) &&
      // bounded ROW COUNT alone doesn't bound the broadcast: a
      // collect_list/collect_set over a bounded key still carries the
      // whole input in one row (r5 advisor). Require every output
      // column to be a scalar (no array/map/struct) so the frame is
      // fixed-width as well as fixed-height.
      a.aggregateExpressions.forall(e => e.dataType match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.StructType => false
        case _ => true
      }) => true
    case _: GlobalLimit | _: LocalLimit => true
    // a LocalRelation is driver-embedded constant data (plane/codebook
    // frames): its size is fixed at plan time and cannot grow with any
    // input — if it were too big to broadcast, the driver already failed
    case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
    // a join of two bounded subtrees is bounded (output <= product of two
    // constants): the q37 shape — 1-row literal-key lookup x 32-row
    // planes frame. An unbounded side still fails its own recursion.
    case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
      isBoundedSubtree(j.left) && isBoundedSubtree(j.right)
    case f: Filter if f.condition.exists {
      // literal may sit under a cast — foldable covers both
      case EqualTo(a, b) => a.foldable || b.foldable
      case _ => false
    } => true
    case other =>
      val tables = other.collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.map(_.getName.stripSuffix(".parquet")).toSet
          case _ => Set("<non-file-relation>")
        }
      }.flatten.toSet
      tables.nonEmpty && tables.subsetOf(constantTables)
  }

  /** Columns whose distinct-value count is a CONSTANT of the data model
    * (status/flag/enum codes), independent of the scale factor. A window
    * partitioned ONLY by such keys — or by nothing — funnels the whole
    * input through a handful of sort tasks at 100 TB, no matter how many
    * executors exist. Exact-result windows over them are allowed only as
    * documented oracle baselines whose 100 TB path is a fully-parallel
    * sketch (the q68 approx_percentile pattern).
    */
  private val enumCols = Set("l_returnflag", "l_linestatus", "o_orderstatus",
    "o_orderpriority", "c_mktsegment", "event_type", "lang")

  /** Names reserved for integral-division buckets of a domain-bounded
    * value (`v DIV W`): their cardinality is O(value-domain / W), set by
    * the data model, never by row count. The NAME alone proves nothing
    * (r7 advisor: q22 aliases `date_trunc` to `bucket`, and any
    * high-cardinality key could be renamed) — so the rule below demands
    * name AND structure: the key's defining expression must literally be
    * an IntegralDivide by a foldable width, traced through the plan's
    * alias definitions. The name requirement is kept on top of the
    * structural one as the convention fence: `user_id DIV 10` is
    * structurally a DIV but bucketing an UNBOUNDED domain — forcing the
    * author to alias it `bucket` to pass the guard makes that a visible,
    * reviewable claim instead of an accident.
    */
  private val histogramCols = Set("__bucket", "bucket")

  /** Is `e` structurally `x DIV <foldable>` (modulo casts/aliases)? If it
    * is an attribute, chase its defining Alias through the subtree's
    * Project/Aggregate/Window lists by exprId (bounded hops for alias-of-
    * alias chains).
    */
  private def isDivBucket(e: org.apache.spark.sql.catalyst.expressions.Expression,
      scope: LogicalPlan, hops: Int = 3): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, IntegralDivide}
    def strip(x: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.catalyst.expressions.Expression = x match {
      case Alias(c, _) => strip(c)
      case c: Cast => strip(c.child)
      case other => other
    }
    strip(e) match {
      case IntegralDivide(_, d, _) => d.foldable
      case at: Attribute if hops > 0 =>
        val defn = scope.collectFirst(Function.unlift { p =>
          val named = p match {
            case pr: Project => pr.projectList
            case ag: Aggregate => ag.aggregateExpressions
            case w: LogicalWindow => w.windowExpressions
            case _ => Nil
          }
          named.collectFirst { case al: Alias if al.exprId == at.exprId => al.child }
        })
        defn.exists(d => isDivBucket(d, scope, hops - 1))
      case _ => false
    }
  }

  /** A window partitioned only by bounded keys is scale-safe — no exemption
    * needed — when it runs over PRE-AGGREGATED histogram rows: its input is
    * an aggregate (or distinct, or union of such) whose grouping keys are a
    * STRICT superset of the window partition keys, with every extra key a
    * declared histogram bucket column. Each sort task then handles
    * O(domain / bucketWidth) rows regardless of input scale (the q89 /
    * OrderStats shape). Row-preserving wrappers, filters, and stacked
    * windows pass through; anything else — a window straight over fact
    * rows — fails, so reverting q46/q78 to enum-partitioned fact-row
    * windows trips this test loudly.
    */
  private def histogramInput(winParts: Set[String])(p: LogicalPlan): Boolean = {
    // keys == winParts is also safe: the aggregate emits at most one row
    // per window partition, so the "sort" is over ≤1 row — requiring a
    // STRICT superset would force spurious exemptions for per-group
    // share-of-total windows over enum aggregates.
    //
    // Every EXTRA key (finer than the window partition) must be a bucket
    // by name AND by structure: `(name, expr, scope)` triples are checked
    // so an imposter — any expression merely ALIASED `bucket`, e.g. q22's
    // `date_trunc AS bucket` or a renamed natural key — no longer
    // launders the window (the r7 name-only hole).
    def finerBounded(keys: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
        scope: LogicalPlan): Boolean = {
      val names = keys.map(_._1).toSet
      winParts.subsetOf(names) &&
        keys.filterNot(k => winParts.contains(k._1)).forall { case (n, e) =>
          histogramCols.contains(n) && isDivBucket(e, scope)
        }
    }
    stripBenign(p) match {
      case a: Aggregate =>
        // a computed grouping key (`cents DIV 10000 AS bucket`, q89) is
        // known by its OUTPUT name — that's the column the histogram is
        // keyed on. CleanupAliases strips aliases from groupingExpressions
        // in the analyzed plan, so recover the name from the semantically
        // equal entry in the output list; plain keys fall back to refs.
        // The structural check gets the grouping expression itself plus
        // the aggregate's CHILD as the alias-resolution scope.
        finerBounded(a.groupingExpressions.flatMap { g =>
          a.aggregateExpressions.collectFirst {
            case al: Alias if al.child.semanticEquals(g) => Seq(al.name)
            case at: org.apache.spark.sql.catalyst.expressions.Attribute
              if at.semanticEquals(g) => Seq(at.name)
          }.getOrElse(g.references.map(_.name).toSeq)
            .map(n => (n, g))
        }, a.child)
      case d: Deduplicate =>
        finerBounded(
          d.keys.flatMap(k => k.references.map(r => (r.name, k: org.apache.spark.sql.catalyst.expressions.Expression))),
          d.child)
      case u: Union => u.children.forall(histogramInput(winParts))
      case w: LogicalWindow => histogramInput(winParts)(w.child)
      case f: Filter => histogramInput(winParts)(f.child)
      // a LIMIT bounds the window input to a plan-time constant: ranking
      // a TakeOrdered top-k frame (q146's RRF legs) is a constant-size
      // sort whatever the corpus size — same standing as a histogram
      case _: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit |
           _: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => true
      case _ => false
    }
  }

  /** Exact-result fact-row windows over bounded keys are allowed only as
    * documented oracle baselines whose 100 TB path is a separate query
    * (the q46->q68 pattern). Currently EMPTY: every registered bounded-key
    * window is histogram-shaped (see histogramInput) — q46/q78 route
    * through OrderStats' bucketed prefix sums and q89 windows its own
    * pre-bucketed histogram. Kept as the documented fence for any future
    * baseline that genuinely must sort fact rows through an enum key.
    */
  private val boundedWindowExempt: Map[String, String] = Map.empty

  test("windows partitioned only by bounded-cardinality keys are histogram-shaped or documented baselines") {
    val offenders = Registry.all.flatMap { q =>
      val wins = analyzed(q).collect { case w: LogicalWindow => w }
      wins.flatMap { w =>
        val refs = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
        val bounded = w.partitionSpec.isEmpty || refs.subsetOf(enumCols)
        if (bounded && !histogramInput(refs)(w.child) &&
          !boundedWindowExempt.contains(q.name)) Some((q.name, refs))
        else None
      }
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, refs) =>
        s"$n windows fact rows over bounded keys ${refs.mkString("{", ",", "}")} — a full-table sort through <=|enum| tasks at scale; pre-aggregate to a histogram (OrderStats / q89 shape) or document the exemption"
      }.mkString("\n"))
  }

  test("histogram rule self-test: fact-row and high-card-key windows rejected, bucket histograms accepted") {
    // guard-of-the-guard: the structural rule replaced per-query exemption
    // strings, so prove on synthetic plans that it still rejects the two
    // shapes the old test existed to catch, and accepts only the q89 one.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, expr, sum}
    val facts = Seq(("A", 1L, 10L)).toDF("l_returnflag", "user_id", "v")
    def winsOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect { case x: LogicalWindow => x }
    val enumW = Window.partitionBy(col("l_returnflag"))

    // 1. window straight over fact rows: the 100 TB full-sort-through-
    //    |enum|-tasks shape — must be rejected
    val factWin = facts.withColumn("s", sum(col("v")).over(enumW.orderBy(col("v"))))
    assert(winsOf(factWin).nonEmpty)
    winsOf(factWin).foreach(x =>
      assert(!histogramInput(Set("l_returnflag"))(x.child), "fact-row window laundered"))

    // 2. aggregate grouped by (enum, high-card key): bounded partition
    //    COUNT but fact-sized rows per partition — the extra key is not a
    //    declared bucket column, must be rejected
    val byUser = facts.groupBy(col("l_returnflag"), col("user_id"))
      .agg(sum(col("v")).as("s"))
      .withColumn("r", sum(col("s")).over(enumW.orderBy(col("user_id"))))
    winsOf(byUser).foreach(x =>
      assert(!histogramInput(Set("l_returnflag"))(x.child), "high-card agg laundered"))

    // 3. the accepted q89 shape: aggregate keyed (enum, v DIV W bucket),
    //    rows per window partition bounded by the value domain
    val hist = facts.groupBy(col("l_returnflag"), expr("v DIV 10").as("bucket"))
      .agg(sum(col("v")).as("s"))
      .withColumn("r", sum(col("s")).over(enumW.orderBy(col("bucket"))))
    val histWins = winsOf(hist)
    assert(histWins.nonEmpty)
    histWins.foreach(x =>
      assert(histogramInput(Set("l_returnflag"))(x.child), "bucket histogram rejected"))

    // 4. aggregate keyed EXACTLY by the partition keys: ≤1 row per window
    //    partition (share-of-total shape) — also accepted, no exemption
    val share = facts.groupBy(col("l_returnflag")).agg(sum(col("v")).as("s"))
      .withColumn("tot", sum(col("s")).over(enumW))
    winsOf(share).foreach(x =>
      assert(histogramInput(Set("l_returnflag"))(x.child), "equal-keys agg rejected"))

    // 5. IMPOSTERS named `bucket` (the r7 laundering hole): the extra key
    //    carries the blessed name but is NOT structurally `x DIV literal`
    //    — a date_trunc alias (the q22 shape: partition count grows with
    //    the data's time span) and a renamed high-card natural key. Both
    //    must be rejected on structure.
    val tfacts = Seq(("A", 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("l_returnflag", "user_id", "ts")
    val truncImposter = tfacts
      .groupBy(col("l_returnflag"), expr("date_trunc('hour', ts)").as("bucket"))
      .agg(sum(col("user_id")).as("s"))
      .withColumn("r", sum(col("s")).over(enumW.orderBy(col("bucket"))))
    assert(winsOf(truncImposter).nonEmpty)
    winsOf(truncImposter).foreach(x =>
      assert(!histogramInput(Set("l_returnflag"))(x.child),
        "date_trunc aliased 'bucket' laundered"))
    val renameImposter = facts.withColumn("bucket", col("user_id"))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(sum(col("v")).as("s"))
      .withColumn("r", sum(col("s")).over(enumW.orderBy(col("bucket"))))
    assert(winsOf(renameImposter).nonEmpty)
    winsOf(renameImposter).foreach(x =>
      assert(!histogramInput(Set("l_returnflag"))(x.child),
        "renamed natural key laundered"))

    // 6. and the blessed name on a REAL bucket defined one projection
    //    below the aggregate (the OrderStats withColumn shape — attribute
    //    key traced to its Alias(x DIV W) definition) is still accepted
    val staged = facts.withColumn("bucket", expr("v DIV 10"))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(sum(col("v")).as("s"))
      .withColumn("r", sum(col("s")).over(enumW.orderBy(col("bucket"))))
    assert(winsOf(staged).nonEmpty)
    winsOf(staged).foreach(x =>
      assert(histogramInput(Set("l_returnflag"))(x.child),
        "staged DIV bucket rejected"))
  }

  test("no registered query plans a CartesianProduct") {
    val offenders = Registry.all.filter(q => physical(q).contains("CartesianProduct"))
    assert(offenders.isEmpty,
      s"cartesian product in: ${offenders.map(_.name).mkString(", ")}")
  }

  test("BroadcastNestedLoopJoin only in documented baselines / 1-row cross-joins") {
    val offenders = Registry.all.filter { q =>
      physical(q).contains("BroadcastNestedLoopJoin") && !nestedLoopExempt.contains(q.name)
    }
    assert(offenders.isEmpty,
      s"undocumented nested-loop join in: ${offenders.map(_.name).mkString(", ")}")
  }

  test("forced broadcast hints only ever wrap bounded-size inputs") {
    val offenders = Registry.all.flatMap { q =>
      val hints = analyzed(q).collect { case h: ResolvedHint => h }
      hints.filterNot(h => isBoundedSubtree(h.child)).map(h => (q.name, h))
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, h) =>
        s"$n force-broadcasts an unbounded subtree:\n${h.child.toString.take(500)}"
      }.mkString("\n"))
  }
}
