package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Shared zero-corpus-exchange plan walk (the StoredIndexSpec contract,
  * hoisted for the stored ANN/PQ index specs): every BUCKETED file scan
  * in the executed plan must reach its first join with no shuffle
  * exchange on the path — the stored-index promise that corpus rows flow
  * from disk into their joins re-using the written layout. Exchanges
  * higher up (over joined/aggregated batch-sized results) are the plan
  * working as intended, so the walk stops at the join.
  *
  * One principled exemption: a SinglePartition exchange UNDER A LIMIT
  * (the anchor-batch slice `filter(vec_id < b).limit(b)` — the
  * structural-bound fence) moves ≤ batch rows by construction; flagging
  * it would force dropping the fence ScaleGuardSpec requires.
  */
object PlanAssert {

  def assertZeroCorpusExchange(df: => DataFrame, minBucketedScans: Int): Unit = {
    val spark = SparkTestSession.spark
    // plain physical plan (AQE off) so the tree walk is direct; kill the
    // size-based broadcast pick so the walk proves the layout, not a
    // small-input lucky plan (explicit broadcast() hints survive).
    // Restore the values IN EFFECT BEFORE the call, not hard-coded
    // defaults (advisor r12): a suite configured differently must get its
    // own settings back.
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val savedBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = df.queryExecution.executedPlan
      def scanPaths(p: SparkPlan,
          anc: List[SparkPlan]): Seq[(FileSourceScanExec, List[SparkPlan])] =
        p match {
          case s: FileSourceScanExec if s.relation.bucketSpec.isDefined =>
            Seq((s, anc))
          case other => other.children.flatMap(c => scanPaths(c, other :: anc))
        }
      val found = scanPaths(plan, Nil)
      assert(found.size >= minBucketedScans,
        s"expected >= $minBucketedScans bucketed scans, got ${found.size}:\n$plan")
      found.foreach { case (scan, ancestors) =>
        val toJoin = ancestors.takeWhile(
          !_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
        val offending = toJoin.collect {
          case e: ShuffleExchangeExec
              if e.outputPartitioning !=
                org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
        }
        assert(offending.isEmpty,
          s"corpus-side exchange between ${scan.tableIdentifier} and its join:\n$plan")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }
}
