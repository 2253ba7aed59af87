package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{ExpandExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** r20 (the r19 verdict's #1): pin the plan shapes the r19 optimization
  * round won, so reverting any rewrite fails a spec instead of silently
  * re-shipping the old shape. Every count below matches the committed
  * AQE-final plans committed under plans/r19 (scan counts are
  * structural — SF-independent). The queries run against a PRIVATE
  * temp-parquet copy of sf0.001 so a concurrent suite's .cache() of the
  * shared tables can never swap InMemoryRelation in for the scans being
  * counted (the ScanReuseSpec rule).
  */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  // private copy of the sf0.001 table files — plan equality with any
  // other suite's reads of /root/testdata is impossible on these paths
  private lazy val sfCopy: String = {
    val dir = java.nio.file.Files.createTempDirectory("plan_shape_sf_")
    val src = java.nio.file.Paths.get(sf)
    Seq("events", "lineitem", "orders", "supplier", "nation",
        "customer", "documents").foreach { t =>
      java.nio.file.Files.copy(src.resolve(s"$t.parquet"),
        dir.resolve(s"$t.parquet"))
    }
    dir.toString
  }

  /** Execute and return the AQE-final plan section as text (the
    * `== Initial Plan ==` tail dropped) plus the executed plan tree.
    */
  private def finalPlan(name: String): (String, SparkPlan) = {
    val df: DataFrame = graft.SparkEntry.queries(name)(spark, sfCopy)
    df.collect()
    val text = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    (text, df.queryExecution.executedPlan)
  }

  private def scanCount(text: String): Int =
    "Scan parquet".r.findAllMatchIn(text).size

  /** AQE-aware traversal (the PlanAudit unwrap): descend into adaptive
    * wrappers and query stages, stop at ReusedExchange (shared subtree).
    */
  private def unwrap(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec => unwrap(q.plan)
      case r: ReusedExchangeExec => Seq(r)
      case other => Seq(other) ++ other.children.flatMap(unwrap)
    }
    here ++ p.subqueries.flatMap(unwrap)
  }

  test("q_funnel stays single-scan (r19: 5 events scans -> 1)") {
    assert(scanCount(finalPlan("q_funnel")._1) === 1)
  }

  test("q_window_funnel stays single-scan (r19: 4 -> 1)") {
    assert(scanCount(finalPlan("q_window_funnel")._1) === 1)
  }

  test("q15_top_supplier decodes lineitem once (r19: checkpointed revenue view)") {
    val (text, _) = finalPlan("q15_top_supplier")
    // supplier is the only parquet scan; both revenue consumers read
    // the checkpointed ExistingRDD
    assert(scanCount(text) === 1)
    assert("ExistingRDD".r.findAllMatchIn(text).size >= 2)
  }

  test("q_active_users reads the checkpointed activity table (r19: 3 scans -> 0)") {
    val (text, _) = finalPlan("q_active_users")
    assert(scanCount(text) === 0)
    assert(text.contains("ExistingRDD"))
  }

  test("q_top_terms decodes text once (r19: 3 scans -> 1 + checkpointed tf)") {
    val (text, _) = finalPlan("q_top_terms")
    assert(scanCount(text) === 1)
    assert("ExistingRDD".r.findAllMatchIn(text).size >= 2)
  }

  test("q_ltv_cohort scans orders once (r19: join-back -> window min)") {
    assert(scanCount(finalPlan("q_ltv_cohort")._1) === 1)
  }

  test("q_downsample keeps the two-scan chunked scaffold (r19: 3 -> 2)") {
    assert(scanCount(finalPlan("q_downsample")._1) === 2)
  }

  test("q_session_stats keeps the two-scan chunked pair (r19: 3 -> 2)") {
    assert(scanCount(finalPlan("q_session_stats")._1) === 2)
  }

  test("q_sessionize plan unchanged by the sessionizeWithTs split (2 scans)") {
    assert(scanCount(finalPlan("q_sessionize")._1) === 2)
  }

  test("q_basket_pairs has no join (r19: fact self-join -> per-order pair explode)") {
    val (text, plan) = finalPlan("q_basket_pairs")
    assert(scanCount(text) === 1)
    val nodes = unwrap(plan)
    val joins = nodes.count {
      case _: BroadcastHashJoinExec | _: SortMergeJoinExec |
           _: ShuffledHashJoinExec => true
      case _ => false
    }
    assert(joins === 0, "basket_pairs must not re-grow a self-join")
  }

  test("q_grouping_sets expands the 6-row pre-aggregate, not the fact rows") {
    val (text, plan) = finalPlan("q_grouping_sets")
    assert(scanCount(text) === 1)
    // the Expand must sit ABOVE a HashAggregate (r19: partial-aggregate
    // before the Expand; the old shape expanded every lineitem row x3)
    val expandsOverAgg = unwrap(plan).exists {
      case e: ExpandExec =>
        unwrap(e.child).exists(_.isInstanceOf[HashAggregateExec])
      case _ => false
    }
    assert(expandsOverAgg,
      "grouping-sets Expand must consume the pre-aggregated table")
  }
}
