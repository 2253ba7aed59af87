package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.plans.{AsOfJoinNode, AsOfJoinStrategy}

/** User-facing API for the native as-of join operator
  * ([[graft.plans.AsOfJoinExec]]). The composed variant
  * ([[MarketOps.asofJoin]]) stays as the pure-builtin formulation; this
  * one demonstrates the whole-operator path (logical node → strategy →
  * merge exec) and wins when the window formulation's
  * union-materialization overhead matters.
  */
object AsOf {
  /** As-of join `left` to the latest `right` row with the same `key`
    * and `right.ts <= left.ts`. Right-side columns come back suffixed
    * `_r`. Requires `key` and `ts` columns on both inputs.
    */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String = "ts"): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    // fresh attribute ids (and disjoint names) for the right side, so
    // self-joins over one lineage stay unambiguous
    val rRenamed = right.select(right.columns.map(c => col(c).as(c + "_r")).toSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rRenamed.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    Bridge.ofRows(spark, AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key + "_r"),
      attr(lPlan, ts), attr(rPlan, ts + "_r")))
  }
}
