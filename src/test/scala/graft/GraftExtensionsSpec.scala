package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.graftbridge.Bridge
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("extensions inject the as-of strategy and the hash functions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val strategies = Bridge.plannerStrategies(spark, ext)
    assert(strategies.contains(graft.plans.AsOfJoinStrategy))
    val reg = Bridge.registerFunctions(spark, ext)
    assert(reg.functionExists(FunctionIdentifier("graft_minhash")))
    assert(reg.functionExists(FunctionIdentifier("graft_simhash")))
  }
}
