package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{MinHashSig, SimHash64}
import graft.plans.{AsOfJoinStrategy, TimestampFilterPushdown}

/** Builder-time registration of everything graft adds to a session:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   .getOrCreate()
  * }}}
  *
  * or via config (no code changes):
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * Runtime fallbacks exist for sessions created without extensions:
  * [[graft.operators.AsOf.join]] injects the strategy through
  * `spark.experimental.extraStrategies`, and
  * [[graft.functions.GraftFunctions.register]] adds the SQL functions
  * to the live registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => TimestampFilterPushdown)
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(t) => MinHashSig(t, 3, 16)
          case Seq(t, n, k) => MinHashSig(t,
            n.eval(null).asInstanceOf[Number].intValue(),
            k.eval(null).asInstanceOf[Number].intValue())
          case other => throw new IllegalArgumentException(
            s"graft_minhash(text[, n, k]), got ${other.size} args")
        }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs.head)))
  }
}
