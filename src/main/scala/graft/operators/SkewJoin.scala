package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join on a skewed key sends every row of a hot key to one
  * reducer; AQE's skew-join split handles moderate skew, but a key
  * whose single partition exceeds executor memory needs salting: the
  * big side appends a deterministic salt in [0, n) (derived from any
  * uniformly-distributed column — NOT rand(), so retries/replays stay
  * consistent), the small side is exploded n×, and the join key
  * becomes (key, salt) — the hot key now spreads over n reducers. The
  * join result is exactly the unsalted join, so the operator is
  * oracle-checkable against the plain formulation.
  */
object SkewJoin {
  /** Join `big` with `small` on `key`, spreading each key across
    * `nSalts` reducers. `saltFrom` must be a deterministic
    * uniformly-distributed column of the big side (e.g. a row id).
    */
  def salted(big: DataFrame, small: DataFrame, key: String,
      saltFrom: Column, nSalts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(saltFrom, lit(nSalts)))
    val replicatedSmall = small.withColumn("_salt",
      explode(array((0 until nSalts).map(i => lit(i)): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
