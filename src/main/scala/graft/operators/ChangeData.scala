package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** CDC-style merge-on-read: reconcile a base snapshot with an update
  * stream so readers see exactly one (the newest) version per key —
  * the query-side half of an upsert, the same mechanism the reference's
  * `sync()`+rewrite cycle provides physically
  * (/root/reference/timeseries_db.hpp:52).
  *
  * Spark-first shape: UNION ALL the two sides, then keep the top row
  * per key by version rank. Spark rewrites the rank-1 filter into
  * WindowGroupLimit, so each shuffle partition retains only its best
  * row per key before the final window — the reduce side never holds a
  * key's full history. One shuffle on the key; at 100 TB the update
  * side is typically ≪ the base, and partial limits mean the shuffle
  * carries ~|keys| rows, not |base|+|updates|.
  */
object ChangeData {
  private val dec = DecimalType(18, 2)

  /** Latest-version view over base ∪ updates, keyed by `event_id`.
    * Version order must be total per key (caller supplies distinct
    * versions); ties would make the merge nondeterministic.
    */
  def mergeLatest(base: DataFrame, updates: DataFrame): DataFrame = {
    val all = base.withColumn("version", lit(1))
      .unionByName(updates.withColumn("version", lit(2)))
    val w = Window.partitionBy("event_id").orderBy(desc("version"))
    all.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Post-merge audit rollup: per symbol, surviving row count, exact
    * price total, and how many rows the update stream replaced —
    * the small, oracle-checkable surface of the merge.
    */
  def mergeAudit(base: DataFrame, updates: DataFrame): DataFrame =
    mergeLatest(base, updates)
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("price").cast(dec)).cast("double").as("price_sum"),
        sum(when(col("version") === 2, 1L).otherwise(0L)).as("n_updated"))
      .orderBy("symbol")

  /** NEW r14: SCD Type-2 history build from a change log — the other
    * half of the warehouse upsert story beside [[mergeLatest]]'s
    * type-1 "latest wins": per business key (user), consecutive
    * same-state events COLLAPSE (a type-2 row opens only on CHANGE),
    * and each surviving row carries its validity interval
    * [valid_from, valid_to) with the current row open-ended. One lag
    * window drops no-op changes, one lead window over the survivors
    * closes the intervals — both partitioned on the high-cardinality
    * user_id, epoch-µs integers throughout (oracle-exact).
    */
  def scd2(events: DataFrame): DataFrame = {
    val uo = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val changes = events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("state"))
      .withColumn("prev", lag(col("state"), 1).over(uo))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
    changes
      .withColumn("valid_from_us", unix_micros(col("ts")))
      .withColumn("valid_to_us", lead(unix_micros(col("ts")), 1).over(uo))
      .select(col("user_id"), col("event_id"), col("state"),
        col("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.cast("long").as("is_current"))
      .orderBy("user_id", "valid_from_us", "event_id")
  }
}
