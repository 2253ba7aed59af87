package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream product analytics over the raw `events` table — the
  * funnel/cohort queries an analytics user runs beside the market ops
  * (the reference's event model is the same (ts, type, value) record,
  * /root/reference/timeseries_db.hpp:19-24; these are the standard
  * aggregations over it that don't fit a per-symbol window).
  *
  * Scale posture: everything here aggregates or joins on `user_id`, so
  * all stages share one hash partitioning — AQE plans a single shuffle
  * of (user_id, timestamp) pairs and reuses it across the staged
  * semi-joins; event payloads never move.
  */
object EventAnalytics {

  /** Ordered conversion funnel view → click → purchase: a user counts
    * at a stage only if that stage's first qualifying event is at or
    * after their previous stage's. Staged min-aggregations (each one
    * shuffle on user_id) instead of a self-join per step — at 100 TB
    * each stage input is the (already tiny) per-user timestamp table,
    * not the event log.
    */
  def funnel(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = events.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") >= col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val p = events.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") >= col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
      .select(col("n_view"), col("n_click"), col("n_purchase"),
        round(col("n_click").cast("double") / col("n_view").cast("double"), 6)
          .as("view_to_click"),
        round(col("n_purchase").cast("double") / col("n_click").cast("double"), 6)
          .as("click_to_purchase"))
  }

  /** Day-N cohort retention: cohort = a user's first active day;
    * n_users = distinct users from that cohort active `day_offset`
    * days later (capped). The (user, day) activity table is distinct
    * first, so the cohort join and the final count-distinct run over
    * ~|users|·|active days| rows, never raw events.
    */
  def retention(events: DataFrame, maxDays: Int = 7): DataFrame = {
    val days = events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohort = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    days.join(cohort, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset") <= maxDays)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }
}
