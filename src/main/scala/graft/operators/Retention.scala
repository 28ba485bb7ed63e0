package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention: group users by the week of their first event (the
  * cohort) and count how many are still active k weeks later — the
  * canonical product-analytics triangle, and for a training-data
  * pipeline the freshness/engagement report behind data-mixture
  * decisions.
  *
  * Plan shape: one narrow week-bucket projection, one (user)-keyed
  * aggregate for the cohort assignment, one distinct over
  * (user, week), one join back on user, one final (cohort, offset)
  * aggregate — every exchange is keyed on user ids or the small
  * (cohort, offset) domain; the user-keyed join broadcasts nothing and
  * scales with users, not events.
  */
object Retention {

  private val WeekSec = 604800L

  /** `(cohort_week_s, week_offset, n_users)` — epoch-second UTC week
    * buckets; `n_users` = distinct cohort members active that week
    * (offset 0 row = cohort size). */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val weeks = events.select(col(userCol).as("user_id"),
        (col(tsCol).cast("long") - pmod(col(tsCol).cast("long"), lit(WeekSec)))
          .as("week"))
      .distinct()
    val cohorts = weeks.groupBy("user_id").agg(min(col("week")).as("cohort_week_s"))
    weeks.join(cohorts, "user_id")
      .select(col("cohort_week_s"),
        ((col("week") - col("cohort_week_s")) / lit(WeekSec)).cast("long")
          .as("week_offset"))
      .groupBy("cohort_week_s", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
