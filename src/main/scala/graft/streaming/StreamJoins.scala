package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with watermark-bounded state: the streaming
  * counterpart of RangeJoin's point-in-interval (q16's signup→click
  * attribution window, continuously).
  *
  * State posture: both sides are watermarked and the join condition
  * bounds the event-time distance, so Spark evicts buffered rows once
  * the watermark passes `ts + window` — state is O(events within the
  * lateness+window horizon), never unbounded.
  */
object StreamJoins {

  /** Clicks attributed to the signup of the same user within
    * `windowExpr` (e.g. "1 hour") after the signup, as a continuous
    * stream-stream inner join.
    *
    * @param signups streaming DataFrame with (user_id, ts, event_id)
    * @param clicks  streaming DataFrame with (user_id, ts, event_id)
    */
  def attributedClicks(
      signups: DataFrame,
      clicks: DataFrame,
      windowExpr: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame = {
    val s = signups.withWatermark("ts", lateness)
      .select(col("user_id"), col("ts").as("signup_ts"),
        col("event_id").as("signup_id"))
    val c = clicks.withWatermark("ts", lateness)
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    s.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("signup_ts") &&
        col("click_ts") <= col("signup_ts") + expr(s"interval $windowExpr"))
      .select("user_id", "signup_id", "click_id", "signup_ts", "click_ts")
  }
}
