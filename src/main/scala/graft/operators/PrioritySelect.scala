package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Priority-ranked top-1 per category — the reference's one "interesting"
  * selection operator (R1, ref: lambda/zoom_webhook/handler.py:18-36).
  *
  * The reference keeps 4 ordered preference lists (video / transcript /
  * chat / poll) and, per category, emits the FIRST file type present
  * (`break` at handler.py:34); duplicate file_types resolve
  * last-write-wins via the dict build (handler.py:26).
  *
  * Spark-first formulation: explode the preference lists into a tiny
  * priority table (category, value, pref_rank), broadcast-inner-join it to
  * the data on the value column, then `row_number() over (partition by
  * grouping-keys + category order by pref_rank, tieBreak) = 1`. The
  * priority table is rows-not-code, so Catalyst broadcasts it (the O(1)
  * hash probe of handler.py:26 becomes a broadcast hash join).
  */
object PrioritySelect {

  /** Build the priority table from ordered preference lists. */
  def priorityTable(
      spark: SparkSession,
      prefs: Map[String, Seq[String]]): DataFrame = {
    import spark.implicits._
    prefs.toSeq.sortBy(_._1)
      .flatMap { case (cat, vals) =>
        vals.zipWithIndex.map { case (v, i) => (cat, v, i + 1) }
      }
      .toDF("category", "value", "pref_rank")
  }

  /** Per (groupCols × category) top-1 under the priority ranking.
    *
    * @param data      rows to select from
    * @param priority  (category, value, pref_rank) table
    * @param valueCol  column of `data` matched against `value`
    * @param groupCols extra partition columns (e.g. meeting uuid)
    * @param tieBreak  deterministic tie-break among rows with the same
    *                  matched value (the reference is last-write-wins on
    *                  arrival order; pass an arrival column descending)
    */
  def top1ByPriority(
      data: DataFrame,
      priority: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      tieBreak: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val joined = data.join(
      broadcast(priority),
      data(valueCol) === priority("value"),
      "inner")
    val parts = (groupCols.map(data(_)) :+ priority("category"))
    val w = Window
      .partitionBy(parts: _*)
      .orderBy(priority("pref_rank").asc +: tieBreak: _*)
    joined
      .withColumn("__graft_rn", row_number().over(w))
      .where(col("__graft_rn") === 1)
      .drop("__graft_rn", "value", "pref_rank")
  }
}
