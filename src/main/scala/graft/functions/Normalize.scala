package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-level normalization functions (SURVEY §2.2) — all built-in Catalyst
  * expressions, no UDFs (codegen stays whole-stage).
  */
object Normalize {

  /** T1: ISO-8601 'Z'-suffixed string → UTC timestamp; invalid → NULL
    * (null-on-error, not fail — ref: src/db/load.py:52-69 and the
    * duplicate at lambda/zoom_webhook/utils.py:62-79). Requires session
    * timezone pinned UTC. */
  def parseTimestampUtc(c: Column): Column = try_to_timestamp(c)

  /** T2: filesystem-name sanitization (ref: utils.py:82-88): replace
    * `\/:*?"<>|` with `_`, truncate to 255, 'unknown' on null/empty. */
  def sanitizeName(c: Column): Column = {
    val cleaned = substring(
      regexp_replace(c, "[\\\\/:*?\"<>|]", "_"), 1, 255)
    when(c.isNull || trim(c) === "", lit("unknown")).otherwise(cleaned)
  }

  /** T3: defaulting projection — coalesce each column with its default
    * (ref load.py:106 `group_names → []`, :187 `internal_user → False`). */
  def withDefault(c: Column, default: Column): Column = coalesce(c, default)

  /** T8: double URL-encode (Zoom API quirk for uuids starting with '/' —
    * ref extract.py:141,186). */
  def doubleUrlEncode(c: Column): Column = url_encode(url_encode(c))
}
