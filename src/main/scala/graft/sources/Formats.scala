package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Text-format round-trip helpers with the option set PINNED so that
  * `read(write(df)) == df` holds for hostile content — the reference
  * ingests JSON payloads (`src/api/client.py:117-139`) and ships CSVs
  * around; an engine claiming those formats must survive embedded
  * quotes, commas and NEWLINES, which Spark's defaults do not
  * round-trip (the CSV writer's `ignoreLeadingWhiteSpace`/
  * `ignoreTrailingWhiteSpace` default TRUE and silently mutate
  * values; a multi-line field needs `multiLine` on read, which also
  * changes the split story — see below).
  *
  * Scale note: `multiLine=true` makes a CSV/JSON file non-splittable
  * (a record boundary can no longer be found mid-file), so one file =
  * one task. Write many moderate files (the writers here inherit the
  * upstream partitioning) rather than one giant one; columnar formats
  * remain the real at-scale answer, these exist for interchange. */
object Formats {

  private val csvOpts = Map(
    "header" -> "true",
    "quote" -> "\"",
    "escape" -> "\"",          // RFC-4180 doubled quotes
    "nullValue" -> "\\N",      // distinguish null from empty string
    "ignoreLeadingWhiteSpace" -> "false",
    "ignoreTrailingWhiteSpace" -> "false")

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").options(csvOpts).csv(path)

  /** Schema is required: CSV carries no types, and inference would both
    * cost a pass and guess (a "123" text field becomes an int). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.options(csvOpts)
      .option("multiLine", "true")   // embedded newlines in quoted fields
      .schema(schema)
      .csv(path)

  /** JSON Lines: newlines inside strings are escaped (`\n`) by the JSON
    * encoder itself, so files stay line-splittable — no multiLine
    * needed, unlike CSV. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC: the other columnar format Spark bundles — full fidelity,
    * splittable, predicate pushdown; included for interchange with
    * ORC-based warehouses. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** A read split into parseable rows and a dead-letter side. */
  final case class DeadLetterRead(good: DataFrame, bad: DataFrame)

  private val CorruptCol = "__graft_corrupt"

  /** JSONL read that routes unparseable lines to a dead-letter frame
    * (`raw` = the offending line verbatim) instead of nulling them
    * silently (PERMISSIVE's default) or killing the job (FAILFAST) —
    * the same quarantine posture as the engine's ingest dead-letter
    * path (`ErrorRouter`): at 100 TB a feed WILL contain garbage and
    * neither losing it silently nor stopping the world is acceptable. */
  def readJsonlDeadLetter(
      spark: SparkSession,
      path: String,
      schema: StructType): DeadLetterRead =
    splitCorrupt(schema) { withCorrupt =>
      spark.read
        .schema(withCorrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .json(path)
    }

  /** CSV twin of [[readJsonlDeadLetter]] (malformed = wrong column
    * count / unclosed quote; the raw line lands in `raw`). */
  def readCsvDeadLetter(
      spark: SparkSession,
      path: String,
      schema: StructType): DeadLetterRead =
    splitCorrupt(schema) { withCorrupt =>
      spark.read
        .options(csvOpts)
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .schema(withCorrupt)
        .csv(path)
    }

  /** Shared split: Spark forbids filtering directly on the lazy
    * corrupt column (it only materializes with the row), so the split
    * goes through an EAGER localCheckpoint of the raw read — which
    * also means no cached blocks outlive this call (a plain cache()
    * here would pin the feed in executor storage with no handle for
    * the caller to release). */
  private def splitCorrupt(schema: StructType)(
      read: StructType => DataFrame): DeadLetterRead = {
    import org.apache.spark.sql.functions.col
    val withCorrupt = schema
      .add(CorruptCol, org.apache.spark.sql.types.StringType)
    val raw = read(withCorrupt).localCheckpoint()
    DeadLetterRead(
      good = raw.where(col(CorruptCol).isNull)
        .select(schema.fieldNames.map(col).toIndexedSeq: _*),
      bad = raw.where(col(CorruptCol).isNotNull)
        .select(col(CorruptCol).as("raw")))
  }
}
