package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Versioned

/** Transform partitioning for `CREATE TABLE ... PARTITIONED BY
  * (days(ts))` / `months(ts)` / `years(ts)` / `hours(ts)` /
  * `bucket(n, col)` (r17 — VERDICT r16 Next #3, the Iceberg "hidden
  * partitioning" spelling).
  *
  * Design: the transform MATERIALIZES as a generated partition column
  * at write — `ts_day` for `days(ts)`, `c_bucket` for `bucket(n, c)` —
  * and the table partitions by that column through the exact machinery
  * identity-partitioned tables use (dir layout, discovery, pruning,
  * DML). The generated column is commit-assigned like the provenance
  * column: every write door derives it from the source column and
  * IGNORES input values, so it can never drift from its definition.
  * At read, [[GraftTransformPruneRule]] maps predicates on the SOURCE
  * column to predicates on the generated column (monotonic formats for
  * the time transforms, the same hash for bucket), so `WHERE ts
  * BETWEEN ...` partition-prunes without the user ever naming
  * `ts_day` — the Iceberg contract, expressed as a Catalyst rule.
  *
  * Generated values: time transforms render LEXICOGRAPHICALLY
  * MONOTONIC strings (`yyyy`, `yyyy-MM`, `yyyy-MM-dd`,
  * `yyyy-MM-dd-HH`) — human-readable dir names whose string order is
  * time order, which is what makes range mapping sound; `bucket`
  * renders `pmod(hash(col), n)` (Spark's Murmur3 `hash`). Time
  * rendering uses the SESSION time zone (Spark's own `date_format`
  * semantics — the engine's harness pins UTC); writers and readers of
  * one table should share a zone, as with any Spark time-partitioned
  * pipeline.
  *
  * The spec persists as ONE immutable tab-record file at the table
  * root ([[SpecFile]]), written by CREATE TABLE before the first
  * commit: it rides TABLE RENAME inside the tree, costs one existence
  * probe on paths that read it, and is never rewritten (partition
  * evolution is a different feature with a different commit shape). */
object PartitionTransforms {

  /** `genCol\tkind\tsource\tn` at the table root. */
  val SpecFile = "_graft_partition_transform"

  val Kinds = Set("years", "months", "days", "hours", "bucket")

  case class Spec(genCol: String, kind: String, source: String, n: Int) {
    /** The derivation, applied by every write door. */
    def genExpr: Column = kind match {
      case "years" => date_format(col(source), "yyyy")
      case "months" => date_format(col(source), "yyyy-MM")
      case "days" => date_format(col(source), "yyyy-MM-dd")
      case "hours" => date_format(col(source), "yyyy-MM-dd-HH")
      case "bucket" => pmod(hash(col(source)), lit(n))
    }

    /** Derive (or overwrite) the generated column on a write frame.
      * Input values for `genCol` are IGNORED — commit-assigned, like
      * provenance. A frame missing the SOURCE column fails loudly. */
    def derive(df: DataFrame): DataFrame = {
      require(df.columns.exists(_.equalsIgnoreCase(source)),
        s"PartitionTransforms: write data lacks source column " +
          s"'$source' of partition transform $kind($source) — the " +
          s"generated column '$genCol' cannot be derived")
      df.withColumn(genCol, genExpr)
    }
  }

  /** Parse CREATE TABLE transforms: identity columns pass through;
    * at most ONE generated transform is supported (one nested leaf
    * level per column, matching the identity contract), and its
    * generated name must not collide with a schema column. Returns
    * (partition column names in order, optional spec). */
  def parse(
      transforms: Array[Transform],
      schema: StructType): (Seq[String], Option[Spec]) = {
    var spec: Option[Spec] = None
    val pcols = transforms.toSeq.map { t =>
      t.name match {
        case "identity" if t.references.length == 1 &&
            t.references.head.fieldNames.length == 1 =>
          t.references.head.fieldNames.head
        case k if Kinds.contains(k) =>
          require(spec.isEmpty,
            "GraftCatalog: at most one generated partition transform " +
              "per table (combine with identity columns for more)")
          require(t.references.length == 1 &&
              t.references.head.fieldNames.length == 1,
            s"GraftCatalog: $k(...) takes one top-level column")
          val src = t.references.head.fieldNames.head
          require(schema.fieldNames.exists(_.equalsIgnoreCase(src)),
            s"GraftCatalog: transform source column '$src' is not in " +
              "the schema")
          val n = if (k == "bucket") {
            val lits = t.arguments.collect {
              case l: org.apache.spark.sql.connector.expressions
                  .Literal[_] => l.value
            }
            require(lits.length == 1 &&
                lits.head.isInstanceOf[Integer],
              "GraftCatalog: bucket(n, col) needs one integer bucket " +
                "count")
            val v = lits.head.asInstanceOf[Integer].intValue
            require(v > 0 && v <= 100000,
              s"GraftCatalog: bucket count must be in (0, 100000], got $v")
            v
          } else 0
          val suffix = k match {
            case "years" => "_year"
            case "months" => "_month"
            case "days" => "_day"
            case "hours" => "_hour"
            case "bucket" => "_bucket"
          }
          val gen = src + suffix
          require(!schema.fieldNames.exists(_.equalsIgnoreCase(gen)),
            s"GraftCatalog: generated partition column name '$gen' " +
              "collides with a schema column — rename that column")
          spec = Some(Spec(gen, k, src, n))
          gen
        case other => throw new UnsupportedOperationException(
          "GraftCatalog: CREATE TABLE supports no partitioning " +
            "(dimension table), identity PARTITIONED BY columns, or " +
            "ONE years/months/days/hours/bucket transform (fact " +
            s"table); got $other")
      }
    }
    (pcols, spec)
  }

  def write(spark: SparkSession, tablePath: String, spec: Spec): Unit = {
    val p = new Path(tablePath, SpecFile)
    Versioned.atomicWriteFile(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p,
      s"${spec.genCol}\t${spec.kind}\t${spec.source}\t${spec.n}")
  }

  /** The table's transform spec, if transform-partitioned. One small
    * existence probe + read; the file is immutable for a table's
    * lifetime, so callers may cache per statement. */
  def read(spark: SparkSession, tablePath: String): Option[Spec] = {
    val p = new Path(tablePath, SpecFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val text = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
        new String(out.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
      val parts = text.trim.split("\t")
      if (parts.length != 4) None // torn/foreign: behave untransformed
      else Some(Spec(parts(0), parts(1), parts(2), parts(3).toInt))
    } catch { case _: java.io.FileNotFoundException => None }
  }
}
