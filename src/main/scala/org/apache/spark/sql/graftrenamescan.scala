package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.connector.catalog.{CatalogV2Util, SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 NAME-TRANSLATION shim for graft's renamed fact tables (the
  * catalog half of `FactVersioned`'s column mapping — see
  * `renameColumns` there). A renamed column keeps its PHYSICAL on-file
  * name; the catalog presents the LOGICAL schema and this shim
  * translates at the scan seam:
  *
  *  - `pruneColumns` maps the required logical columns to physical
  *    before delegating, so column pruning still reaches the parquet
  *    reader;
  *  - `pushFilters` rewrites attribute NAMES logical→physical on the
  *    way down (parquet/partition filter translation is name-based)
  *    and back on the returned residuals (resolution downstream is by
  *    exprId — `withName` keeps ids intact, so this is plan hygiene,
  *    not correctness);
  *  - the built `Scan` reports its read schema under logical names
  *    (positions/types unchanged — DSv2 execution is positional, so
  *    the physical reader's batches bind to the logical attributes
  *    as-is).
  *
  * Lives in `org.apache.spark.sql` because
  * [[SupportsPushDownCatalystFilters]] — the interface
  * `FileScanBuilder` actually implements for filter pushdown — is
  * `private[sql]` in the Scala pickle (same precedent as
  * [[GraftColumnBridge]]). Never engaged for never-renamed tables:
  * the catalog only wraps when a generation's column map is non-empty.
  */
object GraftRenameShim {

  /** `inner` reads PHYSICAL columns; the returned table presents
    * `logicalSchema` and translates scans through `logicalToPhysical`
    * (lower-cased logical keys; identity entries absent). */
  def table(
      inner: Table with SupportsRead,
      logicalSchema: StructType,
      logicalToPhysical: Map[String, String]): Table with SupportsRead =
    new GraftRenamedTable(inner, logicalSchema, logicalToPhysical)
}

private class GraftRenamedTable(
    inner: Table with SupportsRead,
    logical: StructType,
    l2p: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = inner.name()
  override def schema(): StructType = logical
  override def columns(): Array[org.apache.spark.sql.connector.catalog.Column] =
    CatalogV2Util.structTypeToV2Columns(logical)
  override def partitioning(): Array[Transform] = inner.partitioning()
  override def properties(): java.util.Map[String, String] =
    inner.properties()
  override def capabilities(): java.util.Set[TableCapability] =
    inner.capabilities()
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRenamingScanBuilder(inner.newScanBuilder(options), l2p)
}

private class GraftRenamingScanBuilder(
    inner: ScanBuilder,
    l2p: Map[String, String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters {
  private val p2l: Map[String, String] =
    l2p.map { case (l, p) => p.toLowerCase -> l }
  private def pname(l: String): String = l2p.getOrElse(l.toLowerCase, l)
  private def lname(p: String): String = p2l.getOrElse(p.toLowerCase, p)

  override def pruneColumns(requiredSchema: StructType): Unit = inner match {
    case s: SupportsPushDownRequiredColumns =>
      s.pruneColumns(StructType(
        requiredSchema.fields.map(f => f.copy(name = pname(f.name)))))
    case _ => ()
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    inner match {
      case s: SupportsPushDownCatalystFilters =>
        val phys = filters.map(_.transform {
          case a: AttributeReference => a.withName(pname(a.name))
        })
        s.pushFilters(phys).map(_.transform {
          case a: AttributeReference => a.withName(lname(a.name))
        })
      case _ => filters
    }

  override def pushedFilters()
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner match {
      case s: SupportsPushDownCatalystFilters => s.pushedFilters
      case _ => Array.empty
    }

  override def build(): Scan = new GraftRenamingScan(inner.build(), p2l)
}

private class GraftRenamingScan(
    inner: Scan, p2l: Map[String, String]) extends Scan
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType =
    StructType(inner.readSchema().fields.map(f =>
      f.copy(name = p2l.getOrElse(f.name.toLowerCase, f.name))))
  override def toBatch: Batch = inner.toBatch
  override def description(): String = inner.description()
  // the execution decides columnar support from the scan — delegate,
  // or a renamed table would silently lose vectorized reading
  override def columnarSupportMode()
      : Scan.ColumnarSupportMode = inner.columnarSupportMode()
  // size estimates feed join planning (auto-broadcast) — without the
  // delegation a renamed table reads as defaultSizeInBytes (huge) and
  // never broadcasts
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = inner match {
    case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
      s.estimateStatistics()
    case _ => new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }
}
