package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Schemas

/** DataSource V2 source for Zoom-shaped meeting JSONL fixtures — the
  * offline analog of the reference's paginated REST scan (S1/S5,
  * src/zoom/extract.py:27-47,106-131), demonstrating the full custom-
  * source contract:
  *
  *  - one InputPartition per file — the reference's pagination/chunking
  *    becomes Spark's partition parallelism (T6);
  *  - `SupportsPushDownFilters`: `start_time` range predicates (the
  *    from/to window the reference pushes into API params,
  *    extract.py:123-127) are evaluated inside the reader — rows outside
  *    the window never reach Spark;
  *  - `SupportsPushDownRequiredColumns`: column pruning into the reader
  *    (the reference's project-only-uuid, extract.py:130);
  *  - rate limiting lives in the partition reader (TokenBucket pacing
  *    behind the `ratePerSec`/`burst` read options); a live HTTP reader
  *    additionally composes [[graft.sources.TokenManager]] (S11 OAuth,
  *    per-executor singleton) and [[graft.sources.PagedFetcher]] (the
  *    429/Retry-After + next_page_token loop, extract.py:33-48) in
  *    place of the file stream — the scan/pushdown machinery here is
  *    transport-agnostic.
  *
  * Usage: `spark.read.format("graft.sources.ZoomMeetingSource")
  *   .load(dir)` — schema is the fixed meeting-doc schema
  * (model/Schemas.meetingSchema).
  */
class ZoomMeetingSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.meetingSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ZoomMeetingTable(properties.get("path"))
}

private[sources] class ZoomMeetingTable(path: String)
    extends Table with SupportsRead {
  override def name(): String = s"zoom_meetings($path)"
  override def schema(): StructType = Schemas.meetingSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZoomScanBuilder(if (path != null) path else options.get("path"),
      // S1's rate-limit contract (extract.py:33-37): each partition
      // reader paces its fetches through a token bucket. Off (unlimited)
      // by default for file fixtures; a live HTTP reader sets
      // ratePerSec/burst read options.
      options.getDouble("ratePerSec", 0.0),
      options.getInt("burst", 1))
}

private[sources] class ZoomScanBuilder(path: String,
    ratePerSec: Double = 0.0, burst: Int = 1)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = Schemas.meetingSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept start_time range predicates (ISO strings compare
    // lexicographically) — everything else stays with Spark
    val (accepted, rejected) = filters.partition {
      case GreaterThan("start_time", _: String) => true
      case GreaterThanOrEqual("start_time", _: String) => true
      case LessThan("start_time", _: String) => true
      case LessThanOrEqual("start_time", _: String) => true
      case IsNotNull("start_time") => true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new ZoomScan(path, pushed, required, ratePerSec, burst)
}

private[sources] class ZoomScan(path: String, filters: Array[Filter],
    required: StructType, ratePerSec: Double = 0.0, burst: Int = 1)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ZoomMeetingScan(pushed=[${filters.mkString(", ")}], " +
      s"columns=[${required.fieldNames.mkString(", ")}])"

  // session Hadoop conf captured on the DRIVER (fs.s3a.* etc. from
  // spark.hadoop.*) and shipped to readers as a plain serializable map —
  // a fresh Configuration() on the executor would miss all of it
  private def sessionConfMap: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    org.apache.spark.sql.SparkSession.active.sparkContext
      .hadoopConfiguration.asScala.map(e => e.getKey -> e.getValue).toMap
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(ZoomConf.build(sessionConfMap))
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
      else Array(path)
    files.sorted.map(f => ZoomFilePartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZoomReaderFactory(filters, required, sessionConfMap, ratePerSec,
      burst)
}

private[sources] object ZoomConf {
  def build(entries: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

private[sources] final case class ZoomFilePartition(file: String)
    extends InputPartition

private[sources] class ZoomReaderFactory(filters: Array[Filter],
    required: StructType, confMap: Map[String, String],
    ratePerSec: Double, burst: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ZoomPartitionReader(p.asInstanceOf[ZoomFilePartition].file,
      filters, required, confMap, ratePerSec, burst)
}

private[sources] class ZoomPartitionReader(file: String,
    filters: Array[Filter], required: StructType,
    confMap: Map[String, String],
    ratePerSec: Double = 0.0, burst: Int = 1)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  // per-reader pacing (live-API analog: page fetches, extract.py:33-37).
  // ratePerSec <= 0 ⇒ unlimited (file fixtures); a positive rate paces
  // every fetch through the token bucket, the S1 contract a live HTTP
  // reader inherits unchanged.
  private val limiter =
    if (ratePerSec > 0) new TokenBucket(ratePerSec, math.max(burst, 1))
    else new TokenBucket(ratePerSec = 1e9, burst = 1000)
  private val fs = new Path(file).getFileSystem(ZoomConf.build(confMap))
  private val stream = fs.open(new Path(file))
  private val lines =
    scala.io.Source.fromInputStream(stream, "UTF-8").getLines()
  private var current: InternalRow = _

  private def passes(startTime: String): Boolean = filters.forall {
    case GreaterThan("start_time", v: String) =>
      startTime != null && startTime > v
    case GreaterThanOrEqual("start_time", v: String) =>
      startTime != null && startTime >= v
    case LessThan("start_time", v: String) => startTime != null && startTime < v
    case LessThanOrEqual("start_time", v: String) =>
      startTime != null && startTime <= v
    case IsNotNull("start_time") => startTime != null
    case _ => true
  }

  private def field(node: JsonNode, name: String): Any = {
    val v = node.get(name)
    if (v == null || v.isNull) null
    else Schemas.meetingSchema(name).dataType match {
      case LongType => java.lang.Long.valueOf(v.asLong())
      case org.apache.spark.sql.types.IntegerType =>
        java.lang.Integer.valueOf(v.asInt())
      case _ => UTF8String.fromString(v.asText())
    }
  }

  override def next(): Boolean = {
    limiter.acquireBlocking()
    while (lines.hasNext) {
      val line = lines.next().trim
      if (line.nonEmpty) {
        val node = mapper.readTree(line)
        val st = Option(node.get("start_time")).filterNot(_.isNull)
          .map(_.asText()).orNull
        if (passes(st)) {
          current = new GenericInternalRow(
            required.fieldNames.map(field(node, _)).toArray[Any])
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = stream.close()
}
