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

/** DataSource V2 source for Zoom-shaped meeting docs — the engine's
  * paginated REST scan (S1/S5, src/zoom/extract.py:27-47,106-131),
  * demonstrating the full custom-source contract in two transports:
  *
  *  - **file mode** (`.load(dir)`): one InputPartition per JSONL file —
  *    the reference's pagination/chunking becomes Spark's partition
  *    parallelism (T6);
  *  - **live-API mode** (`.option("apiUrl", …).option("tokenUrl", …)
  *    .option("clientId", …).option("clientSecret", …).load()`): each
  *    partition drives [[PagedFetcher]] (429/Retry-After pacing +
  *    `next_page_token` loop, extract.py:33-48) with Bearer tokens from
  *    the per-executor [[TokenManager]] singleton (S11 OAuth) over the
  *    real [[JdkHttpTransport]]. When the query pushes a closed
  *    `start_time` window, the scan slices it into ONE PARTITION PER DAY
  *    (the reference's date-range generator S4, extract.py:106-131) so a
  *    1000-executor cluster fans the backfill out instead of paginating
  *    serially like the reference.
  *
  * Both modes share the scan machinery:
  *  - `SupportsPushDownFilters`: `start_time` range predicates (the
  *    from/to window the reference pushes into API params,
  *    extract.py:123-127) are evaluated inside the reader — and, live,
  *    forwarded as `from`/`to` API params so rows outside the window
  *    never even cross the wire;
  *  - `SupportsPushDownRequiredColumns`: column pruning into the reader
  *    (the reference's project-only-uuid, extract.py:130);
  *  - TokenBucket pacing behind the `ratePerSec`/`burst` read options
  *    (per partition reader; live mode paces page fetches).
  */
class ZoomMeetingSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.meetingSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ZoomMeetingTable(properties.get("path"))
}

/** Live-API connection config resolved from read options (all plain
  * strings — serializable into the reader factory; the secret never
  * appears in plan strings, see ZoomScan.description). */
private[sources] final case class ZoomApiConfig(
    apiUrl: String,
    tokenUrl: String,
    clientId: String,
    clientSecret: String,
    itemsField: String,
    pageSize: Int,
    startTime: String = "1970-01-01T00:00:00Z",
    maxWindowPerBatchMs: Long = Long.MaxValue,
    visibilityLagMs: Long = 0L)

private[sources] class ZoomMeetingTable(path: String)
    extends Table with SupportsRead {
  override def name(): String = s"zoom_meetings($path)"
  override def schema(): StructType = Schemas.meetingSchema
  override def capabilities(): util.Set[TableCapability] =
    // MICRO_BATCH_READ requires the live-API options; toMicroBatchStream
    // raises a clear error for file mode (capabilities are table-level,
    // options arrive at scan time)
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val live = Option(options.get("apiUrl")).map { apiUrl =>
      // validate the auth options at scan build: a missing tokenUrl
      // would otherwise surface as an opaque executor-side NPE deep
      // inside TokenManager instead of a clear driver-side message
      def requireOption(key: String): String = {
        val v = options.get(key)
        require(v != null && v.nonEmpty,
          s"live mode (apiUrl set) requires the '$key' read option")
        v
      }
      ZoomApiConfig(
        apiUrl = apiUrl,
        tokenUrl = requireOption("tokenUrl"),
        clientId = requireOption("clientId"),
        clientSecret = requireOption("clientSecret"),
        itemsField = options.getOrDefault("itemsField", "meetings"),
        pageSize = options.getInt("pageSize", 300),
        startTime = options.getOrDefault("startTime",
          "1970-01-01T00:00:00Z"),
        maxWindowPerBatchMs = {
          val mw = options.getLong("maxWindowPerBatchMs", Long.MaxValue)
          require(mw > 0,
            s"maxWindowPerBatchMs must be > 0 (got $mw); omit the option " +
              "for an unbounded window")
          mw
        },
        visibilityLagMs = {
          val lag = options.getLong("visibilityLagMs", 0L)
          require(lag >= 0,
            s"visibilityLagMs must be >= 0 (got $lag)")
          lag
        })
    }
    new ZoomScanBuilder(if (path != null) path else options.get("path"),
      // S1's rate-limit contract (extract.py:33-37): each partition
      // reader paces its fetches through a token bucket. Off (unlimited)
      // by default for file fixtures; a live HTTP reader sets
      // ratePerSec/burst read options.
      options.getDouble("ratePerSec", 0.0),
      options.getInt("burst", 1),
      live)
  }
}

private[sources] class ZoomScanBuilder(path: String,
    ratePerSec: Double = 0.0, burst: Int = 1,
    live: Option[ZoomApiConfig] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = Schemas.meetingSchema
  private var limit: Int = -1

  /** LIMIT pushdown: each partition reader emits at most `limit` rows
    * and STOPS FETCHING (lazy pages ⇒ a LIMIT 10 against a year of
    * live API data fetches one page, not a year). Partially pushed:
    * Spark keeps its global limit on top of the per-partition caps. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed(): Boolean = true

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
    new ZoomScan(path, pushed, required, ratePerSec, burst, live, limit)
}

private[sources] class ZoomScan(path: String, filters: Array[Filter],
    required: StructType, ratePerSec: Double = 0.0, burst: Int = 1,
    live: Option[ZoomApiConfig] = None, limit: Int = -1)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ZoomMeetingScan(mode=${if (live.isDefined) "live" else "file"}, " +
      s"pushed=[${filters.mkString(", ")}], " +
      s"columns=[${required.fieldNames.mkString(", ")}]" +
      (if (limit >= 0) s", limit=$limit" else "") + ")"

  // session Hadoop conf captured on the DRIVER (fs.s3a.* etc. from
  // spark.hadoop.*) and shipped to readers as a plain serializable map —
  // a fresh Configuration() on the executor would miss all of it
  private def sessionConfMap: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    org.apache.spark.sql.SparkSession.active.sparkContext
      .hadoopConfiguration.asScala.map(e => e.getKey -> e.getValue).toMap
  }

  override def planInputPartitions(): Array[InputPartition] = live match {
    case Some(_) => planApiPartitions()
    case None =>
      val p = new Path(path)
      val fs = p.getFileSystem(ZoomConf.build(sessionConfMap))
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
        else Array(path)
      files.sorted.map(f => ZoomFilePartition(f): InputPartition)
  }

  /** Live scan planning: a closed pushed `start_time` window becomes
    * one partition per UTC day (S4's date-range chunks → Spark
    * parallelism); an open/absent window falls back to one serial
    * pagination partition, exactly the reference's shape. */
  private def planApiPartitions(): Array[InputPartition] = {
    val lower = filters.collectFirst {
      case GreaterThan("start_time", v: String) => v
      case GreaterThanOrEqual("start_time", v: String) => v
    }
    val upper = filters.collectFirst {
      case LessThan("start_time", v: String) => v
      case LessThanOrEqual("start_time", v: String) => v
    }
    val slices = (lower, upper) match {
      case (Some(lo), Some(hi)) if lo.length >= 10 && hi.length >= 10 =>
        try {
          val d0 = java.time.LocalDate.parse(lo.take(10))
          val d1 = java.time.LocalDate.parse(hi.take(10))
          val days = Iterator.iterate(d0)(_.plusDays(1))
            .takeWhile(!_.isAfter(d1)).toSeq
          days.map { d =>
            val from = if (d == d0) lo else s"${d}T00:00:00Z"
            val to = if (d == d1) hi else s"${d.plusDays(1)}T00:00:00Z"
            // numeric bounds ONLY for scan-invented day boundaries; the
            // query's own bounds (first slice's from, last slice's to)
            // keep Spark's string semantics via ZoomRows.passes
            ZoomApiPartition(Some(from), Some(to), toExclusive = d != d1,
              sliceFromMs = if (d == d0) None else ZoomRows.epochMsOf(from),
              sliceToMs = if (d == d1) None else ZoomRows.epochMsOf(to))
          }
        } catch {
          case _: java.time.format.DateTimeParseException =>
            Seq(ZoomApiPartition(lower, upper))
        }
      case _ => Seq(ZoomApiPartition(lower, upper))
    }
    slices.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZoomReaderFactory(filters, required, sessionConfMap, ratePerSec,
      burst, live, limit)

  /** Live incremental micro-batch stream (see [[ZoomMicroBatchStream]]):
    * the reference's poll-with-bookmark loop as a checkpointed
    * Structured Streaming source. Live-API options required. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    live match {
      case Some(cfg) => new ZoomMicroBatchStream(cfg, required, filters,
        ratePerSec, burst)
      case None => throw new IllegalArgumentException(
        "streaming read requires the live-API options " +
          "(apiUrl/tokenUrl/clientId/clientSecret); file mode is batch-only")
    }
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

/** One live-API pagination window, forwarded as from/to API params.
  * `toExclusive` marks interior day slices: their upper bound is the
  * next slice's lower bound, so the reader must treat it half-open —
  * an API with inclusive from/to semantics would otherwise return a
  * meeting at exactly midnight to BOTH adjacent slices (duplicate
  * rows). The final slice carries the query's own pushed upper bound,
  * whose strictness the global residual filter already enforces.
  *
  * `sliceFromMs`/`sliceToMs` are the INTERNAL day boundaries as epoch
  * ms (set only for boundaries this scan invented, never for the
  * query's own pushed bounds): the reader enforces them numerically,
  * because a lexicographic check drops sub-second items in the first
  * second of a day ("…00.500Z" sorts BEFORE "…00Z": '.' < 'Z').
  * `sliceToMs` is always exclusive (interior boundaries are half-open
  * by construction). */
private[sources] final case class ZoomApiPartition(
    from: Option[String], to: Option[String],
    toExclusive: Boolean = false,
    sliceFromMs: Option[Long] = None,
    sliceToMs: Option[Long] = None) extends InputPartition

/** Row-level machinery shared by the file and live readers: residual
  * filter evaluation and JSON→InternalRow projection onto the pruned
  * schema. */
private[sources] object ZoomRows {
  def passes(filters: Array[Filter], startTime: String): Boolean =
    filters.forall {
      case GreaterThan("start_time", v: String) =>
        startTime != null && startTime > v
      case GreaterThanOrEqual("start_time", v: String) =>
        startTime != null && startTime >= v
      case LessThan("start_time", v: String) =>
        startTime != null && startTime < v
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

  def startTimeOf(node: JsonNode): String =
    Option(node.get("start_time")).filterNot(_.isNull).map(_.asText()).orNull

  /** Lenient ISO → epoch ms: Instant first, zone-offset forms
    * ("…+01:00") via OffsetDateTime; None when absent/unparseable. */
  def epochMsOf(iso: String): Option[Long] =
    if (iso == null) None
    else
      try Some(java.time.Instant.parse(iso).toEpochMilli)
      catch {
        case _: java.time.format.DateTimeParseException =>
          try Some(java.time.OffsetDateTime.parse(iso).toInstant.toEpochMilli)
          catch { case _: java.time.format.DateTimeParseException => None }
      }

  /** API window params at WHOLE-SECOND granularity: a sub-second ISO
    * string ("…00.001Z") sorts lexicographically BEFORE the same second
    * ("…00Z"), so a string-comparing server would silently exclude
    * boundary items. Floor the from, ceil the to — the server may send
    * up to a second of extra rows; numeric residual filters trim them. */
  /** Epoch ms of 10000-01-01: beyond this, Instant.toString renders a
    * "+292278994-…" year form whose leading '+' sorts BEFORE normal
    * dates lexicographically (and ms+999 can overflow near MaxValue) —
    * clamp to a sortable far-future sentinel instead. */
  private val Year10000Ms = 253402300800000L
  def isoFloorSec(ms: Long): String =
    if (ms >= Year10000Ms) "9999-12-31T00:00:00Z"
    else java.time.Instant.ofEpochMilli(
      math.floorDiv(ms, 1000L) * 1000L).toString
  def isoCeilSec(ms: Long): String =
    // clamp 999 ms early: ceiling the last sub-second of year 9999
    // would land exactly on year 10000 and render the '+10000-…' form
    if (ms >= Year10000Ms - 999L) "9999-12-31T00:00:00Z"
    else java.time.Instant.ofEpochMilli(
      math.floorDiv(ms + 999L, 1000L) * 1000L).toString

  def toRow(node: JsonNode, required: StructType): InternalRow =
    new GenericInternalRow(
      required.fieldNames.map(field(node, _)).toArray[Any])
}

/** Shared page-drain for the live readers and the streaming probe: one
  * lazy iterator of item nodes over [[PagedFetcher]] pages, pacing each
  * page fetch through the given [[TokenBucket]]. Stopping consumption
  * stops fetching. */
private[sources] class PagedItems(
    cfg: ZoomApiConfig,
    params: Map[String, String],
    limiter: TokenBucket,
    tokens: TokenManager,
    transport: HttpTransport) extends Iterator[JsonNode] {
  private val pages = PagedFetcher.pages(cfg.apiUrl,
    params + ("page_size" -> cfg.pageSize.toString), tokens, transport)
  private var items: Iterator[JsonNode] = Iterator.empty

  override def hasNext: Boolean = {
    while (!items.hasNext && pages.hasNext) {
      limiter.acquireBlocking() // pace page fetches, extract.py:33-37
      val arr = pages.next().get(cfg.itemsField)
      items =
        if (arr == null || !arr.isArray) Iterator.empty
        else arr.elements().asScala
    }
    items.hasNext
  }

  override def next(): JsonNode = {
    if (!hasNext) throw new NoSuchElementException("pages exhausted")
    items.next()
  }
}

private[sources] class ZoomReaderFactory(filters: Array[Filter],
    required: StructType, confMap: Map[String, String],
    ratePerSec: Double, burst: Int,
    live: Option[ZoomApiConfig] = None, limit: Int = -1)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val inner = p match {
      case api: ZoomApiPartition =>
        new ZoomApiPartitionReader(live.get, api, filters, required,
          ratePerSec, burst)
      case f: ZoomFilePartition =>
        new ZoomPartitionReader(f.file, filters, required, confMap,
          ratePerSec, burst)
    }
    if (limit < 0) inner else new LimitedReader(inner, limit)
  }
}

/** Per-partition LIMIT cap: stops pulling from the wrapped reader (and
  * therefore stops fetching pages/lines) after `limit` rows. */
private[sources] class LimitedReader(
    inner: PartitionReader[InternalRow], limit: Int)
    extends PartitionReader[InternalRow] {
  private var emitted = 0
  override def next(): Boolean =
    emitted < limit && inner.next() && { emitted += 1; true }
  override def get(): InternalRow = inner.get()
  override def close(): Unit = inner.close()
}

private[sources] class ZoomPartitionReader(file: String,
    filters: Array[Filter], required: StructType,
    confMap: Map[String, String],
    ratePerSec: Double = 0.0, burst: Int = 1)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  // per-reader pacing (live-API analog: page fetches, extract.py:33-37)
  private val limiter = TokenBucket.orUnlimited(ratePerSec, burst)
  private val fs = new Path(file).getFileSystem(ZoomConf.build(confMap))
  private val stream = fs.open(new Path(file))
  private val lines =
    scala.io.Source.fromInputStream(stream, "UTF-8").getLines()
  private var current: InternalRow = _

  override def next(): Boolean = {
    limiter.acquireBlocking()
    while (lines.hasNext) {
      val line = lines.next().trim
      if (line.nonEmpty) {
        val node = mapper.readTree(line)
        if (ZoomRows.passes(filters, ZoomRows.startTimeOf(node))) {
          current = ZoomRows.toRow(node, required)
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = stream.close()
}

/** Live partition reader: one paginated window over real HTTP. Tokens
  * come from the per-executor [[TokenManager]] singleton (1000 tasks ≠
  * 1000 grants); [[PagedFetcher]] owns 429/Retry-After and the
  * 401-invalidate-regrant-once recovery; the token bucket paces page
  * fetches (not rows). Pages are pulled lazily — a LIMIT that stops
  * consuming rows stops fetching pages. */
private[sources] class ZoomApiPartitionReader(cfg: ZoomApiConfig,
    part: ZoomApiPartition, filters: Array[Filter], required: StructType,
    ratePerSec: Double = 0.0, burst: Int = 1)
    extends PartitionReader[InternalRow] {
  private val transport = new JdkHttpTransport()
  private val tokens = TokenManager.forEndpoint(
    cfg.tokenUrl, cfg.clientId, cfg.clientSecret, transport)
  private val items = new PagedItems(cfg,
    Map.empty[String, String] ++
      part.from.map("from" -> _) ++ part.to.map("to" -> _),
    TokenBucket.orUnlimited(ratePerSec, burst), tokens, transport)
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (items.hasNext) {
      val node = items.next()
      // residual row filter: the API already got from/to, but slice
      // boundaries are day-granular — enforce the exact pushed
      // predicate AND this slice's own half-open bounds (a midnight
      // meeting must land in exactly one adjacent slice). Internal day
      // boundaries are compared NUMERICALLY (epoch ms): a lexicographic
      // check would drop a sub-second item in the first second of a
      // day ("…00.500Z" < "…00Z" because '.' < 'Z') that the previous
      // slice's API window never returned. The query's own pushed
      // bounds keep Spark's string-column semantics via passes below.
      val st = ZoomRows.startTimeOf(node)
      val inSlice =
        if (st == null) part.from.isEmpty && part.to.isEmpty // unbounded
        else if (part.sliceFromMs.isEmpty && part.sliceToMs.isEmpty) true
        else ZoomRows.epochMsOf(st) match {
          case Some(ms) =>
            part.sliceFromMs.forall(ms >= _) &&
              part.sliceToMs.forall(ms < _)
          case None =>
            // unparseable start_time cannot be placed on a day
            // boundary — fall back to the lexicographic check
            part.from.forall(st >= _) &&
              part.to.forall(to =>
                if (part.toExclusive) st < to else st <= to)
        }
      if (inSlice && ZoomRows.passes(filters, st)) {
        current = ZoomRows.toRow(node, required)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
