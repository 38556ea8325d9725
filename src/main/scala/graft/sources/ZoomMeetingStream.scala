package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Live micro-batch STREAMING source over the paginated REST API — the
  * reference's poll-with-bookmark loop (S5 incremental scan + S8
  * watermark, src/zoom/extract.py:106-131 + BatchEtl's `since` filter)
  * re-expressed as a native Structured Streaming DSv2 source:
  *
  *  - the OFFSET is an epoch-millisecond high-water mark over
  *    `start_time` — exactly the reference's bookmark, but checkpointed
  *    by the engine (exactly-once across restarts instead of the
  *    reference's best-effort file);
  *  - each micro-batch reads the half-open window [start, end): the
  *    executor-side reader enforces the bound NUMERICALLY (epoch ms,
  *    never string-compares mixed-precision ISO), so an item landing on
  *    a batch boundary is emitted exactly once;
  *  - [[latestOffset]] probes the API from the current high-water mark
  *    and advances to max(item start_time) + 1 ms — when the API has
  *    nothing new the offset does NOT advance, so `processAllAvailable`
  *    terminates and the engine schedules no empty batches. The probe
  *    re-pages the pending window on the driver (metadata-cheap here; a
  *    production API with an `order by start_time desc, limit 1` form
  *    would make it O(1));
  *  - auth, pagination, 429/Retry-After and pacing are the same
  *    [[TokenManager]]/[[PagedFetcher]]/TokenBucket stack the batch
  *    live mode uses, over the same real [[JdkHttpTransport]].
  *
  * Determinism contract: replaying a committed window assumes the API
  * returns a stable item set for PAST windows (true for Zoom-style
  * meeting histories); late-arriving items with past start_times
  * belong to watermark handling downstream, as with any replayable
  * source.
  */
private[sources] final case class ZoomMsOffset(ms: Long) extends Offset {
  override def json(): String = ms.toString
}

/** One micro-batch window [fromMs, toMs), pre-rendered ISO params. */
private[sources] final case class ZoomStreamPartition(
    fromMs: Long, toMs: Long) extends InputPartition

private[sources] class ZoomMicroBatchStream(
    cfg: ZoomApiConfig,
    required: StructType,
    filters: Array[Filter],
    ratePerSec: Double,
    burst: Int,
    startTimeIso: String,
    maxWindowPerBatchMs: Long = Long.MaxValue)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val transport = new JdkHttpTransport()
  private def tokens: TokenManager = TokenManager.forEndpoint(
    cfg.tokenUrl, cfg.clientId, cfg.clientSecret, transport)

  private def msOf(iso: String): Long =
    java.time.Instant.parse(iso).toEpochMilli
  private def isoOf(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).toString

  private val startMs = msOf(startTimeIso)
  // driver-side high-water mark; re-floored from the engine's
  // checkpointed offsets via planInputPartitions after a restart
  @volatile private var known: Long = startMs

  override def initialOffset(): Offset = ZoomMsOffset(startMs)

  override def deserializeOffset(json: String): Offset =
    ZoomMsOffset(json.toLong)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  /** Admission-controlled offset advance: probe the API for new items,
    * but never advance more than `maxWindowPerBatchMs` past the batch
    * start — an initial backfill from a years-old bookmark becomes a
    * sequence of bounded micro-batches instead of one colossal one
    * (the time-offset analog of maxOffsetsPerTrigger). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startMs0 = start.asInstanceOf[ZoomMsOffset].ms
    known = math.max(known, startMs0)
    // API param at whole-second granularity (see ZoomStreamPartitionReader
    // .isoFloorSec): sub-second ISO strings break lexicographic servers
    val probeFrom = isoOf(math.floorDiv(known, 1000L) * 1000L)
    val pages = PagedFetcher.pages(cfg.apiUrl,
      Map("page_size" -> cfg.pageSize.toString, "from" -> probeFrom),
      tokens, transport)
    var maxMs = Long.MinValue
    pages.foreach { page =>
      val arr = page.get(cfg.itemsField)
      if (arr != null && arr.isArray) arr.elements().asScala.foreach { n =>
        val st = ZoomRows.startTimeOf(n)
        if (st != null) {
          val ms = try msOf(st) catch { case _: Exception => Long.MinValue }
          if (ms >= known && ms > maxMs) maxMs = ms
        }
      }
    }
    if (maxMs >= known) {
      val uncapped = maxMs + 1 // half-open: next window excludes maxMs
      known =
        if (maxWindowPerBatchMs == Long.MaxValue) uncapped
        else math.min(uncapped, known + maxWindowPerBatchMs)
    }
    ZoomMsOffset(known)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def planInputPartitions(start: Offset, end: Offset):
      Array[InputPartition] = {
    val s = start.asInstanceOf[ZoomMsOffset].ms
    val e = end.asInstanceOf[ZoomMsOffset].ms
    known = math.max(known, e) // restart floor: never re-probe committed past
    if (e <= s) Array.empty
    else Array(ZoomStreamPartition(s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZoomStreamReaderFactory(cfg, required, filters, ratePerSec, burst)

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint
  override def stop(): Unit = ()
}

private[sources] class ZoomStreamReaderFactory(cfg: ZoomApiConfig,
    required: StructType, filters: Array[Filter],
    ratePerSec: Double, burst: Int) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ZoomStreamPartitionReader(cfg,
      p.asInstanceOf[ZoomStreamPartition], required, filters, ratePerSec,
      burst)
}

/** Executor-side window reader: same fetch stack as the batch live
  * reader, but the window bound is enforced on PARSED epoch millis —
  * [fromMs, toMs) half-open, so batch boundaries never duplicate. */
private[sources] class ZoomStreamPartitionReader(cfg: ZoomApiConfig,
    part: ZoomStreamPartition, required: StructType,
    filters: Array[Filter], ratePerSec: Double, burst: Int)
    extends PartitionReader[InternalRow] {
  private val transport = new JdkHttpTransport()
  private val tokens = TokenManager.forEndpoint(
    cfg.tokenUrl, cfg.clientId, cfg.clientSecret, transport)
  private val limiter =
    if (ratePerSec > 0) new TokenBucket(ratePerSec, math.max(burst, 1))
    else new TokenBucket(ratePerSec = 1e9, burst = 1000)
  // API window params at WHOLE-SECOND granularity: a sub-second ISO
  // string ("…00.001Z") sorts lexicographically BEFORE the same second
  // ("…00Z"), so a string-comparing server would silently exclude
  // boundary items. Floor the from, ceil the to — the server may return
  // up to a second of extra rows and the numeric filter below trims the
  // window exactly.
  private def isoFloorSec(ms: Long): String =
    java.time.Instant.ofEpochMilli(math.floorDiv(ms, 1000L) * 1000L).toString
  private def isoCeilSec(ms: Long): String =
    java.time.Instant.ofEpochMilli(
      math.floorDiv(ms + 999L, 1000L) * 1000L).toString
  private val pages = PagedFetcher.pages(cfg.apiUrl,
    Map("page_size" -> cfg.pageSize.toString,
      "from" -> isoFloorSec(part.fromMs),
      "to" -> isoCeilSec(part.toMs)),
    tokens, transport)
  private var items: Iterator[JsonNode] = Iterator.empty
  private var current: InternalRow = _

  private def inWindow(st: String): Boolean =
    st != null && {
      try {
        val ms = java.time.Instant.parse(st).toEpochMilli
        ms >= part.fromMs && ms < part.toMs
      } catch { case _: Exception => false }
    }

  override def next(): Boolean = {
    while (true) {
      if (items.hasNext) {
        val node = items.next()
        val st = ZoomRows.startTimeOf(node)
        if (inWindow(st) && ZoomRows.passes(filters, st)) {
          current = ZoomRows.toRow(node, required)
          return true
        }
      } else if (pages.hasNext) {
        limiter.acquireBlocking()
        val page = pages.next()
        val arr = page.get(cfg.itemsField)
        items =
          if (arr == null || !arr.isArray) Iterator.empty
          else arr.elements().asScala
      } else return false
    }
    false // unreachable
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
