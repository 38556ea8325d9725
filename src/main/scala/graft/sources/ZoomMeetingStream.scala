package graft.sources

import scala.jdk.CollectionConverters._

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
  *  - ADMISSION CONTROL (`maxWindowPerBatchMs`): the offset never
  *    advances more than the cap past the batch start, so a years-old
  *    bookmark backfills as bounded micro-batches (the time-offset
  *    analog of maxOffsetsPerTrigger). The probe is WINDOW-BOUNDED
  *    (from AND to params — never re-pages the whole pending corpus
  *    per trigger) and EXISTENCE-ONLY (stops paging at the first
  *    in-window item, ≤ one page per trigger): data pages cross the
  *    wire exactly once, in the partition reader, not twice (driver
  *    probe + executor re-fetch). When a capped window is empty a
  *    second probe finds where data resumes and jumps the offset
  *    there in one data-bearing batch — sparse history does not
  *    schedule per-gap empty batches;
  *  - VISIBILITY LAG (`visibilityLagMs`, default 0): the offset stays
  *    `lag` behind the wall clock, so items the API indexes late
  *    (e.g. meetings listed only after they END) become visible
  *    before the offset passes their start_time. Lag 0 = the
  *    reference's exact bookmark-to-now semantics, INCLUDING its loss
  *    window for late-visible items (see latestOffset);
  *  - the driver probe paces through the same TokenBucket contract as
  *    the partition readers (`ratePerSec`/`burst`), so a tight trigger
  *    loop cannot busy-poll the API from the driver;
  *  - auth, pagination, 429/Retry-After are the same
  *    [[TokenManager]]/[[PagedFetcher]] stack as the batch live mode,
  *    over the same real [[JdkHttpTransport]].
  *
  * Timestamp contract: `start_time` IS the offset field. Items with a
  * null or unparseable `start_time` cannot be ordered into a window and
  * are DROPPED by the streaming source (the batch live mode emits
  * null-start_time rows on unbounded scans — streaming cannot, by
  * construction). Zone-offset forms ("…+01:00") are accepted via
  * OffsetDateTime fallback.
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

/** One micro-batch window [fromMs, toMs). */
private[sources] final case class ZoomStreamPartition(
    fromMs: Long, toMs: Long) extends InputPartition

private[sources] class ZoomMicroBatchStream(
    cfg: ZoomApiConfig,
    required: StructType,
    filters: Array[Filter],
    ratePerSec: Double,
    burst: Int) extends MicroBatchStream with SupportsAdmissionControl {

  private val transport = new JdkHttpTransport()
  private def tokens: TokenManager = TokenManager.forEndpoint(
    cfg.tokenUrl, cfg.clientId, cfg.clientSecret, transport)
  // driver-side probe pacing: same contract as the partition readers
  private val probeLimiter = TokenBucket.orUnlimited(ratePerSec, burst)

  private val startMs = ZoomRows.epochMsOf(cfg.startTime).getOrElse(
    throw new IllegalArgumentException(
      s"startTime is not an ISO instant: ${cfg.startTime}"))
  // driver-side high-water mark; re-floored from the engine's
  // checkpointed offsets on every latestOffset/planInputPartitions call
  @volatile private var known: Long = startMs

  private def safeAdd(a: Long, b: Long): Long = {
    val s = a + b
    if (b > 0 && s < a) Long.MaxValue else s
  }

  override def initialOffset(): Offset = ZoomMsOffset(startMs)

  override def deserializeOffset(json: String): Offset =
    ZoomMsOffset(json.toLong)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Paced, window-bounded probe: items in [fromMs, toMs) from the API
    * (params rendered at whole-second granularity — see the reader),
    * folded to (found, minMs) over the in-window items. Paging stops
    * at the first PAGE carrying an in-window item — a probe only needs
    * existence (dense case) or a resume point (gap case), never a scan
    * of the whole window; taking the min over a whole page (not the
    * first item) keeps the gap jump tight even when the API's page
    * order is not time-ascending. Full cfg.pageSize pages on purpose:
    * the from param is floored to the offset's second, so items from
    * the boundary second re-appear out-of-window — a full first page
    * absorbs them in ONE paced request, where a 1-item page would pay
    * one HTTP round trip per boundary item on every trigger. */
  private def probeWindow(fromMs: Long, toMs: Long): (Boolean, Long) = {
    val params = Map(
      "page_size" -> cfg.pageSize.toString,
      "from" -> ZoomRows.isoFloorSec(fromMs)) ++
      (if (toMs == Long.MaxValue) Map.empty[String, String]
       else Map("to" -> ZoomRows.isoCeilSec(toMs)))
    val pages = PagedFetcher.pages(cfg.apiUrl, params, tokens, transport)
    var found = false
    var minMs = Long.MaxValue
    while (!found && pages.hasNext) {
      probeLimiter.acquireBlocking()
      val arr = pages.next().get(cfg.itemsField)
      if (arr != null && arr.isArray)
        arr.elements().asScala.foreach { n =>
          ZoomRows.epochMsOf(ZoomRows.startTimeOf(n)).foreach { ms =>
            if (ms >= fromMs && ms < toMs) {
              found = true
              if (ms < minMs) minMs = ms
            }
          }
        }
    }
    (found, minMs)
  }

  /** Admission-controlled offset advance. Dense window: an
    * EXISTENCE-ONLY probe (stops paging at the first in-window item)
    * admits the batch, and the offset advances to
    * min(start + cap, now − visibilityLag) — the reference's
    * bookmark-to-now loop (extract.py:196-211). Data pages cross the
    * wire exactly once, in the partition reader; the probe costs at
    * most one page. Empty capped window: one gap-resume probe jumps
    * the offset to first-item + cap so the next batch spans the gap
    * AND carries data. No pending data: no advance
    * (processAllAvailable terminates, no empty batches scheduled).
    *
    * VISIBILITY LAG: the offset never advances past
    * `now − visibilityLagMs`. With the default lag 0 this is exactly
    * the reference's bookmark semantics (fetch [bookmark, now], set
    * bookmark = now) — and shares its loss window: an item that
    * becomes API-visible LATER with a start_time before the committed
    * offset is never emitted. Meeting-report APIs list a meeting only
    * after it ends, so callers should set `visibilityLagMs` ≥ the
    * maximum meeting duration + indexing delay — items then become
    * visible before the offset passes their start_time, and the lag
    * window is re-scanned by construction. Items with future
    * start_times are admitted once the (lagged) clock passes them. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    known = math.max(known, start.asInstanceOf[ZoomMsOffset].ms)
    val cap = cfg.maxWindowPerBatchMs // validated > 0 at option parse
    val capEnd = if (cap == Long.MaxValue) Long.MaxValue
      else safeAdd(known, cap)
    // effective "now": everything at or past this instant may still be
    // invisible to the API — the offset must not cross it
    val effNow = System.currentTimeMillis() - cfg.visibilityLagMs
    val windowEnd = math.min(capEnd, math.max(effNow, known))
    val (exists, _) = probeWindow(known, windowEnd)
    if (exists) {
      known = windowEnd
    } else if (capEnd != Long.MaxValue && capEnd < effNow) {
      // empty capped HISTORICAL window — find where data resumes and
      // jump past the gap. Windows reaching into the (lagged) future
      // are skipped: they cannot be a gap, only not-yet-visible data,
      // and probing them would double idle API polling on every
      // trigger forever.
      val (resumed, resumeMs) = probeWindow(capEnd, Long.MaxValue)
      // Clamp the jump to the lagged clock: an unclamped resume+cap
      // near the present would advance the committed offset INTO the
      // visibility-lag window, permanently dropping items that become
      // API-visible later (the invariant above: offset ≤ effNow). The
      // max(effNow, resumeMs+1) keeps the resume item itself deliverable
      // even when it sits at/inside the lag boundary.
      if (resumed) known = math.min(
        safeAdd(resumeMs, cap), math.max(effNow, safeAdd(resumeMs, 1)))
    }
    ZoomMsOffset(known)
  }

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

/** Executor-side window reader: the shared [[PagedItems]] drain with
  * the window bound enforced on PARSED epoch millis — [fromMs, toMs)
  * half-open, so batch boundaries never duplicate. */
private[sources] class ZoomStreamPartitionReader(cfg: ZoomApiConfig,
    part: ZoomStreamPartition, required: StructType,
    filters: Array[Filter], ratePerSec: Double, burst: Int)
    extends PartitionReader[InternalRow] {
  private val transport = new JdkHttpTransport()
  private val tokens = TokenManager.forEndpoint(
    cfg.tokenUrl, cfg.clientId, cfg.clientSecret, transport)
  private val items = new PagedItems(cfg,
    Map("from" -> ZoomRows.isoFloorSec(part.fromMs),
      "to" -> ZoomRows.isoCeilSec(part.toMs)),
    TokenBucket.orUnlimited(ratePerSec, burst), tokens, transport)
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (items.hasNext) {
      val node = items.next()
      val st = ZoomRows.startTimeOf(node)
      val inWindow = ZoomRows.epochMsOf(st)
        .exists(ms => ms >= part.fromMs && ms < part.toMs)
      if (inWindow && ZoomRows.passes(filters, st)) {
        current = ZoomRows.toRow(node, required)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
