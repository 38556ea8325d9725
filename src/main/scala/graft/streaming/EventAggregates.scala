package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the events stream: watermarked windowed
  * aggregation (late-data bounded state) and custom sessionization state
  * via flatMapGroupsWithState — the streaming counterparts of
  * q10_time_bucket and q14_sessionize.
  *
  * State posture at scale: the windowed agg's state is bounded by the
  * watermark horizon (Spark drops windows older than watermark − lateness);
  * the session state is one small struct per active (user) key, emitted
  * and dropped on inactivity timeout — no unbounded growth.
  */
object EventAggregates {

  /** At-scale state-store posture: the default HDFS-backed store keeps
    * every key's state on the executor HEAP — at 100 TB key cardinality
    * (millions of concurrent sessions / dedup keys per state partition)
    * that heap is the ceiling. RocksDB keeps state off-heap with
    * incremental checkpointing; apply this conf to the SparkSession
    * BEFORE starting streaming queries (EventAggregatesSpec runs the
    * sessionizer under both providers). */
  val RocksDbStateStoreConf: (String, String) =
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class TextEvent(event_id: Long, ts: Timestamp, text: String)

  final case class VecEvent(event_id: Long, ts: Timestamp, vec: Seq[Double])

  final case class SessionState(sessionStart: Long, lastSeen: Long,
      nEvents: Long, totalValue: Double)

  final case class SessionOut(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long, total_value: Double)

  /** Streaming deduplication bounded by the watermark: re-deliveries of
    * the same event_id within the lateness horizon are dropped once;
    * state for an id is evicted when the watermark passes it (so memory
    * is bounded — the streaming analog of exact dedup, and the
    * first-line defense the reference gets from idempotent upserts). */
  def dedupEvents(events: DataFrame,
      lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming NEAR-duplicate suppression: drop events whose `textCol`
    * simhashes to a signature already seen inside the watermark — the
    * streaming analog of the batch SimHash dedup (exact-signature
    * collision; a full banded near-dup would need stream-stream
    * self-join state). State is one 8-byte signature per distinct text
    * within the watermark horizon, expired by event time.
    *
    * NULL texts carry no content to compare, so they BYPASS the dedup
    * (dropDuplicates would treat all NULL keys as equal and silently
    * keep one per horizon). All-whitespace/empty texts share the empty
    * signature and deliberately DO collapse — empty docs are mutual
    * duplicates by content. */
  def dedupNearText(events: DataFrame, textCol: String,
      lateness: String = "1 hour"): DataFrame = {
    val withSig = events
      .withColumn("__sig",
        graft.functions.TextFunctions.simHash(col(textCol)))
      .withWatermark("ts", lateness)
    withSig.where(col("__sig").isNotNull)
      .dropDuplicatesWithinWatermark("__sig")
      .unionByName(withSig.where(col("__sig").isNull))
      .drop("__sig")
  }

  /** Streaming EMBEDDING near-duplicate suppression: the RHP-LSH
    * analog of [[dedupNearText]] — drop events whose embedding lands in
    * a bucket an already-EMITTED event occupies, in ANY of `tables`
    * random-hyperplane tables (the batch construction of
    * `Dedup.embeddingNearDupPairs(approx = true)` / `Similarity.lshTopK`,
    * same [[graft.functions.VectorFunctions.rhpSignature]] hashes, so
    * stream and batch agree on which vectors are near).
    *
    * Construction: one `dropDuplicatesWithinWatermark` PER TABLE,
    * chained. Each stage admits an event only if its table-t signature
    * is unseen among events that reached that stage; an event that
    * survives all stages records its signature in EVERY stage's state.
    * Inductively the emitted stream is pairwise non-colliding across
    * all tables: a later event near-dup of an EMITTED one collides at
    * the first stage it reaches with that table's recorded signature.
    * (Events near-dup ONLY of other *suppressed* events pass — the
    * representative-stream contract, exactly what batch dup-clustering
    * keeps: one representative per near-dup cluster.)
    *
    * State at scale: one row per distinct per-table signature of
    * emitted events inside the watermark horizon — L × |emitted|,
    * watermark-evicted, distributed by signature (L keyed shuffles is
    * the honest streaming price of L hash tables; a single-pass
    * any-table membership test would need an external KV store).
    * RHP signatures are positive-scale-invariant (signs of projections
    * only), so raw vectors hash identically to their normalized forms —
    * no per-event normalization pass. NULL embeddings carry no
    * direction and BYPASS the dedup (as NULL texts do in
    * [[dedupNearText]]); all-ZERO vectors project to signature 0 in
    * every table and deliberately collapse, the empty-text analog. */
  def dedupNearEmbedding(
      events: DataFrame,
      vecCol: String,
      lateness: String = "1 hour",
      bits: Int = 8,
      tables: Int = 4,
      dim: Int = 64): DataFrame = {
    val sigCols = (0 until tables).map { t =>
      graft.functions.VectorFunctions
        .rhpSignature(col(vecCol), bits, dim, seed = 1000L + t)
        .as(s"__rhp_$t")
    }
    val withSig = events
      .select(col("*") +: sigCols: _*)
      .withWatermark("ts", lateness)
    val hashed = withSig.where(col(s"__rhp_0").isNotNull)
    val deduped = (0 until tables).foldLeft(hashed) { (df, t) =>
      df.dropDuplicatesWithinWatermark(s"__rhp_$t")
    }
    deduped.unionByName(withSig.where(col(s"__rhp_0").isNull))
      .drop((0 until tables).map(t => s"__rhp_$t"): _*)
  }

  /** Hourly tumbling-window counts per event type with a 1-hour
    * watermark: events later than that are dropped, bounding state. */
  def hourlyCounts(events: DataFrame,
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sessionization with explicit state: sessions close after `gapMs` of
    * event-time inactivity. In-batch gaps close inline; trailing sessions
    * close via EventTimeTimeout when the WATERMARK passes lastSeen + gap
    * (watermark-driven — no idle micro-batches, unlike a processing-time
    * timeout which keeps the query triggering forever). One output row
    * per CLOSED session. */
  def sessionize(events: Dataset[Event], gapMs: Long,
      lateness: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.sessionStart, s.lastSeen,
              s.nEvents, s.totalValue))
          } else {
            // Spark does NOT drop watermark-late events for
            // flatMapGroupsWithState — filter them explicitly, or a
            // stale event could rewind state below the watermark
            val wmMs = state.getCurrentWatermarkMs()
            val sorted = it.toSeq
              .filter(_.ts.getTime >= wmMs)
              .sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            // strays: in-watermark events older than the open session's
            // backward reach (t + gap < sessionStart). They can never
            // join the open session, but consecutive strays chain into
            // their own session, closed as soon as the stray run ends.
            var strayCur: Option[SessionState] = None
            def closeStray(): Unit = {
              strayCur.foreach(s => closed ::= SessionOut(userId,
                s.sessionStart, s.lastSeen, s.nEvents, s.totalValue))
              strayCur = None
            }
            val gapUs = gapMs * 1000L
            sorted.foreach { e =>
              // ms-precision epoch scaled to µs units (matches the batch
              // analog up to Timestamp's millisecond resolution)
              val t = e.ts.getTime * 1000L
              if (cur.exists(s => t + gapUs < s.sessionStart)) {
                strayCur = strayCur match {
                  case Some(s) if t - s.lastSeen <= gapUs =>
                    Some(s.copy(lastSeen = math.max(s.lastSeen, t),
                      nEvents = s.nEvents + 1,
                      totalValue = s.totalValue + e.value))
                  case other =>
                    other.foreach(s => closed ::= SessionOut(userId,
                      s.sessionStart, s.lastSeen, s.nEvents, s.totalValue))
                    Some(SessionState(t, t, 1, e.value))
                }
              } else {
                closeStray()
                cur match {
                  case Some(s) if t - s.lastSeen <= gapUs =>
                    // merge; start may extend BACKWARD for an
                    // out-of-order event within the session's reach
                    cur = Some(s.copy(
                      sessionStart = math.min(s.sessionStart, t),
                      lastSeen = math.max(s.lastSeen, t),
                      nEvents = s.nEvents + 1,
                      totalValue = s.totalValue + e.value))
                  case Some(s) =>
                    closed ::= SessionOut(userId, s.sessionStart, s.lastSeen,
                      s.nEvents, s.totalValue)
                    cur = Some(SessionState(t, t, 1, e.value))
                  case None =>
                    cur = Some(SessionState(t, t, 1, e.value))
                }
              }
            }
            closeStray()
            cur.foreach { s =>
              state.update(s)
              // close when event-time watermark passes inactivity gap;
              // must stay strictly above the current watermark or Spark
              // rejects the timeout
              state.setTimeoutTimestamp(
                math.max(wmMs + 1, s.lastSeen / 1000L + gapMs))
            }
            closed.reverseIterator
          }
      }
  }
}
