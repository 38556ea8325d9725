package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructType}

import graft.operators.{Changelog, FactChangeFeed, FactVersioned}

/** Structured Streaming READ of a [[FactVersioned]] table's change
  * feed — Delta's `readChangeFeed` posture over the manifest store:
  * consumers subscribe with a plain `readStream` instead of the
  * hand-rolled [[FactChangeFeed.poll]] loop, and the ENGINE owns the
  * bookmark (checkpointed offsets, exactly-once window delivery
  * across restarts).
  *
  * {{{
  *   spark.readStream
  *     .format("graft.streaming.ChangeFeedProvider")
  *     .option("path", tablePath)
  *     .option("keys", "k1,k2")
  *     .load()                       // rows: table columns + `op`
  * }}}
  *
  * Offsets are GENERATION NUMBERS: micro-batch `(a, b]` carries
  * exactly [[FactChangeFeed.window]]'s change rows (insert /
  * update_pre / update_post / delete) between those committed
  * generations. Generations are immutable, so a window REPLAYED after
  * a crash (the checkpoint's committed offset pair) is bit-identical
  * — at-least-once delivery with exact replay, which any idempotent
  * sink (keyed upsert, [[FactStreamSink]]'s marker) turns into
  * exactly-once. Retention outrunning a stopped consumer fails loudly
  * on restart (the bookmarked generation no longer exists), same as
  * the poll loop.
  *
  * Implemented as a V1 `Source` — the one streaming API whose
  * `getBatch` returns a whole DataFrame, which is what a change feed
  * IS (a computed diff plan over two generation reads, cost ∝ the
  * window's declared-touched partitions). The plan's lazy
  * `InternalRow` RDD is wrapped as a single streaming-marked leaf
  * (the FileStreamSource recipe, via
  * [[org.apache.spark.sql.GraftColumnBridge.streamingDataFrame]]):
  * work runs inside the micro-batch, and the diff's internal joins
  * stay BATCH operators instead of being re-planned as stateful
  * streaming joins.
  *
  * One source instance serves one run of one query (Spark constructs
  * it per stream start) — the schema is pinned at construction from
  * the head generation; an additive schema evolution mid-stream
  * surfaces on restart, matching the fixed-schema contract of every
  * streaming source. */
class ChangeFeedProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changefeed"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-changefeed: set .option(\"path\", <FactVersioned table>)"))

  private def keysOf(parameters: Map[String, String]): Seq[String] = {
    val ks = parameters.getOrElse("keys", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(ks.nonEmpty, "graft-changefeed: set .option(\"keys\", \"k1,k2\")")
    ks
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), ChangeFeedSource.schemaFor(
      sqlContext.sparkSession, pathOf(parameters)))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new ChangeFeedSource(sqlContext.sparkSession,
      pathOf(parameters), keysOf(parameters))
}

object ChangeFeedSource {
  /** Change-row schema: the table's (head-generation) columns plus the
    * `op` discriminator — [[Changelog.changeSet]]'s output shape. */
  def schemaFor(spark: SparkSession, tablePath: String): StructType =
    FactVersioned.read(spark, tablePath).schema
      .add(Changelog.OpCol, StringType)
}

class ChangeFeedSource(
    spark: SparkSession,
    tablePath: String,
    keys: Seq[String]) extends Source {

  override val schema: StructType =
    ChangeFeedSource.schemaFor(spark, tablePath)

  private def genOf(o: V1Offset): Long = o match {
    case lo: LongOffset => lo.offset
    case so: SerializedOffset => so.json.toLong
    case other => other.json().toLong
  }

  /** Head committed generation — the engine plans a batch whenever
    * this passes the last committed offset. */
  override def getOffset: Option[V1Offset] = {
    val gens = FactVersioned.generations(spark, tablePath)
    if (gens.isEmpty) None else Some(LongOffset(gens.max))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val to = genOf(end)
    val after = start.map(genOf)
    val changes =
      FactChangeFeed.window(spark, tablePath, keys, after, to)
        .select(schema.fieldNames.toIndexedSeq
          .map(org.apache.spark.sql.functions.col): _*)
    GraftColumnBridge.streamingDataFrame(spark,
      changes.queryExecution.toRdd, schema)
  }

  override def commit(end: V1Offset): Unit = () // offsets live in the checkpoint

  override def stop(): Unit = ()
}
