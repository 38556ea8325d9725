package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CDC change-feed consumption over a [[FactVersioned]] table — the
  * reusable primitive behind the q114 composition: "give me the row
  * delta since the last generation I processed, and remember where I
  * am" (the Delta change-data-feed idea over the manifest store).
  *
  * Scale posture: the diff join is restricted to the partitions the
  * unprocessed generations DECLARED touched (their persisted `touched`
  * sets — bytes ∝ touched dirs, delete-aware by round-9 construction),
  * so a poll's cost is ∝ the changed partitions' data at both reads,
  * never a whole-table self-join. A key migrating between partitions
  * is still caught: both its source and destination partitions are in
  * some generation's touched set by definition of the commit.
  *
  * Delivery contract: AT-LEAST-ONCE with an exact replay guard. The
  * bookmark (tiny gen-number file, tmp+bak crash-safe like
  * [[graft.sources.Bookmark]]) commits only AFTER the handler returns,
  * so a crash replays the batch; the batch's `toGen` is the numeric
  * batch id consumers pass to idempotent sinks
  * ([[IncrementalAgg.refresh]]'s `batchId`, [[Upsert.upsert]]'s
  * key-idempotence) — a replayed `(fromGen, toGen]` window produces
  * the IDENTICAL change rows (generations are immutable), so any
  * idempotent consumer converges.
  */
object FactChangeFeed {

  /** One pending change window: `changes` is the row delta
    * transforming generation `fromGen` into `toGen` (Changelog op
    * rows; `fromGen` = -1 means "from empty" — every row an insert). */
  final case class Polled(fromGen: Long, toGen: Long, changes: DataFrame)

  /** Partitions declared touched by generations in (afterGen, head]. */
  private def touchedSince(
      spark: SparkSession,
      tablePath: String,
      afterGen: Long,
      head: Long): Set[String] =
    FactVersioned.generations(spark, tablePath)
      .filter(g => g > afterGen && g <= head)
      .flatMap(FactVersioned.readTouched(spark, tablePath, _)).toSet

  /** The pending change window after `afterGen` (None = from the
    * beginning), or None when the head is already processed. Pure
    * computation — commits nothing. */
  def pending(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      afterGen: Option[Long]): Option[Polled] = {
    val gens = FactVersioned.generations(spark, tablePath)
    require(gens.nonEmpty, s"no committed generations at $tablePath")
    val head = gens.max
    afterGen match {
      case Some(a) if a >= head => None
      case a => Some(Polled(a.getOrElse(-1L), head,
        window(spark, tablePath, keys, a, head)))
    }
  }

  /** The change rows transforming generation `afterGen` (None = empty)
    * into `toGen` — [[pending]]'s diff with an explicit upper bound,
    * so a streaming consumer ([[graft.streaming.ChangeFeedSource]])
    * can REPLAY a committed `(afterGen, toGen]` window exactly even
    * after further generations landed (generations are immutable, so
    * the replay is bit-identical). */
  def window(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      afterGen: Option[Long],
      toGen: Long): DataFrame = {
    val gens = FactVersioned.generations(spark, tablePath)
    require(gens.contains(toGen),
      s"generation $toGen does not exist at $tablePath " +
        s"(have ${gens.mkString(",")})")
    afterGen match {
      case Some(a) =>
        require(a < toGen,
          s"window ($a, $toGen] is empty or inverted")
        require(gens.contains(a),
          s"bookmarked generation $a no longer exists at $tablePath " +
            s"(have ${gens.mkString(",")}) — retention outran the " +
            "consumer; re-seed from a full read")
        val dirs = touchedSince(spark, tablePath, a, toGen).toSeq.sorted
        val from1 = FactVersioned.readDirs(spark, tablePath, Some(a), dirs)
        val to = FactVersioned.readDirs(spark, tablePath, Some(toGen), dirs)
        // a window crossing a RENAME commit: each generation reads
        // under its OWN era's logical names (the VERSION AS OF
        // posture), so the from-side frame may name a column by its
        // pre-rename spelling while the to-side uses the new one.
        // Physical names are pinned forever, so the column mappings
        // give the exact identity: translate from-side logical →
        // physical (era-a colmap) → window-end logical (era-toGen
        // colmap reversed). Without this, a renamed value column would
        // look dropped-and-added — null-filled on the from side — and
        // EVERY carried row would surface as an update with its old
        // value erased. A column genuinely dropped between a and toGen
        // keeps its physical spelling here and falls out of the final
        // to-columns projection, exactly as before.
        val from0 = {
          val mapA = FactVersioned.generationColMap(spark, tablePath, Some(a))
          val mapToFull = FactVersioned
            .generationColMap(spark, tablePath, Some(toGen))
          val mapTo = mapToFull.filterNot(_._1.contains('.'))
            .map { case (l, p) => p.toLowerCase -> l }
          // NESTED renames translate the same way, path-wise: era-a
          // logical → physical (era-a dotted entries) → window-end
          // logical (era-toGen dotted entries, reversed onto physical
          // paths). Leaf-name case is reconciled by the conformTo
          // rebuild below (case-insensitive field match).
          val nestedA = mapA.collect { case (k, v) if k.contains('.') =>
            k.split('.').toSeq -> v }
          val revToNested: Map[Seq[String], String] =
            mapToFull.collect { case (k, v) if k.contains('.') =>
              val lpath = k.split('.').toSeq
              val ppath = lpath.indices.map { i =>
                val prefix = lpath.take(i + 1).mkString(".")
                val phys =
                  if (i == lpath.length - 1) v
                  else if (i == 0) mapToFull.getOrElse(lpath(i), lpath(i))
                  else mapToFull.getOrElse(prefix, lpath(i))
                phys.toLowerCase
              }
              (ppath: Seq[String]) -> lpath.last
            }
          def renameFieldsType(
              dt: org.apache.spark.sql.types.DataType,
              lpath: Seq[String],
              ppath: Seq[String]): org.apache.spark.sql.types.DataType =
            dt match {
              case st: org.apache.spark.sql.types.StructType =>
                org.apache.spark.sql.types.StructType(st.fields.map { f =>
                  val lp = lpath :+ f.name.toLowerCase
                  val physLeaf = nestedA.getOrElse(lp, f.name)
                  val pp = ppath :+ physLeaf.toLowerCase
                  f.copy(name = revToNested.getOrElse(pp, physLeaf),
                    dataType = renameFieldsType(f.dataType, lp, pp))
                })
              case ar: org.apache.spark.sql.types.ArrayType =>
                ar.copy(elementType =
                  renameFieldsType(ar.elementType, lpath, ppath))
              case mp: org.apache.spark.sql.types.MapType =>
                mp.copy(valueType =
                  renameFieldsType(mp.valueType, lpath, ppath))
              case other => other
            }
          val cols = from1.schema.fields.map { f =>
            val phys = mapA.getOrElse(f.name.toLowerCase, f.name)
            // the colmap stores lower-cased logical keys — pin the
            // translated name to the to-side's ACTUAL spelling so the
            // case-sensitive null-fill/projection below line up
            val endName0 = mapTo.getOrElse(phys.toLowerCase, phys)
            val endName = to.columns.find(_.equalsIgnoreCase(endName0))
              .getOrElse(endName0)
            val newType = renameFieldsType(f.dataType,
              Seq(f.name.toLowerCase), Seq(phys.toLowerCase))
            val c = org.apache.spark.sql.functions.col(f.name)
            (if (newType == f.dataType) c else c.cast(newType)).as(endName)
          }
          from1.select(cols.toIndexedSeq: _*)
        }
        // a window crossing an ADDITIVE evolution commit: the from-side
        // generation lacks the added columns — fill them EXACTLY how
        // the evolved generation reads the carried files: the column's
        // recorded ADD COLUMN default when one exists (else null), so
        // carried rows whose to-side read is just the default emit
        // NOTHING, and rows that genuinely changed surface. A window
        // crossing a NESTED add/drop leaves a shared column with a
        // narrower/wider struct type on the from side — conform it to
        // the to-side type with the SAME posture (null-fill added
        // nested fields, project dropped ones away, recursively
        // through arrays and map values), so the diff compares the
        // shapes the evolved generation itself reads instead of
        // throwing an opaque resolution error out of the union below
        val toDefaults =
          FactVersioned.columnDefaults(spark, tablePath, Some(toGen))
        val fromTypes = from0.schema.fields.map(f => f.name -> f.dataType).toMap
        val from = from0.select(to.schema.fields.map { f =>
          fromTypes.get(f.name) match {
            case None => toDefaults.get(f.name.toLowerCase)
              .map(org.apache.spark.sql.functions.expr)
              .getOrElse(org.apache.spark.sql.functions.lit(null))
              .cast(f.dataType).as(f.name)
            case Some(ft) if ft == f.dataType =>
              org.apache.spark.sql.functions.col(f.name)
            case Some(ft) => conformTo(
              org.apache.spark.sql.functions.col(f.name), ft, f.dataType)
              .as(f.name)
          }
        }.toIndexedSeq: _*)
        Changelog.changeSet(from, to, keys,
          dedupNullKeyed = true, emitDeletes = true)
      case None =>
        val to = FactVersioned.read(spark, tablePath, Some(toGen))
        val empty = to.limit(0)
        Changelog.changeSet(empty, to, keys,
          dedupNullKeyed = true, emitDeletes = true)
    }
  }

  /** Rebuild `e` (typed `from`) as the structurally-evolved type `to`:
    * struct fields are matched by name case-insensitively, fields
    * `to` adds are null-filled, fields it drops fall away, arrays and
    * map VALUES conform element-wise (map keys never evolve — the DDL
    * doors reject key evolution as a lookup-identity change), leaves
    * cast. The expression twin of parquet schema clipping: a carried
    * file read under the evolved pinned schema produces exactly these
    * values, so a CDC window spanning the evolution diffs what the
    * evolved generation itself reads. Null-ness of intermediate
    * structs is preserved — a null struct stays null instead of
    * becoming a struct of nulls. */
  private def conformTo(
      e: org.apache.spark.sql.Column,
      from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, struct, transform, transform_values, when}
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    (from, to) match {
      case (f, t) if f == t => e
      case (f: StructType, t: StructType) =>
        val rebuilt = struct(t.fields.map { tf =>
          f.fields.find(_.name.equalsIgnoreCase(tf.name)) match {
            case Some(ff) =>
              conformTo(e.getField(ff.name), ff.dataType, tf.dataType)
                .as(tf.name)
            case None => lit(null).cast(tf.dataType).as(tf.name)
          }
        }.toIndexedSeq: _*)
        when(e.isNull, lit(null).cast(t)).otherwise(rebuilt)
      case (f: ArrayType, t: ArrayType) =>
        transform(e, x => conformTo(x, f.elementType, t.elementType))
      case (f: MapType, t: MapType) =>
        transform_values(e,
          (_, v) => conformTo(v, f.valueType, t.valueType))
      case (_, t) => e.cast(t)
    }
  }

  /** One subscription step: read the bookmark, compute the pending
    * window, run `handler`, commit the bookmark AFTER success. Returns
    * the processed window, or None when already caught up. */
  def poll(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      bookmarkPath: String)(handler: Polled => Unit): Option[Polled] = {
    val last = readBookmark(spark, bookmarkPath)
    val p = pending(spark, tablePath, keys, last)
    p.foreach { w =>
      handler(w)
      commitBookmark(spark, bookmarkPath, w.toGen)
    }
    p
  }

  /** Last processed generation, if any. Falls back to `.bak` so a
    * crash mid-commit never loses a committed position. */
  def readBookmark(spark: SparkSession, path: String): Option[Long] = {
    val hp = new Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readFile(p: Path): Option[Long] =
      try {
        if (!fs.exists(p)) None
        else {
          val in = fs.open(p)
          try {
            val bytes = new Array[Byte](64)
            val n = in.read(bytes)
            new String(bytes, 0, math.max(n, 0), StandardCharsets.UTF_8)
              .trim.toLongOption
          } finally in.close()
        }
      } catch { case _: Exception => None }
    readFile(hp).orElse(readFile(new Path(path + ".bak")))
  }

  private def commitBookmark(
      spark: SparkSession, path: String, gen: Long): Unit = {
    val hp = new Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".tmp")
    val bak = new Path(path + ".bak")
    val out = fs.create(tmp, true)
    try out.write(gen.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(bak)) fs.delete(bak, false)
    if (fs.exists(hp)) fs.rename(hp, bak)
    require(fs.rename(tmp, hp),
      s"FactChangeFeed: bookmark commit rename failed at $path")
  }
}
