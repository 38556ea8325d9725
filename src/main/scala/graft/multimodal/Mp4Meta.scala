package graft.multimodal

import scala.collection.mutable.ListBuffer

/** Pure-JVM MP4/ISO-BMFF box parser for video METADATA — duration,
  * pixel dimensions, sample-entry codec fourcc, major brand — without
  * any codec: the container structure (ISO/IEC 14496-12) is plain
  * length-prefixed boxes, so `moov/mvhd` (timescale+duration),
  * `moov/trak/tkhd` (16.16 fixed-point width/height) and
  * `moov/trak/mdia/minf/stbl/stsd` (first sample-entry fourcc) parse
  * from bytes alone. Frame DECODE stays out of scope (no H.264 codec
  * in the JVM); the reference moves recording bytes without decoding
  * them either (lambda/zoom_webhook/handler.py:72-97) — this upgrades
  * video columns from path-metadata to parsed-container truth.
  *
  * Malformed/non-BMFF bytes ⇒ Left, which [[Media.videoMetadata]]
  * routes to the VALIDATION dead-letter channel like any other
  * undecodable media. */
object Mp4Meta {

  final case class VideoMeta(
      brand: String,        // ftyp major brand, e.g. "isom", "mp42"
      duration_ms: Long,    // mvhd duration scaled to milliseconds
      width: Option[Int],   // first video trak's tkhd width (integer px)
      height: Option[Int],
      codec: Option[String], // stsd first sample-entry fourcc, e.g. avc1
      frame_count: Option[Long],     // Σ stts sample_count (video trak)
      fps: Option[Double],           // frames / (Σ count·delta / mdhd ts)
      media_timescale: Option[Long], // video trak's mdhd timescale
      language: Option[String])      // mdhd ISO-639-2/T code, e.g. "eng"

  private final case class Box(tpe: String, payloadStart: Int,
      payloadEnd: Int)

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  private final class Malformed(msg: String)
      extends RuntimeException(msg)

  /** Flat box scan of [start, end): size(u32) + type(4cc), with the
    * size==1 largesize and size==0 to-end forms. Throws Malformed on
    * impossible sizes or non-printable type codes — garbage bytes must
    * fail parsing, not yield phantom boxes. */
  private def boxesIn(bytes: Array[Byte], start: Int,
      end: Int): List[Box] = {
    val out = ListBuffer.empty[Box]
    var off = start
    while (off < end) {
      if (off + 8 > end) throw new Malformed(s"truncated box header at $off")
      val size32 = u32(bytes, off)
      val tpe = fourcc(bytes, off + 4)
      if (!tpe.forall(c => c >= ' ' && c < 127))
        throw new Malformed(s"non-ASCII box type at $off")
      var header = 8
      val size: Long =
        if (size32 == 1L) {
          if (off + 16 > end) throw new Malformed("truncated largesize")
          header = 16
          u64(bytes, off + 8)
        } else if (size32 == 0L) (end - off).toLong
        else size32
      if (size < header || off + size > end)
        throw new Malformed(s"box '$tpe' size $size exceeds bounds")
      out += Box(tpe, off + header, off + size.toInt)
      off += size.toInt
    }
    out.toList
  }

  private def child(bytes: Array[Byte], parent: Box,
      tpe: String): Option[Box] =
    boxesIn(bytes, parent.payloadStart, parent.payloadEnd)
      .find(_.tpe == tpe)

  /** mvhd: version/flags, then (v0: u32×2 times, u32 timescale, u32
    * duration | v1: u64×2 times, u32 timescale, u64 duration). */
  private def durationMsOf(bytes: Array[Byte], mvhd: Box): Long = {
    val p = mvhd.payloadStart
    if (p >= mvhd.payloadEnd) throw new Malformed("empty mvhd")
    val version = bytes(p) & 0xff
    // bound the reads to THIS box's payload: an undersized mvhd must
    // dead-letter, not silently read the sibling box's bytes
    val needed = if (version == 1) 32 else 20
    if (p + needed > mvhd.payloadEnd) throw new Malformed("truncated mvhd")
    val (timescale, duration) =
      if (version == 1) (u32(bytes, p + 20), u64(bytes, p + 24))
      else (u32(bytes, p + 12), u32(bytes, p + 16))
    if (timescale <= 0) throw new Malformed("mvhd timescale 0")
    // a v1 duration is an attacker-controlled u64: duration*1000 past
    // Long.MaxValue would silently wrap to a bogus (possibly negative)
    // duration_ms — dead-letter it like every other malformed field
    if (duration < 0 || duration > Long.MaxValue / 1000L)
      throw new Malformed("implausible mvhd duration")
    duration * 1000L / timescale
  }

  /** tkhd width/height: 16.16 fixed-point u32s after the matrix —
    * payload offset 76 (v0) / 88 (v1). Zero for non-visual tracks. */
  private def dimsOf(bytes: Array[Byte], tkhd: Box): (Int, Int) = {
    val p = tkhd.payloadStart
    val o = if ((bytes(p) & 0xff) == 1) p + 88 else p + 76
    if (o + 8 > tkhd.payloadEnd) throw new Malformed("truncated tkhd")
    ((u32(bytes, o) >> 16).toInt, (u32(bytes, o + 4) >> 16).toInt)
  }

  /** stsd: version/flags + entry count, then sample entries
    * (size + fourcc). The fourcc of the first entry is the codec id. */
  private def codecOf(bytes: Array[Byte], stsd: Box): Option[String] = {
    val p = stsd.payloadStart
    if (p + 16 > stsd.payloadEnd || u32(bytes, p + 4) == 0) None
    else Some(fourcc(bytes, p + 12))
  }

  /** mdhd: media timescale, media duration (in timescale units) and
    * the packed ISO-639-2/T language. v0 puts (ts u32, dur u32, lang
    * u16) at payload offsets 12/16/20; v1 (64-bit times) at 20/24/32. */
  private def mdhdOf(bytes: Array[Byte], mdhd: Box):
      (Long, Long, Option[String]) = {
    val p = mdhd.payloadStart
    if (p >= mdhd.payloadEnd) throw new Malformed("empty mdhd")
    val version = bytes(p) & 0xff
    val needed = if (version == 1) 34 else 22
    if (p + needed > mdhd.payloadEnd) throw new Malformed("truncated mdhd")
    val (ts, dur, langOff) =
      if (version == 1) (u32(bytes, p + 20), u64(bytes, p + 24), p + 32)
      else (u32(bytes, p + 12), u32(bytes, p + 16), p + 20)
    if (ts <= 0) throw new Malformed("mdhd timescale 0")
    if (dur < 0) throw new Malformed("implausible mdhd duration")
    val packed = (((bytes(langOff) & 0xff) << 8) |
      (bytes(langOff + 1) & 0xff)) & 0x7fff
    // three 5-bit chars biased by 0x60; 0 (unset) or any char outside
    // a-z means "no language recorded", not a parse failure
    val chars = Seq(10, 5, 0).map(s => (((packed >> s) & 0x1f) + 0x60).toChar)
    val lang =
      if (chars.forall(c => c >= 'a' && c <= 'z')) Some(chars.mkString)
      else None
    (ts, dur, lang)
  }

  /** stts (decoding time-to-sample): entries of (sample_count,
    * sample_delta). Frame count = Σ count; total media units =
    * Σ count·delta — with the media timescale this yields fps. */
  private def sttsOf(bytes: Array[Byte], stts: Box): (Long, Long) = {
    val p = stts.payloadStart
    if (p + 8 > stts.payloadEnd) throw new Malformed("truncated stts")
    val n = u32(bytes, p + 4)
    if (p + 8 + n * 8 > stts.payloadEnd)
      throw new Malformed("stts entry count exceeds box")
    var frames = 0L
    var units = 0L
    var i = 0L
    while (i < n) {
      val off = (p + 8 + i * 8).toInt
      val count = u32(bytes, off)
      val delta = u32(bytes, off + 4)
      frames = math.addExact(frames, count)
      units = math.addExact(units, math.multiplyExact(count, delta))
      i += 1
    }
    (frames, units)
  }

  /** Parse container metadata. Requires a well-formed box stream with
    * `ftyp` and `moov/mvhd`; width/height/codec come from the first
    * trak with nonzero tkhd dimensions (the video track), falling back
    * to the first trak's codec for audio-only containers. */
  def parse(bytes: Array[Byte]): Either[String, VideoMeta] =
    try {
      val top = boxesIn(bytes, 0, bytes.length)
      val ftyp = top.find(_.tpe == "ftyp").getOrElse(
        throw new Malformed("no ftyp box"))
      if (ftyp.payloadEnd - ftyp.payloadStart < 4)
        throw new Malformed("truncated ftyp")
      val brand = fourcc(bytes, ftyp.payloadStart)
      val moov = top.find(_.tpe == "moov").getOrElse(
        throw new Malformed("no moov box"))
      val mvhd = child(bytes, moov, "mvhd").getOrElse(
        throw new Malformed("no mvhd box"))
      val durationMs = durationMsOf(bytes, mvhd)
      val traks = boxesIn(bytes, moov.payloadStart, moov.payloadEnd)
        .filter(_.tpe == "trak")
      val perTrak = traks.map { trak =>
        val dims = child(bytes, trak, "tkhd").map(dimsOf(bytes, _))
        val mdia = child(bytes, trak, "mdia")
        val stbl = for {
          m <- mdia
          minf <- child(bytes, m, "minf")
          sb <- child(bytes, minf, "stbl")
        } yield sb
        val codec = for {
          sb <- stbl
          stsd <- child(bytes, sb, "stsd")
          c <- codecOf(bytes, stsd)
        } yield c
        val mdhd = mdia.flatMap(child(bytes, _, "mdhd"))
          .map(mdhdOf(bytes, _))
        val stts = stbl.flatMap(child(bytes, _, "stts"))
          .map(sttsOf(bytes, _))
        (dims, codec, mdhd, stts)
      }
      val visual = perTrak.find(_._1.exists(d => d._1 > 0 && d._2 > 0))
      val dims = visual.flatMap(_._1)
      val codec = visual.flatMap(_._2)
        .orElse(perTrak.flatMap(_._2).headOption)
      val mdhd = visual.flatMap(_._3)
      val stts = visual.flatMap(_._4)
      val frameCount = stts.map(_._1)
      val fps = for {
        (frames, units) <- stts if frames > 0 && units > 0
        (ts, _, _) <- mdhd
      } yield frames.toDouble * ts / units
      Right(VideoMeta(brand, durationMs,
        dims.map(_._1), dims.map(_._2), codec,
        frameCount, fps, mdhd.map(_._1), mdhd.flatMap(_._3)))
    } catch {
      case m: Malformed => Left(s"undecodable: ${m.getMessage}")
      case _: IndexOutOfBoundsException =>
        Left("undecodable: truncated ISO-BMFF structure")
    }
}
