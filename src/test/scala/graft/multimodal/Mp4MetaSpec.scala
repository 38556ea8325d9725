package graft.multimodal

import java.nio.ByteBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Box-level guards for the ISO-BMFF parser: version-1 headers,
  * largesize/to-end size forms, truncation and garbage all behave —
  * built inline so each byte layout is visible (the committed
  * `tiny.mp4` fixture covers the common v0 path through MediaSpec). */
class Mp4MetaSpec extends AnyFunSuite {

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length)
    bb.put(tpe.getBytes("ISO-8859-1"))
    bb.put(payload)
    bb.array()
  }

  private def ftyp(brand: String = "isom"): Array[Byte] =
    box("ftyp", brand.getBytes("ISO-8859-1") ++ new Array[Byte](4))

  /** mvhd with VERSION 1: 64-bit times/duration. */
  private def mvhdV1(timescale: Int, duration: Long): Array[Byte] = {
    val p = ByteBuffer.allocate(112)
    p.put(1.toByte)           // version
    p.position(4 + 8 + 8)     // skip flags + creation/modification u64s
    p.putInt(timescale)
    p.putLong(duration)
    box("mvhd", p.array())
  }

  /** tkhd with VERSION 1: dims at payload offset 88. */
  private def tkhdV1(w: Int, h: Int): Array[Byte] = {
    val p = ByteBuffer.allocate(96)
    p.put(1.toByte)
    p.position(88)
    p.putInt(w << 16)
    p.putInt(h << 16)
    box("tkhd", p.array())
  }

  private def stsd(fourcc: String): Array[Byte] = {
    val entry = ByteBuffer.allocate(16)
    entry.putInt(16)
    entry.put(fourcc.getBytes("ISO-8859-1"))
    val p = ByteBuffer.allocate(8)
    p.position(4)
    p.putInt(1) // entry_count
    box("stsd", p.array() ++ entry.array())
  }

  private def minimalV1: Array[Byte] = {
    val trak = box("trak", tkhdV1(1920, 1080) ++
      box("mdia", box("minf", box("stbl", stsd("hvc1")))))
    ftyp("mp42") ++ box("moov", mvhdV1(90000, 450000L) ++ trak)
  }

  test("version-1 mvhd/tkhd parse: 64-bit duration, offset-88 dims") {
    val m = Mp4Meta.parse(minimalV1).toOption.get
    assert(m.brand === "mp42")
    assert(m.duration_ms === 5000L) // 450000 / 90000 ticks = 5 s
    assert(m.width === Some(1920) && m.height === Some(1080))
    assert(m.codec === Some("hvc1"))
  }

  test("size==0 (to end of file) box form parses") {
    val body = mvhdV1(1000, 2000L)
    val moovPayload = body
    val bb = ByteBuffer.allocate(8 + moovPayload.length)
    bb.putInt(0) // size 0: box extends to EOF
    bb.put("moov".getBytes("ISO-8859-1"))
    bb.put(moovPayload)
    val m = Mp4Meta.parse(ftyp() ++ bb.array()).toOption.get
    assert(m.duration_ms === 2000L)
    assert(m.width === None && m.codec === None) // no trak: metadata-only
  }

  test("largesize (size==1) box form parses") {
    val payload = mvhdV1(1000, 3000L)
    val bb = ByteBuffer.allocate(16 + payload.length)
    bb.putInt(1) // size 1: 64-bit largesize follows the type
    bb.put("moov".getBytes("ISO-8859-1"))
    bb.putLong(16L + payload.length)
    bb.put(payload)
    val m = Mp4Meta.parse(ftyp() ++ bb.array()).toOption.get
    assert(m.duration_ms === 3000L)
  }

  /** mdhd with the given version: timescale/duration/packed language. */
  private def mdhd(version: Int, timescale: Int, duration: Long,
      lang: String): Array[Byte] = {
    val packed = lang.foldLeft(0)((a, c) => (a << 5) | (c - 0x60))
    if (version == 1) {
      val p = ByteBuffer.allocate(36)
      p.put(1.toByte)
      p.position(4 + 8 + 8) // flags + creation/modification u64s
      p.putInt(timescale)
      p.putLong(duration)
      p.putShort(packed.toShort)
      box("mdhd", p.array())
    } else {
      val p = ByteBuffer.allocate(24)
      p.position(12)
      p.putInt(timescale)
      p.putInt(duration.toInt)
      p.putShort(packed.toShort)
      box("mdhd", p.array())
    }
  }

  private def stts(entries: (Int, Int)*): Array[Byte] = {
    val p = ByteBuffer.allocate(8 + entries.length * 8)
    p.position(4)
    p.putInt(entries.length)
    entries.foreach { case (c, d) => p.putInt(c); p.putInt(d) }
    box("stts", p.array())
  }

  test("v0 mdhd + multi-entry stts: frame count, fps, timescale, lang") {
    // 90 frames at delta 1000 + 10 at delta 500: 100 frames over
    // 95000 units at timescale 30000 → fps = 100*30000/95000
    val trak = box("trak", tkhdV1(640, 480) ++
      box("mdia", mdhd(0, 30000, 95000L, "eng") ++
        box("minf", box("stbl",
          stsd("avc1") ++ stts((90, 1000), (10, 500))))))
    val m = Mp4Meta.parse(
      ftyp() ++ box("moov", mvhdV1(1000, 5000L) ++ trak)).toOption.get
    assert(m.frame_count === Some(100L))
    assert(m.fps === Some(100.0 * 30000 / 95000))
    assert(m.media_timescale === Some(30000L))
    assert(m.language === Some("eng"))
  }

  test("v1 mdhd parses 64-bit duration and offset-32 language") {
    val trak = box("trak", tkhdV1(640, 480) ++
      box("mdia", mdhd(1, 90000, 450000L, "deu") ++
        box("minf", box("stbl", stsd("hvc1") ++ stts((125, 3600))))))
    val m = Mp4Meta.parse(
      ftyp() ++ box("moov", mvhdV1(1000, 5000L) ++ trak)).toOption.get
    assert(m.media_timescale === Some(90000L))
    assert(m.language === Some("deu"))
    assert(m.frame_count === Some(125L))
    assert(m.fps === Some(125.0 * 90000 / (125L * 3600)))
  }

  test("absent mdhd/stts and unset language degrade to None, not Left") {
    // minimalV1 has no mdhd/stts at all
    val m = Mp4Meta.parse(minimalV1).toOption.get
    assert(m.frame_count === None && m.fps === None &&
      m.media_timescale === None && m.language === None)
    // language 0 (unset) and an empty stts: fields None, parse fine
    val trak = box("trak", tkhdV1(64, 48) ++
      box("mdia", mdhd(0, 1000, 1000L, "```") ++ // packed 0
        box("minf", box("stbl", stsd("avc1") ++ stts()))))
    val m2 = Mp4Meta.parse(
      ftyp() ++ box("moov", mvhdV1(1000, 1000L) ++ trak)).toOption.get
    assert(m2.language === None)
    assert(m2.frame_count === Some(0L) && m2.fps === None)
    // truncated mdhd (payload too small for v0 fields) must dead-letter
    val badTrak = box("trak", tkhdV1(64, 48) ++
      box("mdia", box("mdhd", new Array[Byte](8)) ++
        box("minf", box("stbl", stsd("avc1")))))
    assert(Mp4Meta.parse(
      ftyp() ++ box("moov", mvhdV1(1000, 1000L) ++ badTrak)).isLeft)
    // stts entry count exceeding its box must dead-letter
    val lyingStts = {
      val p = ByteBuffer.allocate(8)
      p.position(4)
      p.putInt(100000) // claims 100k entries in an 8-byte payload
      box("stts", p.array())
    }
    val lyingTrak = box("trak", tkhdV1(64, 48) ++
      box("mdia", mdhd(0, 1000, 1000L, "eng") ++
        box("minf", box("stbl", stsd("avc1") ++ lyingStts))))
    assert(Mp4Meta.parse(
      ftyp() ++ box("moov", mvhdV1(1000, 1000L) ++ lyingTrak)).isLeft)
  }

  test("garbage, truncation and structural lies are Left, not throws") {
    assert(Mp4Meta.parse("definitely not a video".getBytes).isLeft)
    assert(Mp4Meta.parse(Array.emptyByteArray).isLeft)
    val good = minimalV1
    assert(Mp4Meta.parse(good.take(good.length - 10)).isLeft) // truncated
    assert(Mp4Meta.parse(ftyp()).isLeft)                      // no moov
    // a box claiming a size past EOF must fail loudly
    val lying = ByteBuffer.allocate(16)
    lying.putInt(9999)
    lying.put("moov".getBytes("ISO-8859-1"))
    assert(Mp4Meta.parse(ftyp() ++ lying.array()).isLeft)
    // an UNDERSIZED mvhd (well-formed box, payload too small for its
    // version's fields) must dead-letter, not read the sibling box
    val tinyMvhd = box("mvhd", new Array[Byte](8)) // v0 needs 20
    assert(Mp4Meta.parse(ftyp() ++ box("moov", tinyMvhd)).isLeft)
    // audio-only container: no dims, codec still reported
    val audioTrak = box("trak",
      box("mdia", box("minf", box("stbl", stsd("mp4a")))))
    val m = Mp4Meta.parse(ftyp() ++
      box("moov", mvhdV1(1000, 1000L) ++ audioTrak)).toOption.get
    assert(m.width === None && m.codec === Some("mp4a"))
  }
}
