#!/usr/bin/env python3
"""Generate the committed ISO-BMFF test fixture
(src/test/resources/fixtures/tiny.mp4) and print the hex constants the
q79_video_meta query embeds (the constant ftyp/moov-header/mvhd-prefix/
trak boxes around a per-row variable duration). Pure stdlib — run it to
regenerate either; the byte layout is ISO/IEC 14496-12 §8.2/§8.3/§8.5.
"""
import struct


def box(tpe: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tpe + payload


def ftyp() -> bytes:
    return box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")


def mvhd_v0(timescale: int, duration: int) -> bytes:
    p = bytearray(100)
    struct.pack_into(">I", p, 12, timescale)
    struct.pack_into(">I", p, 16, duration)
    struct.pack_into(">I", p, 20, 0x00010000)  # rate 1.0
    struct.pack_into(">H", p, 24, 0x0100)      # volume 1.0
    struct.pack_into(">I", p, 36, 0x00010000)  # identity matrix
    struct.pack_into(">I", p, 52, 0x00010000)
    struct.pack_into(">I", p, 68, 0x40000000)
    struct.pack_into(">I", p, 96, 2)           # next track id
    return box(b"mvhd", bytes(p))


def trak(width: int, height: int, fourcc: bytes) -> bytes:
    t = bytearray(84)
    struct.pack_into(">I", t, 12, 1)           # track_id
    struct.pack_into(">I", t, 20, 5000)        # duration (ticks)
    struct.pack_into(">I", t, 40, 0x00010000)  # identity matrix
    struct.pack_into(">I", t, 56, 0x00010000)
    struct.pack_into(">I", t, 72, 0x40000000)
    struct.pack_into(">I", t, 76, width << 16)
    struct.pack_into(">I", t, 80, height << 16)
    tkhd = box(b"tkhd", bytes(t))
    entry = struct.pack(">I", 16) + fourcc + bytes(8)
    stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
    return box(b"trak",
               tkhd + box(b"mdia", box(b"minf", box(b"stbl", stsd))))


def main() -> None:
    # the committed fixture: 5 s at timescale 1000, one 320x240 avc1 trak
    data = ftyp() + box(b"moov", mvhd_v0(1000, 5000) + trak(320, 240, b"avc1"))
    path = "src/test/resources/fixtures/tiny.mp4"
    with open(path, "wb") as f:
        f.write(data)
    print(f"wrote {path} ({len(data)} bytes)")

    # q79's constants: mvhd with duration spliced in by the query, the
    # trak fully constant. The mvhd prefix runs up to (and excluding)
    # the 4-byte big-endian duration at payload offset 16; the suffix
    # is everything after it.
    mv = mvhd_v0(1000, 0xDEADBEEF)
    d = mv.index(struct.pack(">I", 0xDEADBEEF))
    tr = trak(320, 240, b"avc1")
    moov_hdr = struct.pack(">I", 8 + len(mv) + len(tr)) + b"moov"
    print("FTYP_HEX =", ftyp().hex().upper())
    print("MOOV_HDR_HEX =", moov_hdr.hex().upper())
    print("MVHD_PREFIX_HEX =", mv[:d].hex().upper())
    print("MVHD_SUFFIX_HEX =", mv[d + 4:].hex().upper())
    print("TRAK_HEX =", tr.hex().upper())


if __name__ == "__main__":
    main()
