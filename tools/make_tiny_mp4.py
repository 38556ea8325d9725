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


def mdhd_v0(timescale: int, duration: int, lang: str) -> bytes:
    # ver/flags + creation + modification + timescale + duration +
    # packed ISO-639-2/T language + pre_defined
    packed = 0
    for c in lang:
        packed = (packed << 5) | (ord(c) - 0x60)
    p = bytearray(24)
    struct.pack_into(">I", p, 12, timescale)
    struct.pack_into(">I", p, 16, duration & 0xFFFFFFFF)
    struct.pack_into(">H", p, 20, packed)
    return box(b"mdhd", bytes(p))


def stts(entries) -> bytes:
    p = bytes(4) + struct.pack(">I", len(entries))
    for count, delta in entries:
        p += struct.pack(">II", count, delta)
    return box(b"stts", p)


def trak(width: int, height: int, fourcc: bytes,
         n_frames: int = 125, frame_delta: int = 40) -> bytes:
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
    # media timescale 1000, duration = frames*delta, one stts run:
    # fps parses back as frames*1000/(frames*delta) = 1000/delta
    mdhd = mdhd_v0(1000, n_frames * frame_delta, "eng")
    stbl = box(b"stbl", stsd + stts([(n_frames, frame_delta)]))
    return box(b"trak", tkhd + box(b"mdia", mdhd + box(b"minf", stbl)))


def main() -> None:
    # the committed fixture: 5 s at timescale 1000, one 320x240 avc1 trak
    data = ftyp() + box(b"moov", mvhd_v0(1000, 5000) + trak(320, 240, b"avc1"))
    path = "src/test/resources/fixtures/tiny.mp4"
    with open(path, "wb") as f:
        f.write(data)
    print(f"wrote {path} ({len(data)} bytes)")

    # q79's constants: three per-row values spliced into constant hex —
    # the mvhd duration (n_chars*10 ms at timescale 1000), the mdhd
    # duration (n_chars*40 media units) and the stts sample_count
    # (n_chars frames at delta 40 → fps 25.0). Each splice point is
    # located via a distinct sentinel.
    mv = mvhd_v0(1000, 0xDEADBEEF)
    d = mv.index(struct.pack(">I", 0xDEADBEEF))
    tr = trak(320, 240, b"avc1", n_frames=0xCAFEBABE & 0x7FFFFFFF,
              frame_delta=40)
    # mdhd duration = n_frames*40 mod 2^32; recompute the sentinel value
    md_sentinel = struct.pack(">I", ((0xCAFEBABE & 0x7FFFFFFF) * 40)
                              & 0xFFFFFFFF)
    st_sentinel = struct.pack(">I", 0xCAFEBABE & 0x7FFFFFFF)
    m = tr.index(md_sentinel)
    s = tr.index(st_sentinel, m + 4)
    moov_hdr = struct.pack(">I", 8 + len(mv) + len(tr)) + b"moov"
    print("FTYP_HEX =", ftyp().hex().upper())
    print("MOOV_HDR_HEX =", moov_hdr.hex().upper())
    print("MVHD_PREFIX_HEX =", mv[:d].hex().upper())
    print("MVHD_SUFFIX_HEX =", mv[d + 4:].hex().upper())
    print("TRAK_PRE_MDHD_DUR_HEX =", tr[:m].hex().upper())
    print("TRAK_MID_HEX =", tr[m + 4:s].hex().upper())
    print("TRAK_POST_STTS_COUNT_HEX =", tr[s + 4:].hex().upper())


if __name__ == "__main__":
    main()
