"""Pure-python ogg-opus page framing (mux + demux).

This is the tested REFERENCE for the web client's JS implementation
(client/ogg.js is a line-by-line analog — no browser/node exists in this
environment, so the JS logic is validated by proxy: this module round-trips
against the native C++ codec in tests/test_ogg_framing.py).  It also serves
as a dependency-free fallback muxer for tools that only need framing.

Framing matches native/moshi_native.cpp (and the reference's sphn /
rust multistream.rs:30-55): one opus packet per page, 48 kHz granule
positions, OpusHead (pre-skip 312) + OpusTags header pages, CRC-32 with
polynomial 0x04c11db7 (ogg's reflected-free variant, init/xorout 0).
"""

import struct

_CRC_TABLE = []


def _crc_table():
    if not _CRC_TABLE:
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1) \
                    & 0xFFFFFFFF
            _CRC_TABLE.append(r)
    return _CRC_TABLE


def ogg_crc(data: bytes) -> int:
    table = _crc_table()
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ table[((crc >> 24) & 0xFF) ^ b]
    return crc


def opus_head(sample_rate: int, channels: int = 1,
              pre_skip: int = 312) -> bytes:
    return (b"OpusHead" + bytes([1, channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", sample_rate)
            + struct.pack("<h", 0)      # output gain
            + bytes([0]))               # channel mapping family


def opus_tags(vendor: str = "moshi_tpu") -> bytes:
    v = vendor.encode()
    return (b"OpusTags" + struct.pack("<I", len(v)) + v
            + struct.pack("<I", 0))


class OggPageWriter:
    """One packet per page (simple and streaming-friendly; the native
    writer does the same)."""

    def __init__(self, serial: int = 0x6D735459):
        self.serial = serial
        self.pageno = 0

    def page(self, packet: bytes, granule: int, flags: int = 0) -> bytes:
        nsegs = len(packet) // 255 + 1
        lacing = bytes([255] * (len(packet) // 255)
                       + [len(packet) % 255])
        assert nsegs == len(lacing)
        header = (b"OggS" + bytes([0, flags])
                  + struct.pack("<q", granule)
                  + struct.pack("<I", self.serial)
                  + struct.pack("<I", self.pageno)
                  + b"\x00\x00\x00\x00"  # crc placeholder
                  + bytes([nsegs]) + lacing)
        self.pageno += 1
        page = bytearray(header + packet)
        crc = ogg_crc(bytes(page))
        page[22:26] = struct.pack("<I", crc)
        return bytes(page)


class OggOpusMuxer:
    """Raw opus packets -> ogg-opus byte stream (headers emitted first)."""

    def __init__(self, sample_rate: int = 24000, frame_ms: int = 20):
        self.writer = OggPageWriter()
        self.sample_rate = sample_rate
        self.granule_step = 48000 * frame_ms // 1000  # granules are 48 kHz
        self.granule = 0
        self._header = (self.writer.page(opus_head(sample_rate), 0, 0x02)
                        + self.writer.page(opus_tags(), 0, 0))

    def mux(self, packet: bytes) -> bytes:
        out = self._header
        self._header = b""
        self.granule += self.granule_step
        return out + self.writer.page(packet, self.granule)


class OggPageReader:
    """ogg byte stream -> opus packets (headers skipped; packets spanning
    pages reassembled) — mirrors native/moshi_native.cpp OggReader."""

    def __init__(self):
        self.buf = bytearray()
        self.partial = bytearray()

    def append(self, data: bytes) -> list[bytes]:
        self.buf += data
        packets = []
        while True:
            page = self._try_page()
            if page is None:
                break
            flags, segs = page
            if not (flags & 0x01):
                self.partial.clear()
            for seg in segs:
                self.partial += seg
                if len(seg) < 255:
                    pkt = bytes(self.partial)
                    self.partial.clear()
                    if not (pkt.startswith(b"OpusHead")
                            or pkt.startswith(b"OpusTags")):
                        packets.append(pkt)
        return packets

    def _try_page(self):
        buf = self.buf
        if len(buf) < 27 or buf[:4] != b"OggS":
            idx = buf.find(b"OggS", 1)
            if idx < 0:
                return None
            del buf[:idx]
            if len(buf) < 27:
                return None
        nsegs = buf[26]
        if len(buf) < 27 + nsegs:
            return None
        lacing = buf[27:27 + nsegs]
        body = sum(lacing)
        total = 27 + nsegs + body
        if len(buf) < total:
            return None
        page = bytes(buf[:total])
        zeroed = bytearray(page)
        zeroed[22:26] = b"\x00\x00\x00\x00"
        want = struct.unpack("<I", page[22:26])[0]
        if ogg_crc(bytes(zeroed)) != want:
            del buf[:4]  # resync
            return (0, [])
        flags = page[5]
        segs = []
        off = 27 + nsegs
        for l in lacing:
            segs.append(page[off:off + l])
            off += l
        del buf[:total]
        return (flags, segs)
