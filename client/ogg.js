// ogg-opus page framing (mux + demux) — line-by-line JS analog of the
// tested python reference `moshi_tpu/ogg.py` (which round-trips against the
// native libopus codec in tests/test_ogg_framing.py).  One packet per page,
// 48 kHz granule positions, OpusHead (pre-skip 312) + OpusTags header
// pages, ogg CRC-32 (poly 0x04c11db7, init/xorout 0).
"use strict";

const OGG_CRC_TABLE = (() => {
  const t = new Uint32Array(256);
  for (let i = 0; i < 256; i++) {
    let r = i << 24;
    for (let j = 0; j < 8; j++)
      r = ((r & 0x80000000) ? (r << 1) ^ 0x04c11db7 : r << 1) >>> 0;
    t[i] = r >>> 0;
  }
  return t;
})();

function oggCrc(bytes) {
  let crc = 0;
  for (let i = 0; i < bytes.length; i++)
    crc = (((crc << 8) >>> 0) ^ OGG_CRC_TABLE[((crc >>> 24) & 0xff) ^ bytes[i]]) >>> 0;
  return crc >>> 0;
}

function opusHead(sampleRate, channels = 1, preSkip = 312) {
  const b = new Uint8Array(19);
  const dv = new DataView(b.buffer);
  b.set(new TextEncoder().encode("OpusHead"), 0);
  b[8] = 1; b[9] = channels;
  dv.setUint16(10, preSkip, true);
  dv.setUint32(12, sampleRate, true);
  dv.setInt16(16, 0, true);  // output gain
  b[18] = 0;                 // channel mapping family
  return b;
}

function opusTags(vendor = "moshi_tpu") {
  const v = new TextEncoder().encode(vendor);
  const b = new Uint8Array(8 + 4 + v.length + 4);
  const dv = new DataView(b.buffer);
  b.set(new TextEncoder().encode("OpusTags"), 0);
  dv.setUint32(8, v.length, true);
  b.set(v, 12);
  dv.setUint32(12 + v.length, 0, true);  // 0 comments
  return b;
}

class OggPageWriter {
  constructor(serial = 0x6d735459) {
    this.serial = serial >>> 0;
    this.pageno = 0;
  }

  page(packet, granule, flags = 0) {
    const full = Math.floor(packet.length / 255);
    const nsegs = full + 1;
    const page = new Uint8Array(27 + nsegs + packet.length);
    const dv = new DataView(page.buffer);
    page.set(new TextEncoder().encode("OggS"), 0);
    page[4] = 0; page[5] = flags;
    // granule as two u32 halves (JS numbers are safe far past any session)
    dv.setUint32(6, granule >>> 0, true);
    dv.setUint32(10, Math.floor(granule / 4294967296), true);
    dv.setUint32(14, this.serial, true);
    dv.setUint32(18, this.pageno++, true);
    dv.setUint32(22, 0, true);  // crc placeholder
    page[26] = nsegs;
    for (let i = 0; i < full; i++) page[27 + i] = 255;
    page[27 + full] = packet.length % 255;
    page.set(packet, 27 + nsegs);
    dv.setUint32(22, oggCrc(page), true);
    return page;
  }
}

class OggOpusMuxer {
  constructor(sampleRate = 24000, frameMs = 20) {
    this.writer = new OggPageWriter();
    this.granuleStep = 48000 * frameMs / 1000;  // granules are 48 kHz
    this.granule = 0;
    this._header = [
      this.writer.page(opusHead(sampleRate), 0, 0x02),
      this.writer.page(opusTags(), 0, 0),
    ];
  }

  mux(packet) {
    const parts = this._header.length
      ? [...this._header.splice(0), null] : [null];
    this.granule += this.granuleStep;
    parts[parts.length - 1] = this.writer.page(packet, this.granule);
    let n = 0;
    for (const p of parts) n += p.length;
    const out = new Uint8Array(n);
    let off = 0;
    for (const p of parts) { out.set(p, off); off += p.length; }
    return out;
  }
}

class OggPageReader {
  constructor() {
    this.buf = new Uint8Array(0);
    this.partial = [];
  }

  _concat(a, b) {
    const out = new Uint8Array(a.length + b.length);
    out.set(a, 0); out.set(b, a.length);
    return out;
  }

  append(data) {
    this.buf = this._concat(this.buf, data);
    const packets = [];
    for (;;) {
      const page = this._tryPage();
      if (page === null) break;
      const [flags, segs] = page;
      if (!(flags & 0x01)) this.partial = [];
      for (const seg of segs) {
        this.partial.push(seg);
        if (seg.length < 255) {
          let n = 0;
          for (const s of this.partial) n += s.length;
          const pkt = new Uint8Array(n);
          let off = 0;
          for (const s of this.partial) { pkt.set(s, off); off += s.length; }
          this.partial = [];
          const tag = new TextDecoder().decode(pkt.subarray(0, 8));
          if (tag !== "OpusHead" && tag !== "OpusTags") packets.push(pkt);
        }
      }
    }
    return packets;
  }

  _tryPage() {
    let buf = this.buf;
    const magic = [0x4f, 0x67, 0x67, 0x53];  // "OggS"
    const isMagic = (o) => buf[o] === magic[0] && buf[o + 1] === magic[1]
      && buf[o + 2] === magic[2] && buf[o + 3] === magic[3];
    if (buf.length < 27) return null;
    if (!isMagic(0)) {
      let idx = -1;
      for (let i = 1; i + 4 <= buf.length; i++)
        if (isMagic(i)) { idx = i; break; }
      if (idx < 0) return null;
      this.buf = buf = buf.subarray(idx);
      if (buf.length < 27) return null;
    }
    const nsegs = buf[26];
    if (buf.length < 27 + nsegs) return null;
    let body = 0;
    for (let i = 0; i < nsegs; i++) body += buf[27 + i];
    const total = 27 + nsegs + body;
    if (buf.length < total) return null;
    const page = buf.slice(0, total);
    const dv = new DataView(page.buffer, page.byteOffset);
    const want = dv.getUint32(22, true);
    const zeroed = page.slice(0);
    zeroed[22] = zeroed[23] = zeroed[24] = zeroed[25] = 0;
    if (oggCrc(zeroed) !== want) {
      this.buf = buf.subarray(4);  // resync
      return [0, []];
    }
    const flags = page[5];
    const segs = [];
    let off = 27 + nsegs;
    for (let i = 0; i < nsegs; i++) {
      const l = page[27 + i];
      segs.push(page.subarray(off, off + l));
      off += l;
    }
    this.buf = buf.subarray(total);
    return [flags, segs];
  }
}
