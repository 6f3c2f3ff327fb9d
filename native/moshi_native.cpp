// moshi_native: streaming ogg-opus codec (CPython C API extension).
//
// Native analog of the reference's Rust components: sphn's
// OpusStreamReader/OpusStreamWriter (used by moshi/moshi/server.py:122,83)
// and the ogg-opus framing in rust/moshi-cli/src/multistream.rs:30-55.
// The ogg container layer (paging, lacing, CRC) is implemented here directly;
// only libopus is linked (the system ships libopus.so.0 without headers, so
// the stable public prototypes are declared below).
//
// Exposes:
//   OpusStreamWriter(sample_rate) .append_pcm(float32 array) -> bytes
//   OpusStreamReader(sample_rate) .append_bytes(bytes) -> float32 array
//
// PCM is mono float32; the opus frame size is 20 ms.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <deque>

// ---------------------------------------------------------------- libopus ABI
extern "C" {
typedef struct OpusEncoder OpusEncoder;
typedef struct OpusDecoder OpusDecoder;
OpusEncoder *opus_encoder_create(int32_t Fs, int channels, int application, int *error);
void opus_encoder_destroy(OpusEncoder *);
int opus_encode_float(OpusEncoder *, const float *pcm, int frame_size,
                      unsigned char *data, int32_t max_data_bytes);
int opus_encoder_ctl(OpusEncoder *, int request, ...);
OpusDecoder *opus_decoder_create(int32_t Fs, int channels, int *error);
void opus_decoder_destroy(OpusDecoder *);
int opus_decode_float(OpusDecoder *, const unsigned char *data, int32_t len,
                      float *pcm, int frame_size, int decode_fec);
}
#define OPUS_APPLICATION_VOIP 2048
#define OPUS_SET_BITRATE_REQUEST 4002
#define OPUS_SET_INBAND_FEC_REQUEST 4012

// ------------------------------------------------------------------- ogg CRC
static uint32_t crc_table[256];
static void init_crc() {
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t r = i << 24;
    for (int j = 0; j < 8; j++)
      r = (r & 0x80000000u) ? (r << 1) ^ 0x04c11db7u : (r << 1);
    crc_table[i] = r;
  }
}
static uint32_t ogg_crc(const uint8_t *data, size_t len) {
  uint32_t crc = 0;
  for (size_t i = 0; i < len; i++)
    crc = (crc << 8) ^ crc_table[((crc >> 24) & 0xff) ^ data[i]];
  return crc;
}

// ------------------------------------------------------------- ogg page write
struct OggWriter {
  uint32_t serial = 0x6d735459;  // arbitrary
  uint32_t pageno = 0;

  // Build one page from a single packet (we emit one packet per page, which
  // keeps latency minimal for streaming).
  std::string page(const std::string &packet, uint64_t granule, uint8_t flags) {
    size_t nsegs = packet.size() / 255 + 1;
    std::string out;
    out.reserve(27 + nsegs + packet.size());
    out += "OggS";
    out += '\0';                      // version
    out += (char)flags;               // header type
    for (int i = 0; i < 8; i++) out += (char)((granule >> (8 * i)) & 0xff);
    for (int i = 0; i < 4; i++) out += (char)((serial >> (8 * i)) & 0xff);
    for (int i = 0; i < 4; i++) out += (char)((pageno >> (8 * i)) & 0xff);
    pageno++;
    out.append(4, '\0');              // CRC placeholder
    out += (char)nsegs;
    size_t rem = packet.size();
    for (size_t i = 0; i + 1 < nsegs; i++) { out += (char)255; rem -= 255; }
    out += (char)rem;
    out += packet;
    uint32_t crc = ogg_crc((const uint8_t *)out.data(), out.size());
    for (int i = 0; i < 4; i++) out[22 + i] = (char)((crc >> (8 * i)) & 0xff);
    return out;
  }
};

// -------------------------------------------------------------- ogg page read
struct OggReader {
  std::string buf;
  // returns complete packets (one page may hold several; packets spanning
  // pages are reassembled)
  std::string partial;
  std::deque<std::string> packets;
  // Hostile-input bound: a stream of continuation pages whose lacing values
  // are all 255 never terminates a packet, so `partial` would grow without
  // bound (one byte per byte fed).  Real opus packets are <= ~1500 bytes;
  // anything past this cap is a malformed/malicious stream — drop the
  // reassembly and resync on the next packet boundary.
  static const size_t kMaxPacket = 256 * 1024;

  void feed(const char *data, size_t len) {
    buf.append(data, len);
    while (try_page()) {}
  }

  // Does a complete CRC-valid page start at `at`?  (pure check, no consume)
  bool valid_page_at(size_t at, size_t *extent) {
    if (buf.size() < at + 27) return false;
    uint8_t nsegs = (uint8_t)buf[at + 26];
    if (buf.size() < at + 27u + nsegs) return false;
    size_t body = 0;
    for (size_t i = 0; i < nsegs; i++) body += (uint8_t)buf[at + 27 + i];
    if (buf.size() < at + 27u + nsegs + body) return false;
    size_t len = 27 + nsegs + body;
    std::string zeroed = buf.substr(at, len);
    uint32_t want = (uint8_t)zeroed[22] | ((uint8_t)zeroed[23] << 8) |
                    ((uint32_t)(uint8_t)zeroed[24] << 16) |
                    ((uint32_t)(uint8_t)zeroed[25] << 24);
    zeroed[22] = zeroed[23] = zeroed[24] = zeroed[25] = 0;
    if (ogg_crc((const uint8_t *)zeroed.data(), zeroed.size()) != want)
      return false;
    *extent = len;
    return true;
  }

  bool try_page() {
    // find capture pattern
    size_t pos = buf.find("OggS");
    if (pos == std::string::npos) {
      if (buf.size() > 3) buf.erase(0, buf.size() - 3);
      return false;
    }
    if (pos > 0) buf.erase(0, pos);
    if (buf.size() < 27) return false;
    uint8_t nsegs = (uint8_t)buf[26];
    bool incomplete = buf.size() < 27u + nsegs;
    size_t body = 0;
    if (!incomplete) {
      for (size_t i = 0; i < nsegs; i++) body += (uint8_t)buf[27 + i];
      incomplete = buf.size() < 27u + nsegs + body;
    }
    if (incomplete) {
      // Hostile-input fix: a bogus header claiming a body that never
      // arrives would otherwise dam every real page queued behind it
      // forever (one 31-byte blob of garbage silences the stream).  Two
      // real pages cannot overlap, so if a LATER candidate already forms
      // a complete CRC-valid page, the leading candidate was garbage —
      // skip to the valid one.  (CRC makes a false positive inside a
      // still-incomplete real page a 2^-32 coincidence.)
      size_t alt = buf.find("OggS", 1), extent;
      while (alt != std::string::npos) {
        if (valid_page_at(alt, &extent)) {
          buf.erase(0, alt);
          return true;  // reprocess from the valid candidate
        }
        alt = buf.find("OggS", alt + 1);
      }
      return false;
    }
    // verify CRC
    std::string page = buf.substr(0, 27 + nsegs + body);
    std::string zeroed = page;
    zeroed[22] = zeroed[23] = zeroed[24] = zeroed[25] = 0;
    uint32_t want = (uint8_t)page[22] | ((uint8_t)page[23] << 8) |
                    ((uint32_t)(uint8_t)page[24] << 16) |
                    ((uint32_t)(uint8_t)page[25] << 24);
    if (ogg_crc((const uint8_t *)zeroed.data(), zeroed.size()) != want) {
      buf.erase(0, 4);  // bad page, resync
      return true;
    }
    uint8_t flags = (uint8_t)page[5];
    if (!(flags & 0x01)) partial.clear();  // not a continuation
    size_t off = 27 + nsegs;
    for (size_t i = 0; i < nsegs; i++) {
      uint8_t l = (uint8_t)page[27 + i];
      partial.append(page, off, l);
      off += l;
      if (l < 255) {
        if (partial.size() <= kMaxPacket) packets.push_back(partial);
        partial.clear();
      }
    }
    if (partial.size() > kMaxPacket) partial.clear();
    buf.erase(0, 27 + nsegs + body);
    return true;
  }
};

// --------------------------------------------------------------- writer type
struct WriterObject {
  PyObject_HEAD
  OpusEncoder *enc;
  OggWriter ogg;
  std::vector<float> *pending;
  int sample_rate;
  int frame_size;       // in input samples (20 ms)
  uint64_t granule;     // in 48 kHz samples
  bool header_sent;
};

static PyObject *writer_new(PyTypeObject *type, PyObject *args, PyObject *kw) {
  int sample_rate = 24000;
  static const char *kwlist[] = {"sample_rate", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kw, "|i", (char **)kwlist, &sample_rate))
    return nullptr;
  int err = 0;
  OpusEncoder *enc = opus_encoder_create(sample_rate, 1, OPUS_APPLICATION_VOIP, &err);
  if (!enc) {
    PyErr_Format(PyExc_RuntimeError, "opus_encoder_create failed: %d", err);
    return nullptr;
  }
  opus_encoder_ctl(enc, OPUS_SET_BITRATE_REQUEST, 64000);
  WriterObject *self = (WriterObject *)type->tp_alloc(type, 0);
  self->enc = enc;
  new (&self->ogg) OggWriter();
  self->pending = new std::vector<float>();
  self->sample_rate = sample_rate;
  self->frame_size = sample_rate / 50;  // 20 ms
  self->granule = 0;
  self->header_sent = false;
  return (PyObject *)self;
}

static void writer_dealloc(WriterObject *self) {
  if (self->enc) opus_encoder_destroy(self->enc);
  delete self->pending;
  Py_TYPE(self)->tp_free((PyObject *)self);
}

static std::string opus_head(int sample_rate) {
  std::string h = "OpusHead";
  h += (char)1;   // version
  h += (char)1;   // channels
  h += (char)0x38; h += (char)0x01;  // pre-skip 312
  for (int i = 0; i < 4; i++) h += (char)((sample_rate >> (8 * i)) & 0xff);
  h += '\0'; h += '\0';  // output gain
  h += '\0';             // channel mapping family
  return h;
}

static std::string opus_tags() {
  std::string t = "OpusTags";
  const char *vendor = "moshi_tpu";
  uint32_t vl = strlen(vendor);
  for (int i = 0; i < 4; i++) t += (char)((vl >> (8 * i)) & 0xff);
  t += vendor;
  t += '\0'; t += '\0'; t += '\0'; t += '\0';  // 0 comments
  return t;
}

static PyObject *writer_append_pcm(WriterObject *self, PyObject *arg) {
  Py_buffer view;
  if (PyObject_GetBuffer(arg, &view, PyBUF_CONTIG_RO | PyBUF_FORMAT) < 0)
    return nullptr;
  if (!view.format || strcmp(view.format, "f") != 0) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_TypeError, "expected float32 buffer");
    return nullptr;
  }
  const float *data = (const float *)view.buf;
  size_t n = view.len / sizeof(float);
  self->pending->insert(self->pending->end(), data, data + n);
  PyBuffer_Release(&view);

  std::string out;
  if (!self->header_sent) {
    self->header_sent = true;
    out += self->ogg.page(opus_head(self->sample_rate), 0, 0x02);  // BOS
    out += self->ogg.page(opus_tags(), 0, 0);
  }
  unsigned char packet[4000];
  size_t i = 0;
  while (self->pending->size() - i >= (size_t)self->frame_size) {
    int len = opus_encode_float(self->enc, self->pending->data() + i,
                                self->frame_size, packet, sizeof(packet));
    i += self->frame_size;
    if (len < 0) {
      PyErr_Format(PyExc_RuntimeError, "opus_encode_float failed: %d", len);
      return nullptr;
    }
    self->granule += 960;  // 20 ms at 48 kHz
    out += self->ogg.page(std::string((char *)packet, len), self->granule, 0);
  }
  self->pending->erase(self->pending->begin(), self->pending->begin() + i);
  return PyBytes_FromStringAndSize(out.data(), out.size());
}

static PyMethodDef writer_methods[] = {
    {"append_pcm", (PyCFunction)writer_append_pcm, METH_O,
     "Append float32 PCM; returns any ogg-opus bytes now available."},
    {nullptr, nullptr, 0, nullptr}};

static PyTypeObject WriterType = {PyVarObject_HEAD_INIT(nullptr, 0)};

// --------------------------------------------------------------- reader type
struct ReaderObject {
  PyObject_HEAD
  OpusDecoder *dec;
  OggReader *ogg;
  int sample_rate;
  int skip;  // pre-skip samples remaining (at output rate)
};

static PyObject *reader_new(PyTypeObject *type, PyObject *args, PyObject *kw) {
  int sample_rate = 24000;
  static const char *kwlist[] = {"sample_rate", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kw, "|i", (char **)kwlist, &sample_rate))
    return nullptr;
  int err = 0;
  OpusDecoder *dec = opus_decoder_create(sample_rate, 1, &err);
  if (!dec) {
    PyErr_Format(PyExc_RuntimeError, "opus_decoder_create failed: %d", err);
    return nullptr;
  }
  ReaderObject *self = (ReaderObject *)type->tp_alloc(type, 0);
  self->dec = dec;
  self->ogg = new OggReader();
  self->sample_rate = sample_rate;
  self->skip = -1;
  return (PyObject *)self;
}

static void reader_dealloc(ReaderObject *self) {
  if (self->dec) opus_decoder_destroy(self->dec);
  delete self->ogg;
  Py_TYPE(self)->tp_free((PyObject *)self);
}

static PyObject *reader_append_bytes(ReaderObject *self, PyObject *arg) {
  Py_buffer view;
  if (PyObject_GetBuffer(arg, &view, PyBUF_CONTIG_RO) < 0) return nullptr;
  self->ogg->feed((const char *)view.buf, view.len);
  PyBuffer_Release(&view);

  std::vector<float> pcm;
  std::vector<float> frame(self->sample_rate / 50 * 6);  // up to 120 ms
  while (!self->ogg->packets.empty()) {
    std::string pkt = std::move(self->ogg->packets.front());
    self->ogg->packets.pop_front();
    if (pkt.size() >= 8 && memcmp(pkt.data(), "OpusHead", 8) == 0) {
      int preskip48 = pkt.size() >= 12
          ? ((uint8_t)pkt[10] | ((uint8_t)pkt[11] << 8)) : 312;
      self->skip = (int)((int64_t)preskip48 * self->sample_rate / 48000);
      continue;
    }
    if (pkt.size() >= 8 && memcmp(pkt.data(), "OpusTags", 8) == 0) continue;
    if (pkt.empty()) continue;
    int n = opus_decode_float(self->dec, (const unsigned char *)pkt.data(),
                              (int32_t)pkt.size(), frame.data(),
                              (int)frame.size(), 0);
    if (n < 0) continue;  // skip undecodable packets
    int start = 0;
    if (self->skip > 0) {
      start = n < self->skip ? n : self->skip;
      self->skip -= start;
    }
    pcm.insert(pcm.end(), frame.data() + start, frame.data() + n);
  }
  PyObject *bytes = PyBytes_FromStringAndSize(
      (const char *)pcm.data(), pcm.size() * sizeof(float));
  return bytes;
}

static PyMethodDef reader_methods[] = {
    {"append_bytes", (PyCFunction)reader_append_bytes, METH_O,
     "Append ogg-opus bytes; returns decoded float32 PCM as raw bytes."},
    {nullptr, nullptr, 0, nullptr}};

static PyTypeObject ReaderType = {PyVarObject_HEAD_INIT(nullptr, 0)};

// -------------------------------------------------------------------- module
static PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "moshi_native",
                                "Native streaming ogg-opus codec.", -1,
                                nullptr, nullptr, nullptr, nullptr, nullptr};

PyMODINIT_FUNC PyInit_moshi_native(void) {
  init_crc();
  WriterType.tp_name = "moshi_native.OpusStreamWriter";
  WriterType.tp_basicsize = sizeof(WriterObject);
  WriterType.tp_flags = Py_TPFLAGS_DEFAULT;
  WriterType.tp_new = writer_new;
  WriterType.tp_dealloc = (destructor)writer_dealloc;
  WriterType.tp_methods = writer_methods;
  ReaderType.tp_name = "moshi_native.OpusStreamReader";
  ReaderType.tp_basicsize = sizeof(ReaderObject);
  ReaderType.tp_flags = Py_TPFLAGS_DEFAULT;
  ReaderType.tp_new = reader_new;
  ReaderType.tp_dealloc = (destructor)reader_dealloc;
  ReaderType.tp_methods = reader_methods;
  if (PyType_Ready(&WriterType) < 0 || PyType_Ready(&ReaderType) < 0)
    return nullptr;
  PyObject *m = PyModule_Create(&moduledef);
  Py_INCREF(&WriterType);
  PyModule_AddObject(m, "OpusStreamWriter", (PyObject *)&WriterType);
  Py_INCREF(&ReaderType);
  PyModule_AddObject(m, "OpusStreamReader", (PyObject *)&ReaderType);
  return m;
}
