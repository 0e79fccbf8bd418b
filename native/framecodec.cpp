// Native frame codec + transport runtime for densemonoslam_tpu.
//
// The reference's IO runtime is C++: .klg log reading (zlib depth + JPEG RGB,
// `GUI/src/Tools/RawLogReader.cpp`, `JPEGLoader.h`), LCM frame transport
// (`Tools/networking/*`, `Tools/LcmHandler.h`) and the converter tools under
// `logs/`.  This library provides the equivalent native capabilities behind a
// plain C ABI consumed from Python via ctypes (no pybind11 in this image):
//
//   - zlib inflate/deflate of uint16 depth images,
//   - JPEG decode/encode of RGB images (libjpeg),
//   - .klg record scanning/decoding,
//   - a UDP frame transport (sender + receiver) speaking a compact
//     eflcm::Frame-equivalent wire format with senderName demultiplexing.
//
// Build: `make -C native` (produces libframecodec.so).  The Python side
// (`densemonoslam_tpu/io/native.py`) falls back to pure-Python codecs when
// the library is absent.

#include <arpa/inet.h>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <netinet/in.h>
#include <string>
#include <sys/socket.h>
#include <sys/time.h>
#include <thread>
#include <unistd.h>
#include <vector>
#include <zlib.h>

#include <jpeglib.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------------------
// zlib depth codec
// ---------------------------------------------------------------------------

// Compress `n` bytes from src into dst (capacity dst_cap); returns compressed
// size or -1.
long dms_zlib_compress(const uint8_t *src, long n, uint8_t *dst, long dst_cap) {
  uLongf out = (uLongf)dst_cap;
  if (compress2(dst, &out, src, (uLong)n, Z_BEST_SPEED) != Z_OK) return -1;
  return (long)out;
}

// Inflate into dst (capacity dst_cap); returns decompressed size or -1.
long dms_zlib_decompress(const uint8_t *src, long n, uint8_t *dst, long dst_cap) {
  uLongf out = (uLongf)dst_cap;
  if (uncompress(dst, &out, src, (uLong)n) != Z_OK) return -1;
  return (long)out;
}

// ---------------------------------------------------------------------------
// JPEG codec (libjpeg)
// ---------------------------------------------------------------------------

struct dms_jpeg_err {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void dms_jpeg_error_exit(j_common_ptr cinfo) {
  dms_jpeg_err *err = (dms_jpeg_err *)cinfo->err;
  longjmp(err->jb, 1);
}

// Decode JPEG to RGB; returns 0 on success, fills width/height.  dst must
// hold max_w*max_h*3 bytes.
int dms_jpeg_decode(const uint8_t *src, long n, uint8_t *dst, int max_w,
                    int max_h, int *width, int *height) {
  jpeg_decompress_struct cinfo;
  dms_jpeg_err jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = dms_jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t *>(src), (unsigned long)n);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_width > max_w || (int)cinfo.output_height > max_h) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  int stride = cinfo.output_width * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t *row = dst + (long)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Encode RGB to JPEG; returns encoded size or -1.
long dms_jpeg_encode(const uint8_t *rgb, int width, int height, int quality,
                     uint8_t *dst, long dst_cap) {
  jpeg_compress_struct cinfo;
  dms_jpeg_err jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = dms_jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_compress(&cinfo);
    return -1;
  }
  jpeg_create_compress(&cinfo);
  uint8_t *mem = nullptr;
  unsigned long mem_size = 0;
  jpeg_mem_dest(&cinfo, &mem, &mem_size);
  cinfo.image_width = width;
  cinfo.image_height = height;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  int stride = width * 3;
  while (cinfo.next_scanline < cinfo.image_height) {
    uint8_t *row = const_cast<uint8_t *>(rgb) + (long)cinfo.next_scanline * stride;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  long out = -1;
  if ((long)mem_size <= dst_cap) {
    memcpy(dst, mem, mem_size);
    out = (long)mem_size;
  }
  free(mem);
  jpeg_destroy_compress(&cinfo);
  return out;
}

// ---------------------------------------------------------------------------
// .klg log scanning (reference RawLogReader format: per frame
//   int64 timestamp, int32 depthCompressedSize, int32 imageCompressedSize,
//   depth bytes (zlib uint16), image bytes (jpeg))
// ---------------------------------------------------------------------------

// Scan a .klg file and fill offsets/timestamps arrays (capacity max_frames).
// Returns the number of frames, or -1 on error.  The first 4 bytes of a .klg
// are the frame count (int32).
long dms_klg_scan(const char *path, long *offsets, int64_t *timestamps,
                  int32_t *depth_sizes, int32_t *image_sizes, long max_frames) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  int32_t count = 0;
  if (fread(&count, 4, 1, f) != 1) {
    fclose(f);
    return -1;
  }
  long n = 0;
  while (n < max_frames) {
    long off = ftell(f);
    int64_t ts;
    int32_t dsize, isize;
    if (fread(&ts, 8, 1, f) != 1) break;
    if (fread(&dsize, 4, 1, f) != 1) break;
    if (fread(&isize, 4, 1, f) != 1) break;
    offsets[n] = off;
    timestamps[n] = ts;
    depth_sizes[n] = dsize;
    image_sizes[n] = isize;
    if (fseek(f, dsize + isize, SEEK_CUR) != 0) break;
    n++;
  }
  fclose(f);
  return n;
}

// Read + decode one klg frame: depth (uint16, zlib or raw) and rgb (jpeg or
// raw or absent).  Returns 0 on success.
int dms_klg_read_frame(const char *path, long offset, int32_t depth_size,
                       int32_t image_size, uint8_t *depth_out, long depth_cap,
                       uint8_t *rgb_out, long rgb_cap, int max_w, int max_h) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, offset + 16, SEEK_SET);
  std::vector<uint8_t> dbuf(depth_size), ibuf(image_size);
  if (depth_size > 0 && fread(dbuf.data(), 1, depth_size, f) != (size_t)depth_size) {
    fclose(f);
    return -2;
  }
  if (image_size > 0 && fread(ibuf.data(), 1, image_size, f) != (size_t)image_size) {
    fclose(f);
    return -3;
  }
  fclose(f);
  if (depth_size == depth_cap) {
    memcpy(depth_out, dbuf.data(), depth_size);  // raw
  } else if (depth_size > 0) {
    if (dms_zlib_decompress(dbuf.data(), depth_size, depth_out, depth_cap) < 0)
      return -4;
  }
  if (image_size == rgb_cap) {
    memcpy(rgb_out, ibuf.data(), image_size);  // raw rgb
  } else if (image_size > 0) {
    int w, h;
    if (dms_jpeg_decode(ibuf.data(), image_size, rgb_out, max_w, max_h, &w, &h) != 0)
      return -5;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// UDP frame transport (LCM-equivalent).  Wire format, little-endian:
//   magic  u32 = 0xDMS1 (0x444D5331)
//   flags  u8  (bit0 trackOnly, bit1 compressed, bit2 last)
//   name_len u8, senderName bytes
//   frame_number i32, timestamp i64
//   depth_size i32, image_size i32, then payloads
// Datagrams above 60KB are chunked: chunk header u32 seq | u16 idx | u16 cnt.
// ---------------------------------------------------------------------------

int dms_udp_socket_send(const char *addr, int port) {
  int s = socket(AF_INET, SOCK_DGRAM, 0);
  if (s < 0) return -1;
  sockaddr_in sa;
  memset(&sa, 0, sizeof(sa));
  sa.sin_family = AF_INET;
  sa.sin_port = htons(port);
  inet_pton(AF_INET, addr, &sa.sin_addr);
  if (connect(s, (sockaddr *)&sa, sizeof(sa)) < 0) {
    close(s);
    return -1;
  }
  int buf = 4 << 20;
  setsockopt(s, SOL_SOCKET, SO_SNDBUF, &buf, sizeof(buf));
  return s;
}

int dms_udp_socket_recv(int port) {
  int s = socket(AF_INET, SOCK_DGRAM, 0);
  if (s < 0) return -1;
  int one = 1;
  setsockopt(s, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  int buf = 8 << 20;
  setsockopt(s, SOL_SOCKET, SO_RCVBUF, &buf, sizeof(buf));
  sockaddr_in sa;
  memset(&sa, 0, sizeof(sa));
  sa.sin_family = AF_INET;
  sa.sin_port = htons(port);
  sa.sin_addr.s_addr = INADDR_ANY;
  if (bind(s, (sockaddr *)&sa, sizeof(sa)) < 0) {
    close(s);
    return -1;
  }
  return s;
}

static const long DMS_CHUNK = 60000;

// Send one payload, chunked.  Returns 0 on success.
int dms_udp_send(int sock, uint32_t seq, const uint8_t *data, long n) {
  long nchunks = (n + DMS_CHUNK - 1) / DMS_CHUNK;
  std::vector<uint8_t> pkt(8 + DMS_CHUNK);
  for (long c = 0; c < nchunks; c++) {
    long sz = (c == nchunks - 1) ? n - c * DMS_CHUNK : DMS_CHUNK;
    uint32_t seq_le = seq;
    uint16_t idx = (uint16_t)c, cnt = (uint16_t)nchunks;
    memcpy(pkt.data(), &seq_le, 4);
    memcpy(pkt.data() + 4, &idx, 2);
    memcpy(pkt.data() + 6, &cnt, 2);
    memcpy(pkt.data() + 8, data + c * DMS_CHUNK, sz);
    if (send(sock, pkt.data(), 8 + sz, 0) < 0) return -1;
  }
  return 0;
}

// Receive one datagram chunk with timeout (ms); returns payload size (>=0)
// or -1 on timeout/error.  Fills seq/idx/cnt.
long dms_udp_recv_chunk(int sock, uint8_t *out, long cap, int timeout_ms,
                        uint32_t *seq, uint16_t *idx, uint16_t *cnt) {
  timeval tv;
  tv.tv_sec = timeout_ms / 1000;
  tv.tv_usec = (timeout_ms % 1000) * 1000;
  setsockopt(sock, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  std::vector<uint8_t> pkt(8 + DMS_CHUNK);
  long n = recv(sock, pkt.data(), pkt.size(), 0);
  if (n < 8) return -1;
  memcpy(seq, pkt.data(), 4);
  memcpy(idx, pkt.data() + 4, 2);
  memcpy(cnt, pkt.data() + 6, 2);
  long sz = n - 8;
  if (sz > cap) return -1;
  memcpy(out, pkt.data() + 8, sz);
  return sz;
}

void dms_close(int sock) { close(sock); }

}  // extern "C"

// ---------------------------------------------------------------------------
// Async prefetching log executor.
//
// The reference feeds frames through a background LCM receive thread into a
// CircularBuffer that the SLAM loop drains (`Tools/networking/LcmReceiver.cpp:
// 14-34`, `Tools/CircularBuffer.h`, JPEG decode in `Tools/JPEGLoader.h`).
// This is the equivalent native runtime component for log replay: a worker
// pool decodes .klg records (zlib depth + JPEG RGB) ahead of the consumer
// into a bounded ring of slots, so the Python SLAM loop overlaps host decode
// with device compute instead of paying it serially per frame.
// ---------------------------------------------------------------------------

namespace {

struct PrefetchSlot {
  std::vector<uint8_t> depth;  // w*h*2
  std::vector<uint8_t> rgb;    // w*h*3
  int64_t timestamp = 0;
  int status = 0;  // 0 empty, 1 ready, -1 decode error
};

struct Prefetcher {
  std::string path;
  int width = 0, height = 0;
  long n_frames = 0;
  std::vector<long> offsets;
  std::vector<int64_t> timestamps;
  std::vector<int32_t> depth_sizes, image_sizes;

  std::vector<PrefetchSlot> ring;
  long next_claim = 0;   // next frame index a worker may take
  long next_serve = 0;   // next frame index the consumer wants
  bool stopping = false;
  std::mutex mu;
  std::condition_variable cv_ready;   // consumer waits for slot ready
  std::condition_variable cv_space;   // workers wait for ring space
  std::vector<std::thread> workers;

  void worker() {
    FILE *f = fopen(path.c_str(), "rb");
    if (!f) return;
    std::vector<uint8_t> dbuf, ibuf;
    for (;;) {
      long idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stopping ||
                 (next_claim < n_frames &&
                  next_claim < next_serve + (long)ring.size());
        });
        if (stopping || next_claim >= n_frames) break;
        idx = next_claim++;
      }
      PrefetchSlot &slot = ring[idx % ring.size()];
      int32_t dsize = depth_sizes[idx], isize = image_sizes[idx];
      dbuf.resize(dsize > 0 ? dsize : 0);
      ibuf.resize(isize > 0 ? isize : 0);
      int st = 1;
      if (fseek(f, offsets[idx] + 16, SEEK_SET) != 0) st = -1;
      if (st == 1 && dsize > 0 &&
          fread(dbuf.data(), 1, dsize, f) != (size_t)dsize)
        st = -1;
      if (st == 1 && isize > 0 &&
          fread(ibuf.data(), 1, isize, f) != (size_t)isize)
        st = -1;
      long depth_cap = (long)width * height * 2;
      long rgb_cap = (long)width * height * 3;
      // slots are reused: blank payloads a record does not carry, so a
      // depth-only frame cannot leak the previous occupant's RGB
      if (dsize <= 0) memset(slot.depth.data(), 0, depth_cap);
      if (isize <= 0) memset(slot.rgb.data(), 0, rgb_cap);
      if (st == 1 && dsize > 0) {
        if (dsize == depth_cap) {
          memcpy(slot.depth.data(), dbuf.data(), dsize);
        } else if (dms_zlib_decompress(dbuf.data(), dsize, slot.depth.data(),
                                       depth_cap) < 0) {
          st = -1;
        }
      }
      if (st == 1 && isize > 0) {
        if (isize == rgb_cap) {
          memcpy(slot.rgb.data(), ibuf.data(), isize);
        } else {
          int w, h;
          if (dms_jpeg_decode(ibuf.data(), isize, slot.rgb.data(), width,
                              height, &w, &h) != 0)
            st = -1;
        }
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        slot.timestamp = timestamps[idx];
        slot.status = st;
        cv_ready.notify_all();
      }
    }
    fclose(f);
  }
};

}  // namespace

extern "C" {

// Open a .klg and start `n_threads` decode workers filling a `ring_slots`
// ring.  Returns an opaque handle (NULL on error).
void *dms_prefetch_open(const char *path, int width, int height,
                        int n_threads, int ring_slots) {
  auto *p = new Prefetcher();
  p->path = path;
  p->width = width;
  p->height = height;
  const long MAXF = 1 << 20;
  p->offsets.resize(MAXF);
  p->timestamps.resize(MAXF);
  p->depth_sizes.resize(MAXF);
  p->image_sizes.resize(MAXF);
  long n = dms_klg_scan(path, p->offsets.data(), p->timestamps.data(),
                        p->depth_sizes.data(), p->image_sizes.data(), MAXF);
  if (n < 0) {
    delete p;
    return nullptr;
  }
  p->n_frames = n;
  p->offsets.resize(n);
  p->timestamps.resize(n);
  p->depth_sizes.resize(n);
  p->image_sizes.resize(n);
  if (ring_slots < 2) ring_slots = 2;
  if (n_threads < 1) n_threads = 1;
  p->ring.resize(ring_slots);
  for (auto &s : p->ring) {
    s.depth.assign((size_t)width * height * 2, 0);
    s.rgb.assign((size_t)width * height * 3, 0);
  }
  for (int i = 0; i < n_threads; i++)
    p->workers.emplace_back(&Prefetcher::worker, p);
  return p;
}

long dms_prefetch_frames(void *h) {
  return h ? ((Prefetcher *)h)->n_frames : -1;
}

// Blocking in-order next frame.  Copies depth (u16 w*h) and rgb (u8 w*h*3)
// into the caller buffers; returns the frame index, -1 at end of log, -2 on
// decode error (the stream still advances).
long dms_prefetch_next(void *h, uint8_t *depth_out, uint8_t *rgb_out,
                       int64_t *timestamp) {
  auto *p = (Prefetcher *)h;
  long idx;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    if (p->next_serve >= p->n_frames) return -1;
    idx = p->next_serve;
    PrefetchSlot &slot = p->ring[idx % p->ring.size()];
    p->cv_ready.wait(lk, [&] { return slot.status != 0; });
    int st = slot.status;
    if (st == 1) {
      memcpy(depth_out, slot.depth.data(), slot.depth.size());
      memcpy(rgb_out, slot.rgb.data(), slot.rgb.size());
      *timestamp = slot.timestamp;
    }
    slot.status = 0;
    p->next_serve++;
    p->cv_space.notify_all();
    if (st != 1) return -2;
  }
  return idx;
}

void dms_prefetch_close(void *h) {
  auto *p = (Prefetcher *)h;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stopping = true;
    p->cv_space.notify_all();
  }
  for (auto &t : p->workers) t.join();
  delete p;
}

}  // extern "C"
