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
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <netinet/in.h>
#include <string>
#include <sys/socket.h>
#include <sys/time.h>
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
