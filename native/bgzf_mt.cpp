// Multithreaded BGZF block codec.
//
// The reference engine's BAM byte streams go through htslib's C BGZF
// implementation (via pysam); this environment has neither, so ccsmeth-tpu ships
// its own. BGZF blocks are independent gzip members (<=64KiB payload each), so
// both directions parallelize embarrassingly across a thread pool:
//
//   bgzf_scan_blocks()       - index the compressed block boundaries
//   bgzf_decompress_blocks() - inflate all blocks in parallel (raw deflate)
//   bgzf_compress_chunks()   - deflate 64KB payload chunks in parallel and emit
//                              framed BGZF members (no EOF marker; caller appends)
//
// Exposed with a plain C ABI for ctypes (ccsmeth_tpu/bamio/native.py).

// Deflate backend: libdeflate when available (CCS_USE_LIBDEFLATE, ~2-4x faster
// than zlib both directions on whole-buffer block codecs), zlib otherwise.
// Selected by the Makefile at build time; identical on-disk output semantics.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

#ifdef CCS_USE_LIBDEFLATE
#include <libdeflate.h>
#else
#include <zlib.h>
#endif

namespace {

constexpr size_t kMaxBlockData = 65280;  // htslib convention
constexpr size_t kHeaderLen = 18;        // fixed header incl. 6-byte BC subfield
constexpr size_t kFooterLen = 8;         // crc32 + isize

inline uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

inline void wr_u16(uint8_t* p, uint16_t v) {
  p[0] = static_cast<uint8_t>(v & 0xff);
  p[1] = static_cast<uint8_t>(v >> 8);
}

inline void wr_u32(uint8_t* p, uint32_t v) {
  p[0] = static_cast<uint8_t>(v & 0xff);
  p[1] = static_cast<uint8_t>((v >> 8) & 0xff);
  p[2] = static_cast<uint8_t>((v >> 16) & 0xff);
  p[3] = static_cast<uint8_t>((v >> 24) & 0xff);
}

int find_bsize(const uint8_t* p, size_t avail, size_t* bsize_out) {
  if (avail < kHeaderLen) return -1;
  if (p[0] != 0x1f || p[1] != 0x8b) return -2;
  if (!(p[3] & 4)) return -3;  // no FEXTRA -> not BGZF
  uint16_t xlen = rd_u16(p + 10);
  if (avail < 12u + xlen) return -1;
  size_t q = 12;
  size_t end = 12u + xlen;
  while (q + 4 <= end) {
    uint8_t si1 = p[q], si2 = p[q + 1];
    uint16_t slen = rd_u16(p + q + 2);
    if (si1 == 'B' && si2 == 'C' && slen == 2) {
      *bsize_out = static_cast<size_t>(rd_u16(p + q + 4)) + 1;
      return 0;
    }
    q += 4u + slen;
  }
  return -4;  // BC subfield missing
}

// Work-stealing loop with per-thread codec context (libdeflate contexts are
// malloc-heavy to create, so one per worker thread, not per block).
template <typename Make, typename Fn, typename Release>
void parallel_for_ctx(size_t n, int n_threads, Make make, Fn fn,
                      Release release) {
  if (n == 0) return;
  if (n_threads < 1) n_threads = 1;
  if (static_cast<size_t>(n_threads) > n) n_threads = static_cast<int>(n);
  std::atomic<size_t> next{0};
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([&]() {
      auto ctx = make();
      for (;;) {
        size_t i = next.fetch_add(1);
        if (i >= n) break;
        fn(i, ctx);
      }
      release(ctx);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Scan block boundaries. offsets/csizes/usizes must hold max_blocks entries.
// Returns number of blocks, or negative on malformed input.
long long bgzf_scan_blocks(const uint8_t* data, size_t len,
                           unsigned long long* offsets,
                           unsigned int* csizes, unsigned int* usizes,
                           size_t max_blocks) {
  size_t off = 0;
  size_t n = 0;
  while (off < len) {
    size_t bsize;
    int rc = find_bsize(data + off, len - off, &bsize);
    if (rc != 0) return rc;
    if (off + bsize > len) return -5;  // truncated block
    if (n >= max_blocks) return -6;
    const uint8_t* footer = data + off + bsize - kFooterLen;
    uint32_t isize = static_cast<uint32_t>(footer[4]) |
                     (static_cast<uint32_t>(footer[5]) << 8) |
                     (static_cast<uint32_t>(footer[6]) << 16) |
                     (static_cast<uint32_t>(footer[7]) << 24);
    offsets[n] = off;
    csizes[n] = static_cast<unsigned int>(bsize);
    usizes[n] = isize;
    ++n;
    off += bsize;
  }
  return static_cast<long long>(n);
}

// Decompress all blocks in parallel into `out` (callers size it from usizes sum).
// Returns 0, or a negative zlib-ish error.
int bgzf_decompress_blocks(const uint8_t* data,
                           const unsigned long long* offsets,
                           const unsigned int* csizes,
                           const unsigned long long* out_offsets,
                           const unsigned int* usizes,
                           size_t n_blocks, uint8_t* out, int n_threads) {
  std::atomic<int> err{0};
#ifdef CCS_USE_LIBDEFLATE
  parallel_for_ctx(
      n_blocks, n_threads, []() { return libdeflate_alloc_decompressor(); },
      [&](size_t i, libdeflate_decompressor* d) {
        if (err.load()) return;
        if (d == nullptr) {
          err.store(-10);
          return;
        }
        const uint8_t* p = data + offsets[i];
        uint16_t xlen = rd_u16(p + 10);
        const uint8_t* cdata = p + 12 + xlen;
        size_t clen = csizes[i] - 12 - xlen - kFooterLen;
        size_t actual = 0;
        libdeflate_result rc = libdeflate_deflate_decompress(
            d, cdata, clen, out + out_offsets[i], usizes[i], &actual);
        if (rc != LIBDEFLATE_SUCCESS || actual != usizes[i]) err.store(-11);
      },
      [](libdeflate_decompressor* d) {
        if (d != nullptr) libdeflate_free_decompressor(d);
      });
#else
  parallel_for_ctx(
      n_blocks, n_threads, []() { return 0; },
      [&](size_t i, int) {
        if (err.load()) return;
        const uint8_t* p = data + offsets[i];
        uint16_t xlen = rd_u16(p + 10);
        const uint8_t* cdata = p + 12 + xlen;
        size_t clen = csizes[i] - 12 - xlen - kFooterLen;
        z_stream zs;
        std::memset(&zs, 0, sizeof(zs));
        if (inflateInit2(&zs, -15) != Z_OK) {
          err.store(-10);
          return;
        }
        zs.next_in = const_cast<uint8_t*>(cdata);
        zs.avail_in = static_cast<uInt>(clen);
        zs.next_out = out + out_offsets[i];
        zs.avail_out = usizes[i];
        int rc = inflate(&zs, Z_FINISH);
        inflateEnd(&zs);
        if (rc != Z_STREAM_END || zs.total_out != usizes[i]) err.store(-11);
      },
      [](int) {});
#endif
  return err.load();
}

// Compress `len` payload bytes as ceil(len/kMaxBlockData) BGZF members, written
// at out + i*worst_block_size with actual sizes in out_sizes (caller compacts).
// Returns number of blocks or negative error. worst_block_size must be
// >= bgzf_worst_block_size().
long long bgzf_compress_chunks(const uint8_t* data, size_t len, int level,
                               uint8_t* out, unsigned int* out_sizes,
                               size_t worst_block_size, int n_threads) {
  size_t n_blocks = (len + kMaxBlockData - 1) / kMaxBlockData;
  if (len == 0) n_blocks = 0;
  std::atomic<int> err{0};

  auto frame_block = [&](uint8_t* dst, size_t clen, const uint8_t* src,
                         size_t chunk, uint32_t crc, size_t i) {
    size_t bsize = clen + kHeaderLen + kFooterLen;
    static const uint8_t hdr[12] = {0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff,
                                    6, 0};
    std::memcpy(dst, hdr, 12);
    dst[12] = 'B';
    dst[13] = 'C';
    wr_u16(dst + 14, 2);
    wr_u16(dst + 16, static_cast<uint16_t>(bsize - 1));
    wr_u32(dst + kHeaderLen + clen, crc);
    wr_u32(dst + kHeaderLen + clen + 4, static_cast<uint32_t>(chunk));
    out_sizes[i] = static_cast<unsigned int>(bsize);
    (void)src;
  };

#ifdef CCS_USE_LIBDEFLATE
  // zlib levels are 0-9; libdeflate's 0-12 use the same meaning at 0-9.
  int ld_level = level < 0 ? 6 : (level > 12 ? 12 : level);
  struct Ctx {
    libdeflate_compressor* c;        // requested level
    libdeflate_compressor* c_store;  // level 0 = stored, for incompressible
  };
  parallel_for_ctx(
      n_blocks, n_threads,
      [&]() {
        Ctx ctx;
        ctx.c = libdeflate_alloc_compressor(ld_level);
        ctx.c_store = libdeflate_alloc_compressor(0);
        return ctx;
      },
      [&](size_t i, Ctx& ctx) {
        if (err.load()) return;
        if (ctx.c == nullptr || ctx.c_store == nullptr) {
          err.store(-20);
          return;
        }
        size_t start = i * kMaxBlockData;
        size_t chunk = std::min(kMaxBlockData, len - start);
        uint8_t* dst = out + i * worst_block_size;
        size_t avail = worst_block_size - kHeaderLen - kFooterLen;
        size_t clen = libdeflate_deflate_compress(ctx.c, data + start, chunk,
                                                  dst + kHeaderLen, avail);
        if (clen == 0) {  // didn't fit: emit stored deflate blocks
          clen = libdeflate_deflate_compress(ctx.c_store, data + start, chunk,
                                             dst + kHeaderLen, avail);
          if (clen == 0) {
            err.store(-21);
            return;
          }
        }
        uint32_t crc = libdeflate_crc32(0, data + start, chunk);
        frame_block(dst, clen, data + start, chunk, crc, i);
      },
      [](Ctx& ctx) {
        if (ctx.c != nullptr) libdeflate_free_compressor(ctx.c);
        if (ctx.c_store != nullptr) libdeflate_free_compressor(ctx.c_store);
      });
#else
  parallel_for_ctx(
      n_blocks, n_threads, []() { return 0; },
      [&](size_t i, int) {
        if (err.load()) return;
        size_t start = i * kMaxBlockData;
        size_t chunk = std::min(kMaxBlockData, len - start);
        uint8_t* dst = out + i * worst_block_size;
        // compress raw deflate into dst + kHeaderLen
        z_stream zs;
        std::memset(&zs, 0, sizeof(zs));
        if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY) !=
            Z_OK) {
          err.store(-20);
          return;
        }
        zs.next_in = const_cast<uint8_t*>(data + start);
        zs.avail_in = static_cast<uInt>(chunk);
        zs.next_out = dst + kHeaderLen;
        zs.avail_out =
            static_cast<uInt>(worst_block_size - kHeaderLen - kFooterLen);
        int rc = deflate(&zs, Z_FINISH);
        size_t clen = zs.total_out;
        deflateEnd(&zs);
        if (rc != Z_STREAM_END) {
          // incompressible: store uncompressed (level 0)
          std::memset(&zs, 0, sizeof(zs));
          deflateInit2(&zs, 0, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY);
          zs.next_in = const_cast<uint8_t*>(data + start);
          zs.avail_in = static_cast<uInt>(chunk);
          zs.next_out = dst + kHeaderLen;
          zs.avail_out =
              static_cast<uInt>(worst_block_size - kHeaderLen - kFooterLen);
          rc = deflate(&zs, Z_FINISH);
          clen = zs.total_out;
          deflateEnd(&zs);
          if (rc != Z_STREAM_END) {
            err.store(-21);
            return;
          }
        }
        uint32_t crc = crc32(0L, Z_NULL, 0);
        crc = crc32(crc, data + start, static_cast<uInt>(chunk));
        frame_block(dst, clen, data + start, chunk, crc, i);
      },
      [](int) {});
#endif
  if (err.load()) return err.load();
  return static_cast<long long>(n_blocks);
}

size_t bgzf_worst_block_size() {
#ifdef CCS_USE_LIBDEFLATE
  // libdeflate's own worst-case bound for a 65280-byte input + BGZF framing
  size_t bound = libdeflate_deflate_compress_bound(nullptr, kMaxBlockData);
  return bound + kHeaderLen + kFooterLen;
#else
  // zlib deflate bound for 65280 bytes + framing, rounded generously
  return kMaxBlockData + 1024 + kHeaderLen + kFooterLen;
#endif
}

}  // extern "C"
