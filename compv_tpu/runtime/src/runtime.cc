// compv-tpu native host runtime: threaded frame loader, aligned buffers, MD5.
//
// TPU-native re-design of the reference's host runtime layer:
//   * CompVThreadDispatcher/CompVAsyncTask11 (base/parallel/, pinned worker
//     threads + semaphore queues) -> here a prefetching loader pool whose job
//     is feeding the accelerator, not computing (compute lives on the TPU);
//   * CompVMem aligned allocation (base/compv_mem.cxx bestAlignment) ->
//     cv_aligned_alloc with explicit alignment so frame buffers can be
//     dma-friendly and zero-copy into jax.numpy via ctypes;
//   * CompVMd5 (base/compv_md5.cxx, the test oracle) -> cv_md5_hex.
//
// Pure C ABI so Python binds with ctypes (no pybind11 in the image).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- aligned mem

void* cv_aligned_alloc(long bytes, long alignment) {
  void* p = nullptr;
  if (posix_memalign(&p, (size_t)alignment, (size_t)bytes) != 0) return nullptr;
  return p;
}

void cv_aligned_free(void* p) { free(p); }

// ----------------------------------------------------------------------- md5
// RFC 1321 MD5 (public algorithm), used as the golden-checksum test oracle
// the way the reference uses CompVMd5 (tests/tests_common.h compv_tests_md5).

namespace {

struct Md5Ctx {
  uint32_t a = 0x67452301, b = 0xefcdab89, c = 0x98badcfe, d = 0x10325476;
  uint64_t total = 0;
  uint8_t buf[64];
  size_t buf_len = 0;
};

inline uint32_t rotl(uint32_t x, int s) { return (x << s) | (x >> (32 - s)); }

const uint32_t K[64] = {
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee, 0xf57c0faf, 0x4787c62a,
    0xa8304613, 0xfd469501, 0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821, 0xf61e2562, 0xc040b340,
    0x265e5a51, 0xe9b6c7aa, 0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed, 0xa9e3e905, 0xfcefa3f8,
    0x676f02d9, 0x8d2a4c8a, 0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70, 0x289b7ec6, 0xeaa127fa,
    0xd4ef3085, 0x04881d05, 0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039, 0x655b59c3, 0x8f0ccc92,
    0xffeff47d, 0x85845dd1, 0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391};
const int S[64] = {7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
                   5, 9,  14, 20, 5, 9,  14, 20, 5, 9,  14, 20, 5, 9,  14, 20,
                   4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
                   6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21};

void md5_block(Md5Ctx& ctx, const uint8_t* p) {
  uint32_t m[16];
  memcpy(m, p, 64);
  uint32_t a = ctx.a, b = ctx.b, c = ctx.c, d = ctx.d;
  for (int i = 0; i < 64; i++) {
    uint32_t f;
    int g;
    if (i < 16) { f = (b & c) | (~b & d); g = i; }
    else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15; }
    else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15; }
    else { f = c ^ (b | ~d); g = (7 * i) & 15; }
    uint32_t tmp = d;
    d = c;
    c = b;
    b = b + rotl(a + f + K[i] + m[g], S[i]);
    a = tmp;
  }
  ctx.a += a; ctx.b += b; ctx.c += c; ctx.d += d;
}

void md5_update(Md5Ctx& ctx, const uint8_t* data, size_t n) {
  ctx.total += n;
  while (n > 0) {
    size_t take = 64 - ctx.buf_len;
    if (take > n) take = n;
    memcpy(ctx.buf + ctx.buf_len, data, take);
    ctx.buf_len += take;
    data += take;
    n -= take;
    if (ctx.buf_len == 64) { md5_block(ctx, ctx.buf); ctx.buf_len = 0; }
  }
}

void md5_final(Md5Ctx& ctx, uint8_t out[16]) {
  uint64_t bits = ctx.total * 8;
  uint8_t pad = 0x80;
  md5_update(ctx, &pad, 1);
  uint8_t zero = 0;
  while (ctx.buf_len != 56) md5_update(ctx, &zero, 1);
  md5_update(ctx, (const uint8_t*)&bits, 8);
  memcpy(out + 0, &ctx.a, 4);
  memcpy(out + 4, &ctx.b, 4);
  memcpy(out + 8, &ctx.c, 4);
  memcpy(out + 12, &ctx.d, 4);
}

}  // namespace

void cv_md5_hex(const unsigned char* data, long n, char* out33) {
  Md5Ctx ctx;
  md5_update(ctx, data, (size_t)n);
  uint8_t dig[16];
  md5_final(ctx, dig);
  static const char* hexd = "0123456789abcdef";
  for (int i = 0; i < 16; i++) {
    out33[2 * i] = hexd[dig[i] >> 4];
    out33[2 * i + 1] = hexd[dig[i] & 15];
  }
  out33[32] = 0;
}

// -------------------------------------------------------------------- loader
// Prefetching frame loader: worker threads read fixed-size raw frames from a
// file list into a bounded ring of aligned slots; the consumer drains them
// in order. This hides disk/NFS latency behind TPU compute, the role the
// reference's dispatcher plays for its CPU kernels.

namespace {

struct Slot {
  std::vector<uint8_t> data;
  long index = -1;          // which frame occupies the slot
  bool ready = false;
  long size = 0;            // bytes actually read (0 => read error)
};

struct Loader {
  std::vector<std::string> paths;
  long frame_bytes;
  int queue_depth;
  std::vector<Slot> slots;
  std::mutex mu;
  std::condition_variable cv_ready;   // consumer waits for next frame
  std::condition_variable cv_free;    // workers wait for a free slot
  std::atomic<long> next_claim{0};    // next frame index a worker takes
  long next_serve = 0;                // next frame index the consumer needs
  bool stop = false;
  std::vector<std::thread> workers;
};

void worker_main(Loader* L) {
  for (;;) {
    long idx = L->next_claim.fetch_add(1);
    if (idx >= (long)L->paths.size()) return;
    // read the file outside the lock
    std::vector<uint8_t> tmp((size_t)L->frame_bytes);
    long got = 0;
    FILE* f = fopen(L->paths[idx].c_str(), "rb");
    if (f) {
      got = (long)fread(tmp.data(), 1, (size_t)L->frame_bytes, f);
      fclose(f);
    }
    std::unique_lock<std::mutex> lk(L->mu);
    // wait for the slot assigned to this frame (ring by frame index) to be
    // free AND within the consumer's window (bounds memory)
    int s = (int)(idx % L->queue_depth);
    L->cv_free.wait(lk, [&] {
      return L->stop ||
             (!L->slots[s].ready && idx < L->next_serve + L->queue_depth);
    });
    if (L->stop) return;
    L->slots[s].data.swap(tmp);
    L->slots[s].index = idx;
    L->slots[s].size = got;
    L->slots[s].ready = true;
    L->cv_ready.notify_all();
  }
}

}  // namespace

void* cv_loader_create(const char** paths, int n_paths, long frame_bytes,
                       int n_workers, int queue_depth) {
  Loader* L = new Loader();
  L->paths.assign(paths, paths + n_paths);
  L->frame_bytes = frame_bytes;
  L->queue_depth = queue_depth > 0 ? queue_depth : 4;
  L->slots.resize(L->queue_depth);
  if (n_workers < 1) n_workers = 1;
  for (int i = 0; i < n_workers; i++)
    L->workers.emplace_back(worker_main, L);
  return L;
}

// Copies the next frame (in order) into buf; returns its byte count,
// 0 on a read error for that frame, -1 when the list is exhausted.
long cv_loader_next(void* loader, unsigned char* buf) {
  Loader* L = (Loader*)loader;
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_serve >= (long)L->paths.size()) return -1;
  int s = (int)(L->next_serve % L->queue_depth);
  L->cv_ready.wait(lk, [&] {
    return L->slots[s].ready && L->slots[s].index == L->next_serve;
  });
  long got = L->slots[s].size;
  memcpy(buf, L->slots[s].data.data(), (size_t)L->frame_bytes);
  L->slots[s].ready = false;
  L->next_serve++;
  L->cv_free.notify_all();
  return got;
}

void cv_loader_destroy(void* loader) {
  Loader* L = (Loader*)loader;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_free.notify_all();
  L->cv_ready.notify_all();
  // drain claims so workers exit fast
  L->next_claim.store((long)L->paths.size());
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
