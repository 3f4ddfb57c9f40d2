// zuds_tpu native FITS pixel I/O + prefetching loader.
//
// The pure-python codec (zuds_tpu/fits/io.py) is the semantic reference;
// this library accelerates the hot paths of a production night: bulk pixel
// reads (byteswap-bound) and overlapping file I/O with device compute via a
// worker-thread prefetch queue. Exposed as a C ABI consumed through ctypes
// (zuds_tpu/fits/native.py).
//
// Scope: single-image-HDU FITS (the pipeline's science/mask/weight/rms
// products). Multi-HDU and binary tables stay in python.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr size_t kBlock = 2880;
constexpr size_t kCard = 80;

struct Header {
  std::string raw;        // raw header bytes (python parses the cards)
  long bitpix = 0;
  long naxis = 0;
  long naxis1 = 0, naxis2 = 0, naxis3 = 1;
  double bscale = 1.0, bzero = 0.0;
  bool has_scale = false;
};

long parse_long(const char* v) { return strtol(v, nullptr, 10); }
double parse_double(const char* v) { return strtod(v, nullptr); }

// Read header blocks from fp; returns false on EOF/short read.
bool read_header(FILE* fp, Header* h) {
  char block[kBlock];
  h->raw.clear();
  bool done = false;
  while (!done) {
    if (fread(block, 1, kBlock, fp) != kBlock) return false;
    h->raw.append(block, kBlock);
    for (size_t i = 0; i < kBlock; i += kCard) {
      const char* card = block + i;
      if (memcmp(card, "END     ", 8) == 0) { done = true; break; }
      if (card[8] != '=') continue;
      const char* val = card + 10;
      if (memcmp(card, "BITPIX  ", 8) == 0) h->bitpix = parse_long(val);
      else if (memcmp(card, "NAXIS   ", 8) == 0) h->naxis = parse_long(val);
      else if (memcmp(card, "NAXIS1  ", 8) == 0) h->naxis1 = parse_long(val);
      else if (memcmp(card, "NAXIS2  ", 8) == 0) h->naxis2 = parse_long(val);
      else if (memcmp(card, "NAXIS3  ", 8) == 0) h->naxis3 = parse_long(val);
      else if (memcmp(card, "BSCALE  ", 8) == 0) {
        h->bscale = parse_double(val); h->has_scale = true;
      } else if (memcmp(card, "BZERO   ", 8) == 0) {
        h->bzero = parse_double(val); h->has_scale = true;
      }
    }
  }
  return true;
}

inline uint16_t bswap16(uint16_t x) { return __builtin_bswap16(x); }
inline uint32_t bswap32(uint32_t x) { return __builtin_bswap32(x); }
inline uint64_t bswap64(uint64_t x) { return __builtin_bswap64(x); }

// Parallel byteswap: the hot loop of quadrant ingest (37.8 MB / frame).
template <typename T, typename SwapFn>
void byteswap_parallel(T* data, size_t n, SwapFn swap, int nthreads) {
  if (nthreads <= 1 || n < (1u << 16)) {
    for (size_t i = 0; i < n; ++i) data[i] = swap(data[i]);
    return;
  }
  std::vector<std::thread> ts;
  size_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    size_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=] {
      for (size_t i = lo; i < hi; ++i) data[i] = swap(data[i]);
    });
  }
  for (auto& t : ts) t.join();
}

struct Image {
  Header header;
  std::vector<uint8_t> pixels;  // native-endian raw pixel payload
  int status = 0;               // 0 ok; <0 error
};

int read_image_impl(const char* path, Image* out, int nthreads) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  if (!read_header(fp, &out->header)) { fclose(fp); return -2; }
  const Header& h = out->header;
  if (h.naxis < 2 || h.naxis1 <= 0 || h.naxis2 <= 0) { fclose(fp); return -3; }
  size_t npix = size_t(h.naxis1) * size_t(h.naxis2) * size_t(h.naxis3);
  size_t itemsize = size_t(std::abs(h.bitpix)) / 8;
  size_t nbytes = npix * itemsize;
  out->pixels.resize(nbytes);
  if (fread(out->pixels.data(), 1, nbytes, fp) != nbytes) {
    fclose(fp);
    return -4;
  }
  fclose(fp);
  // big-endian on disk -> native little-endian
  switch (itemsize) {
    case 2: byteswap_parallel(reinterpret_cast<uint16_t*>(out->pixels.data()),
                              npix, bswap16, nthreads); break;
    case 4: byteswap_parallel(reinterpret_cast<uint32_t*>(out->pixels.data()),
                              npix, bswap32, nthreads); break;
    case 8: byteswap_parallel(reinterpret_cast<uint64_t*>(out->pixels.data()),
                              npix, bswap64, nthreads); break;
    default: break;
  }
  return 0;
}

int write_image_impl(const char* path, const uint8_t* header_bytes,
                     size_t header_len, const uint8_t* pixels, size_t nbytes,
                     size_t itemsize, int nthreads) {
  if (header_len % kBlock != 0) return -5;
  std::string tmp = std::string(path) + ".ztmp";
  FILE* fp = fopen(tmp.c_str(), "wb");
  if (!fp) return -1;
  if (fwrite(header_bytes, 1, header_len, fp) != header_len) {
    fclose(fp); return -6;
  }
  // swap a copy to big-endian
  std::vector<uint8_t> buf(pixels, pixels + nbytes);
  size_t npix = itemsize ? nbytes / itemsize : 0;
  switch (itemsize) {
    case 2: byteswap_parallel(reinterpret_cast<uint16_t*>(buf.data()), npix,
                              bswap16, nthreads); break;
    case 4: byteswap_parallel(reinterpret_cast<uint32_t*>(buf.data()), npix,
                              bswap32, nthreads); break;
    case 8: byteswap_parallel(reinterpret_cast<uint64_t*>(buf.data()), npix,
                              bswap64, nthreads); break;
    default: break;
  }
  if (fwrite(buf.data(), 1, nbytes, fp) != nbytes) { fclose(fp); return -6; }
  size_t pad = (kBlock - (nbytes % kBlock)) % kBlock;
  if (pad) {
    std::vector<uint8_t> zeros(pad, 0);
    fwrite(zeros.data(), 1, pad, fp);
  }
  fclose(fp);
  if (rename(tmp.c_str(), path) != 0) return -7;
  return 0;
}

// ---------------- prefetch pool ----------------------------------------

struct Prefetcher {
  std::mutex mu;
  std::condition_variable cv;
  std::deque<std::pair<int64_t, std::string>> queue;
  std::unordered_map<int64_t, Image*> done;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  int swap_threads = 2;

  explicit Prefetcher(int nworkers, int swap_threads_)
      : swap_threads(swap_threads_) {
    for (int i = 0; i < nworkers; ++i) {
      workers.emplace_back([this] { run(); });
    }
  }

  ~Prefetcher() {
    stop = true;
    cv.notify_all();
    for (auto& w : workers) w.join();
    for (auto& kv : done) delete kv.second;
  }

  void run() {
    for (;;) {
      std::pair<int64_t, std::string> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        job = queue.front();
        queue.pop_front();
      }
      Image* im = new Image();
      im->status = read_image_impl(job.second.c_str(), im, swap_threads);
      {
        std::lock_guard<std::mutex> lk(mu);
        done[job.first] = im;
      }
      cv.notify_all();
    }
  }

  void submit(int64_t ticket, const char* path) {
    {
      std::lock_guard<std::mutex> lk(mu);
      queue.emplace_back(ticket, path);
    }
    cv.notify_one();
  }

  Image* wait(int64_t ticket) {
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [&] { return done.count(ticket) > 0; });
    Image* im = done[ticket];
    done.erase(ticket);
    return im;
  }
};

}  // namespace

extern "C" {

// ---- single-shot API ----
// Reads path; on success fills metadata and returns a handle the caller must
// copy out of and free. Returns nullptr on failure (status in *status).
void* zf_read_image(const char* path, int nthreads, int64_t* header_len,
                    int64_t* data_len, long* bitpix, long* naxis1,
                    long* naxis2, double* bscale, double* bzero,
                    int* status) {
  Image* im = new Image();
  int rc = read_image_impl(path, im, nthreads);
  *status = rc;
  if (rc != 0) { delete im; return nullptr; }
  *header_len = im->header.raw.size();
  *data_len = im->pixels.size();
  *bitpix = im->header.bitpix;
  *naxis1 = im->header.naxis1;
  *naxis2 = im->header.naxis2;
  *bscale = im->header.bscale;
  *bzero = im->header.bzero;
  return im;
}

void zf_copy_header(void* handle, char* dst) {
  Image* im = static_cast<Image*>(handle);
  memcpy(dst, im->header.raw.data(), im->header.raw.size());
}

void zf_copy_pixels(void* handle, void* dst) {
  Image* im = static_cast<Image*>(handle);
  memcpy(dst, im->pixels.data(), im->pixels.size());
}

void zf_free_image(void* handle) { delete static_cast<Image*>(handle); }

int zf_write_image(const char* path, const void* header_bytes,
                   int64_t header_len, const void* pixels, int64_t nbytes,
                   int64_t itemsize, int nthreads) {
  return write_image_impl(path, static_cast<const uint8_t*>(header_bytes),
                          size_t(header_len),
                          static_cast<const uint8_t*>(pixels), size_t(nbytes),
                          size_t(itemsize), nthreads);
}

// ---- prefetch API ----
void* zf_prefetcher_create(int nworkers, int swap_threads) {
  return new Prefetcher(nworkers, swap_threads);
}

void zf_prefetcher_destroy(void* p) { delete static_cast<Prefetcher*>(p); }

void zf_prefetcher_submit(void* p, int64_t ticket, const char* path) {
  static_cast<Prefetcher*>(p)->submit(ticket, path);
}

// Blocks until the ticket is ready; returns an image handle (or nullptr if
// the read failed; status reported through zf_image_status).
void* zf_prefetcher_wait(void* p, int64_t ticket, int64_t* header_len,
                         int64_t* data_len, long* bitpix, long* naxis1,
                         long* naxis2, double* bscale, double* bzero,
                         int* status) {
  Image* im = static_cast<Prefetcher*>(p)->wait(ticket);
  *status = im->status;
  if (im->status != 0) { delete im; return nullptr; }
  *header_len = im->header.raw.size();
  *data_len = im->pixels.size();
  *bitpix = im->header.bitpix;
  *naxis1 = im->header.naxis1;
  *naxis2 = im->header.naxis2;
  *bscale = im->header.bscale;
  *bzero = im->header.bzero;
  return im;
}

}  // extern "C"
