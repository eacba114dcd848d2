// Batched JPEG decode + resize + center-crop for the training infeed.
//
// The reference decodes training JPEGs one-at-a-time in Python through
// torchvision's PIL loader inside DataLoader worker processes
// (/root/reference/dataloaders/q_learning_real.py:19-24 imageNetTransformPIL,
// /root/reference/train_q_network.py:98 num_workers=8). This stage decodes a
// whole batch of JPEG files in one C call with an in-process thread pool:
// no per-image Python dispatch, no worker-process IPC/pickling of pixel
// buffers. Per image it mirrors the host half of imageNetTransformPIL
// exactly as video_dqn_tpu/data/qlearning._load_image does with PIL:
//   * DCT-scaled decode via libjpeg-turbo (the same SIMD decoder and the
//     same 1/2^k IDCT-scaling policy as PIL's Image.draft);
//   * bilinear resize of the smallest edge to `size` (aspect preserved)
//     through swscale;
//   * center crop to (size, size).
// The Python twin (_load_image) stays the test oracle; outputs agree to
// within resampling tolerance, not bit-exactly.
//
// C ABI (ctypes; see video_dqn_tpu/data/native_decode.py):
//   int jpeg_batch_decode(const char* const* paths, int n, int size,
//                         uint8_t* out,      // n * size * size * 3
//                         uint8_t* failed,   // n flags; 1 = decode failed
//                         int n_threads);    // 0 = hardware_concurrency
//   returns the number of failed images (their `out` slots are undefined;
//   the Python wrapper falls back to PIL for those indices).

#include <cstddef>
#include <cstdio>

extern "C" {
#include <jpeglib.h>
#include <libswscale/swscale.h>
}

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Smallest-edge resize target, identical to _load_image's PIL math.
// nearbyint under the default FE_TONEAREST mode rounds half-to-even,
// matching Python round() in the oracle — half-up would differ by 1px at
// exact .5 scale ratios, giving mixed native/PIL-fallback batches
// inconsistent crop geometry.
void resize_dims(int w, int h, int size, int* nw, int* nh) {
  if (h <= w) {
    *nh = size;
    int t = (int)nearbyint((double)size * w / h);
    *nw = t > size ? t : size;
  } else {
    *nw = size;
    int t = (int)nearbyint((double)size * h / w);
    *nh = t > size ? t : size;
  }
}

struct JpegError {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void on_jpeg_error(j_common_ptr cinfo) {
  JpegError* e = (JpegError*)cinfo->err;
  longjmp(e->jb, 1);
}

// Per-thread scratch, reused across images: these buffers are past
// glibc's mmap threshold, so fresh per-image vectors would mmap/munmap
// (and page-fault) hundreds of KB per image — measured ~15x slower on
// first batches until the allocator adapts. Reuse keeps capacity.
struct Scratch {
  std::vector<uint8_t> file, decoded, resized;
};

// decode one file; returns false on any failure
bool decode_one(const char* path, int size, uint8_t* out, Scratch& scratch) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (len <= 0) {
    fclose(f);
    return false;
  }
  std::vector<uint8_t>& buf = scratch.file;
  if ((long)buf.size() < len) buf.resize(len);
  size_t rd = fread(buf.data(), 1, len, f);
  fclose(f);
  if ((long)rd != len) return false;

  jpeg_decompress_struct cinfo;
  JpegError jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = on_jpeg_error;
  std::vector<uint8_t>& decoded = scratch.decoded;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf.data(), (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  int w = (int)cinfo.image_width, h = (int)cinfo.image_height;
  if (w <= 0 || h <= 0) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  int nw, nh;
  resize_dims(w, h, size, &nw, &nh);
  // largest IDCT downscale whose floor'd output still covers the resize
  // target (PIL's draft picks the same power-of-two policy)
  int k = 0;
  while (k < 3 && (w >> (k + 1)) >= nw && (h >> (k + 1)) >= nh) k++;
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1u << k;
  cinfo.out_color_space = JCS_RGB;  // gray/YCbCr both convert in-decoder
  jpeg_start_decompress(&cinfo);
  int dw = (int)cinfo.output_width, dh = (int)cinfo.output_height;
  if (cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  // +64: swscale reads source rows in SIMD-width chunks and may touch a
  // few bytes past the last row
  if (decoded.size() < (size_t)dw * dh * 3 + 64)
    decoded.resize((size_t)dw * dh * 3 + 64);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = decoded.data() + (size_t)cinfo.output_scanline * dw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // bilinear resize (dw, dh) -> (nw, nh), fused with nothing else: RGB in,
  // RGB out; then center crop (size, size)
  SwsContext* sws =
      sws_getContext(dw, dh, AV_PIX_FMT_RGB24, nw, nh, AV_PIX_FMT_RGB24,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!sws) return false;
  std::vector<uint8_t>& resized = scratch.resized;
  // +64: swscale SIMD paths may write whole vectors at row ends
  if (resized.size() < (size_t)nw * nh * 3 + 64)
    resized.resize((size_t)nw * nh * 3 + 64);
  const uint8_t* src[4] = {decoded.data(), nullptr, nullptr, nullptr};
  int src_stride[4] = {3 * dw, 0, 0, 0};
  uint8_t* dst[4] = {resized.data(), nullptr, nullptr, nullptr};
  int dst_stride[4] = {3 * nw, 0, 0, 0};
  sws_scale(sws, src, src_stride, 0, dh, dst, dst_stride);
  sws_freeContext(sws);

  int left = (nw - size) / 2, top = (nh - size) / 2;
  for (int r = 0; r < size; r++)
    memcpy(out + (size_t)r * size * 3,
           resized.data() + ((size_t)(top + r) * nw + left) * 3,
           (size_t)size * 3);
  return true;
}

struct Job {
  const char* const* paths;
  int n;
  int size;
  uint8_t* out;
  uint8_t* failed;
  std::atomic<int> next{0};
  std::atomic<int> n_failed{0};
};

void worker(Job* job) {
  const size_t stride = (size_t)job->size * job->size * 3;
  Scratch scratch;
  while (true) {
    int i = job->next.fetch_add(1);
    if (i >= job->n) return;
    bool ok =
        decode_one(job->paths[i], job->size, job->out + stride * i, scratch);
    job->failed[i] = ok ? 0 : 1;
    if (!ok) job->n_failed.fetch_add(1);
  }
}

}  // namespace

extern "C" {

int jpeg_batch_decode(const char* const* paths, int n, int size, uint8_t* out,
                      uint8_t* failed, int n_threads) {
  if (n <= 0 || size <= 0) return 0;
  Job job;
  job.paths = paths;
  job.n = n;
  job.size = size;
  job.out = out;
  job.failed = failed;
  int hw = (int)std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = hw > 0 ? hw : 1;
  if (n_threads > n) n_threads = n;
  if (n_threads <= 1) {
    worker(&job);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int t = 0; t < n_threads; t++) threads.emplace_back(worker, &job);
    for (auto& th : threads) th.join();
  }
  return job.n_failed.load();
}

}  // extern "C"
