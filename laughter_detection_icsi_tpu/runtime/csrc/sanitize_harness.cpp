// Sanitizer stress harness for the native host runtime (audio_decoder.cpp
// + pcm_pack.cpp).  Compiled BY tests/test_native_sanitizers.py together
// with the two production sources under -fsanitize=thread and under
// -fsanitize=address,undefined, then driven as a standalone binary:
//
//   harness race <file...>   concurrent batch decodes of the SAME files,
//                            plus header-parse and packer hammer threads
//                            (TSAN: data races in the pthread pool and any
//                            shared statics, e.g. the ulaw table)
//   harness fuzz <file...>   deterministic truncation / bit-flip mutations
//                            of each file, every mutant decoded to
//                            completion (ASAN/UBSAN: parser and bitstream
//                            memory safety on malformed input)
//
// The reference has no race-detection or sanitizer story (SURVEY.md §5.2:
// its only concurrency is a worker pool it dodges with
// torch.set_num_threads(1), compute_features.py:93-95).  This framework's
// native path decodes untrusted bytes with a pthread pool on the serving
// host, so it gets one.  Exit code 0 = clean; sanitizer reports either
// abort (halt_on_error/-fno-sanitize-recover) or show up on stderr, which
// the test asserts empty of sanitizer markers.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <pthread.h>
#include <unistd.h>

// ---- C ABI of the production sources (linked into this binary) ---- //
extern "C" {
typedef struct {
  int32_t sample_rate;
  int64_t num_samples;
  int32_t num_channels;
  int32_t sample_bytes;
  int32_t encoding;
  int32_t big_endian;
  int64_t data_offset;
  int32_t is_wav;
} audio_info_t;

int audio_info(const char* path, audio_info_t* info);
int64_t audio_read_f32(const char* path, int64_t start, int64_t count,
                       int32_t channel, float* out);
int audio_read_batch(const char** paths, const int64_t* starts,
                     const int64_t* counts, const int32_t* channels,
                     float** outs, int64_t* results, int n, int threads);
int64_t audio_decode_shorten_i16(const char* path, int16_t* out,
                                 int64_t max_frames, int32_t num_channels);
int64_t pcm_pack(const int16_t* x, int64_t n, int32_t block, int32_t mode,
                 uint32_t* words, int32_t* widths, int32_t* delta_out);
}

// Deterministic LCG so fuzz runs are reproducible run-to-run (the harness
// must not depend on time()/rand() seeding — a failure has to replay).
// State is caller-owned: hammer threads each carry their own so the
// harness itself is race-free under TSAN.
static uint64_t lcg(uint64_t* state) {
  *state = *state * 6364136223846793005ull + 1442695040888963407ull;
  return *state >> 16;
}
#define LCG_SEED 0x9e3779b97f4a7c15ull

// ------------------------------ race ------------------------------- //

enum { REPLICAS = 4, ROUNDS = 8, HAMMER_THREADS = 4 };

typedef struct {
  char** files;
  int nfiles;
  std::atomic<int>* stop;  // set once by main; hammer threads poll it
  uint64_t seed;           // per-thread LCG seed
} hammer_arg_t;

// Header parses + packer calls racing against the decode pool: audio_info
// shares the open/parse path with the pool's audio_read_f32 workers, and
// pcm_pack shares nothing (proves it, under TSAN).
static void* hammer(void* p) {
  hammer_arg_t* a = (hammer_arg_t*)p;
  uint64_t st = a->seed;
  int16_t pcm[2048];
  for (int i = 0; i < 2048; i++) pcm[i] = (int16_t)(lcg(&st) & 0xffff);
  uint32_t words[2048 / 32 * 17 + 1];
  int32_t widths[2048 / 32];
  while (!a->stop->load(std::memory_order_relaxed)) {
    for (int f = 0; f < a->nfiles; f++) {
      audio_info_t info;
      (void)audio_info(a->files[f], &info);
    }
    int32_t delta = 0;
    memset(words, 0, sizeof(words));
    if (pcm_pack(pcm, 2048, 64, -1, words, widths, &delta) < 0) return (void*)1;
  }
  return nullptr;
}

static int run_race(int nfiles, char** files) {
  // Probe each file once; only decodable ones join the batch.
  audio_info_t* infos = (audio_info_t*)calloc(nfiles, sizeof(audio_info_t));
  int n = nfiles * REPLICAS;
  const char** paths = (const char**)calloc(n, sizeof(char*));
  int64_t* starts = (int64_t*)calloc(n, sizeof(int64_t));
  int64_t* counts = (int64_t*)calloc(n, sizeof(int64_t));
  int32_t* chans = (int32_t*)calloc(n, sizeof(int32_t));
  float** outs = (float**)calloc(n, sizeof(float*));
  int64_t* results = (int64_t*)calloc(n, sizeof(int64_t));
  int k = 0;
  for (int f = 0; f < nfiles; f++) {
    if (audio_info(files[f], &infos[f]) != 0) continue;
    for (int r = 0; r < REPLICAS; r++) {
      paths[k] = files[f];
      starts[k] = 0;
      counts[k] = infos[f].num_samples;
      chans[k] = 0;
      // Per-replica output buffers: the production caller (native.py
      // read_batch) never shares one buffer between batch items.
      outs[k] = (float*)malloc(sizeof(float) * (size_t)infos[f].num_samples + 4);
      k++;
    }
  }
  std::atomic<int> stop(0);
  hammer_arg_t ha[HAMMER_THREADS];
  pthread_t hts[HAMMER_THREADS];
  for (int t = 0; t < HAMMER_THREADS; t++) {
    ha[t] = {files, nfiles, &stop, LCG_SEED + (uint64_t)t};
    pthread_create(&hts[t], nullptr, hammer, &ha[t]);
  }

  int bad = 0;
  for (int round = 0; round < ROUNDS; round++) {
    if (audio_read_batch(paths, starts, counts, chans, outs, results, k, 8) != 0)
      bad++;
    for (int i = 0; i < k; i++)
      if (results[i] < 0) bad++;
  }
  stop.store(1);
  for (int t = 0; t < HAMMER_THREADS; t++) pthread_join(hts[t], nullptr);
  for (int i = 0; i < k; i++) free(outs[i]);
  free(infos); free(paths); free(starts); free(counts);
  free(chans); free(outs); free(results);
  if (bad) fprintf(stderr, "race: %d decode failures\n", bad);
  return bad ? 2 : 0;
}

// ------------------------------ fuzz ------------------------------- //

enum {
  CAP_SAMPLES = 1 << 20,   // decode bound per mutant (floats)
  CAP_FRAMES = 1 << 18,    // shorten decode bound (frames)
  CAP_CHANNELS = 8,
  BITFLIPS = 160,
};

// Decode one (possibly malformed) file end to end through every entry
// point.  Every return value is acceptable — the contract under fuzz is
// "no memory error, no UB, an error code or a sample count".
static void decode_mutant(const char* path, float* fbuf, int16_t* sbuf) {
  audio_info_t info;
  if (audio_info(path, &info) != 0) return;
  int64_t count = info.num_samples < CAP_SAMPLES ? info.num_samples : CAP_SAMPLES;
  if (count < 0) count = 0;
  (void)audio_read_f32(path, 0, count, 0, fbuf);
  // Also a misaligned ranged read (offset clamps, tail truncation).
  (void)audio_read_f32(path, count / 3 + 1, count / 2 + 1, 0, fbuf);
  if (info.encoding == 3 /* shorten */) {
    int32_t nch = info.num_channels;
    if (nch < 1) nch = 1;
    if (nch > CAP_CHANNELS) nch = CAP_CHANNELS;
    int64_t mf = info.num_samples < CAP_FRAMES ? info.num_samples : CAP_FRAMES;
    if (mf < 0) mf = 0;
    (void)audio_decode_shorten_i16(path, sbuf, mf, nch);
  }
}

static int write_file(const char* path, const uint8_t* data, size_t len) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  if (len && fwrite(data, 1, len, f) != len) { fclose(f); return -1; }
  fclose(f);
  return 0;
}

static int run_fuzz(int nfiles, char** files) {
  uint64_t st = LCG_SEED;
  float* fbuf = (float*)malloc(sizeof(float) * CAP_SAMPLES);
  int16_t* sbuf = (int16_t*)malloc(sizeof(int16_t) * CAP_FRAMES * CAP_CHANNELS);
  char tmp[4096];
  snprintf(tmp, sizeof(tmp), "%s.mutant", files[0]);
  for (int f = 0; f < nfiles; f++) {
    FILE* in = fopen(files[f], "rb");
    if (!in) return 2;
    fseek(in, 0, SEEK_END);
    long len = ftell(in);
    fseek(in, 0, SEEK_SET);
    uint8_t* data = (uint8_t*)malloc(len ? len : 1);
    if (fread(data, 1, len, in) != (size_t)len) { fclose(in); free(data); return 2; }
    fclose(in);

    // Truncations: dense over the header, 16 cut points over the payload.
    for (long cut = 0; cut < 72 && cut < len; cut += 7) {
      if (write_file(tmp, data, cut)) return 2;
      decode_mutant(tmp, fbuf, sbuf);
    }
    for (int i = 1; i <= 16; i++) {
      long cut = (long)((int64_t)len * i / 17);
      if (write_file(tmp, data, cut)) return 2;
      decode_mutant(tmp, fbuf, sbuf);
    }
    // Bit flips: deterministic positions, one flip per mutant.
    for (int i = 0; i < BITFLIPS; i++) {
      long off = (long)(lcg(&st) % (uint64_t)(len ? len : 1));
      uint8_t bit = (uint8_t)(1u << (lcg(&st) & 7));
      data[off] ^= bit;
      if (write_file(tmp, data, len)) return 2;
      decode_mutant(tmp, fbuf, sbuf);
      data[off] ^= bit;  // restore so mutants stay single-flip
    }
    free(data);
  }
  unlink(tmp);

  // Packer arg-space sweep (caller-side contract: buffers sized per
  // ops/pcm_pack.py's worst case; bad block sizes must return -1).
  {
    int16_t x[4096];
    for (int i = 0; i < 4096; i++) x[i] = (int16_t)(lcg(&st) & 0xffff);
    const int64_t ns[] = {0, 1, 31, 32, 33, 1000, 4096};
    const int32_t blocks[] = {32, 64, 256};
    for (unsigned a = 0; a < sizeof(ns) / sizeof(ns[0]); a++)
      for (unsigned b = 0; b < sizeof(blocks) / sizeof(blocks[0]); b++)
        for (int32_t mode = -1; mode <= 1; mode++) {
          int64_t n = ns[a];
          int32_t block = blocks[b];
          int64_t n_blocks = (n + block - 1) / block;
          if (n_blocks == 0) n_blocks = 1;
          uint32_t* words =
              (uint32_t*)calloc(n_blocks * (block / 32) * 17 + 1, 4);
          int32_t* widths = (int32_t*)calloc(n_blocks, 4);
          int32_t delta = 0;
          if (pcm_pack(x, n, block, mode, words, widths, &delta) < 0) return 3;
          free(words);
          free(widths);
        }
    int32_t delta = 0;
    uint32_t w[64];
    int32_t wd[4];
    if (pcm_pack(x, 64, 33, 0, w, wd, &delta) != -1) return 3;  // bad block
    if (pcm_pack(x, -1, 32, 0, w, wd, &delta) != -1) return 3;  // bad n
  }
  free(fbuf);
  free(sbuf);
  return 0;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s race|fuzz <file...>\n", argv[0]);
    return 64;
  }
  if (!strcmp(argv[1], "race")) return run_race(argc - 2, argv + 2);
  if (!strcmp(argv[1], "fuzz")) return run_fuzz(argc - 2, argv + 2);
  fprintf(stderr, "unknown mode %s\n", argv[1]);
  return 64;
}
