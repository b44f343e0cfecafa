// Sanitizer driver for the native runtime (SURVEY §5 "sanitizers" row).
//
// Compiled together with aligntools_native.cpp under
// -fsanitize=address,undefined -fno-sanitize-recover=all and run via
// `make -C native sanitize` (see tools/sanitize_check.sh). Exercises:
//
//   1. the parser on every file path passed on argv (reference fixtures),
//   2. deterministic fuzz corpora written to a temp dir: raw binary noise,
//      FASTA/FASTQ-shaped noise, giant single-line headers, CRLF, '+' lines
//      inside FASTA, empty files,
//   3. truncated/corrupt gzip streams (valid gz cut at every kind of byte
//      boundary, plus random-byte "gz" files with a valid magic),
//   4. both traceback walkers on random packed-pointer matrices, including
//      unset codes (the reference's infinite-loop hazard, alignment.h:913-914)
//      and the global epilogue padding path.
//
// The reference runs its (kseq.h) parser on untrusted gz input with no
// sanitizer coverage at all; this driver is the rebuilt framework's answer.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

extern "C" {
void* at_parse(const char* path, int64_t max_records);
int at_parse_error(void* h);
int64_t at_num_records(void* h);
const uint8_t* at_arena(void* h);
int64_t at_arena_size(void* h);
const int64_t* at_records_meta(void* h);
void at_free(void* h);
int64_t at_traceback_affine(const uint8_t* ptrs, int64_t row_stride,
                            const uint8_t* q, int64_t m, const uint8_t* t,
                            int64_t n, int start_state, int64_t i, int64_t j,
                            int stop_at_j0, uint8_t* out1, uint8_t* out2);
int64_t at_traceback_overlap(const uint8_t* ptrs, int64_t row_stride,
                             const uint8_t* q, int64_t m, const uint8_t* t,
                             int64_t n, int64_t i, int64_t j, uint8_t* out1,
                             uint8_t* out2);
}

namespace {

// Deterministic PRNG (xorshift64*) so failures reproduce exactly.
uint64_t rng_state = 0x9E3779B97F4A7C15ull;
uint64_t rnd() {
  uint64_t x = rng_state;
  x ^= x >> 12;
  x ^= x << 25;
  x ^= x >> 27;
  rng_state = x;
  return x * 0x2545F4914F6CDD1Dull;
}
uint64_t rnd_below(uint64_t n) { return n ? rnd() % n : 0; }

int checked = 0;

// Parse `path` and verify every record's arena slices are in bounds.
void check_parse(const char* path, bool expect_ok) {
  void* h = at_parse(path, -1);
  if (expect_ok && at_parse_error(h) != 0) {
    std::fprintf(stderr, "FAIL: open error on %s\n", path);
    std::exit(1);
  }
  if (at_parse_error(h) == 0) {
    int64_t nrec = at_num_records(h);
    int64_t asz = at_arena_size(h);
    const uint8_t* arena = at_arena(h);
    const int64_t* meta = at_records_meta(h);
    volatile uint8_t sink = 0;
    for (int64_t r = 0; r < nrec; ++r) {
      const int64_t* m = meta + r * 8;
      // fields: name_off,len, comment_off,len, seq_off,len, qual_off,len
      for (int f = 0; f < 4; ++f) {
        int64_t off = m[2 * f], len = m[2 * f + 1];
        if (off < 0) continue;  // absent comment/qual
        if (len < 0 || off + len > asz) {
          std::fprintf(stderr, "FAIL: record %lld field %d out of arena "
                       "(off=%lld len=%lld arena=%lld) in %s\n",
                       (long long)r, f, (long long)off, (long long)len,
                       (long long)asz, path);
          std::exit(1);
        }
        for (int64_t k = 0; k < len; ++k) sink ^= arena[off + k];  // touch all
      }
    }
    (void)sink;
  }
  at_free(h);
  ++checked;
}

std::string tmpfile_with(const std::string& dir, int idx,
                         const std::vector<uint8_t>& bytes) {
  std::string path = dir + "/fz" + std::to_string(idx);
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) { std::perror("fopen"); std::exit(1); }
  if (!bytes.empty()) std::fwrite(bytes.data(), 1, bytes.size(), f);
  std::fclose(f);
  return path;
}

void fuzz_parser(const std::string& dir) {
  int idx = 0;
  // 1) raw + FASTA-shaped binary noise
  for (int i = 0; i < 120; ++i) {
    std::vector<uint8_t> blob(rnd_below(600));
    for (auto& b : blob) b = static_cast<uint8_t>(rnd());
    if (i % 3 == 1) {  // FASTA-looking
      if (blob.empty()) blob.push_back('>');
      blob[0] = '>';
      for (auto& b : blob) if (b == 0) b = 'A';
    } else if (i % 3 == 2) {  // FASTQ-looking with stray '+'
      std::vector<uint8_t> shaped;
      shaped.push_back('@');
      for (uint8_t b : blob) shaped.push_back(b == '\0' ? '\n' : b);
      shaped.push_back('\n');
      shaped.push_back('+');
      shaped.push_back('\n');
      for (uint64_t k = rnd_below(64); k--;)
        shaped.push_back(static_cast<uint8_t>('!' + rnd_below(90)));
      blob = std::move(shaped);
    }
    check_parse(tmpfile_with(dir, idx++, blob).c_str(), true);
  }
  // 2) structured edge cases
  const char* cases[] = {
      "", ">", ">\n", ">x", ">x\r\n", ">x\nACGT", ">a b c\nAC\r\nGT\n\n",
      "@q\nACGT\n+\nII", "@q\nACGT\n+comment\nIIII\n@r\nGG\n+\nII\n",
      ">a\n+\nACGT\n>b\nGG\n", "@q\nAC\nGT\n+\nI\nI\nII\n>next\nTT\n",
      "\n\n\n>late\nAC\n", "@only_header", ">a\n>b\n>c\n",
  };
  for (const char* c : cases) {
    std::vector<uint8_t> v(c, c + std::strlen(c));
    check_parse(tmpfile_with(dir, idx++, v).c_str(), true);
  }
  // giant single-line header + giant sequence line (>64k reader buffer)
  {
    std::vector<uint8_t> v;
    v.push_back('>');
    for (int k = 0; k < 200000; ++k) v.push_back('h');
    v.push_back(' ');
    for (int k = 0; k < 150000; ++k) v.push_back('c');
    v.push_back('\n');
    for (int k = 0; k < 300000; ++k) v.push_back("ACGT"[rnd_below(4)]);
    check_parse(tmpfile_with(dir, idx++, v).c_str(), true);
  }
  // 3) gzip: valid, truncated at many offsets, corrupted, fake magic
  {
    std::string gzpath = dir + "/valid.fa.gz";
    gzFile g = gzopen(gzpath.c_str(), "wb");
    std::string payload = ">r1 some comment\n";
    for (int k = 0; k < 5000; ++k) payload += "ACGTACGTAA";
    payload += "\n@r2\nAACCGGTT\n+\nIIIIIIII\n";
    gzwrite(g, payload.data(), static_cast<unsigned>(payload.size()));
    gzclose(g);
    check_parse(gzpath.c_str(), true);
    // read the compressed bytes back
    FILE* f = std::fopen(gzpath.c_str(), "rb");
    std::vector<uint8_t> gz;
    int c;
    while ((c = std::fgetc(f)) != EOF) gz.push_back(static_cast<uint8_t>(c));
    std::fclose(f);
    for (size_t cut = 0; cut <= gz.size(); cut += 1 + rnd_below(7)) {
      std::vector<uint8_t> t(gz.begin(), gz.begin() + cut);
      check_parse(tmpfile_with(dir, idx++, t).c_str(), true);
    }
    // corrupt one byte at random positions
    for (int k = 0; k < 40; ++k) {
      std::vector<uint8_t> t = gz;
      t[rnd_below(t.size())] ^= static_cast<uint8_t>(1 + rnd_below(255));
      check_parse(tmpfile_with(dir, idx++, t).c_str(), true);
    }
    // fake: gz magic then noise
    std::vector<uint8_t> fake = {0x1f, 0x8b};
    for (int k = 0; k < 400; ++k) fake.push_back(static_cast<uint8_t>(rnd()));
    check_parse(tmpfile_with(dir, idx++, fake).c_str(), true);
  }
  check_parse("/nonexistent/sanitize/zzz.fa", false);
}

void fuzz_traceback() {
  for (int iter = 0; iter < 4000; ++iter) {
    int64_t m = 1 + static_cast<int64_t>(rnd_below(24));
    int64_t n = 1 + static_cast<int64_t>(rnd_below(24));
    int64_t stride = n + 1 + static_cast<int64_t>(rnd_below(4));
    std::vector<uint8_t> ptrs(static_cast<size_t>(m) * stride);
    for (auto& b : ptrs) b = static_cast<uint8_t>(rnd());
    // bias some matrices toward valid-looking codes so walks go deep
    if (iter % 2) for (auto& b : ptrs) b &= 0x3F, b = (b & ~0x7) | (b % 5);
    std::vector<uint8_t> q(m), t(n);
    for (auto& b : q) b = "ACGT"[rnd_below(4)];
    for (auto& b : t) b = "ACGT"[rnd_below(4)];
    std::vector<uint8_t> o1(m + n + 16), o2(m + n + 16);
    int64_t i = rnd_below(m + 1), j = rnd_below(n + 1);
    int start = static_cast<int>(rnd_below(4));  // LOW/MID/UPP/JUMP
    for (int stop : {0, 1, 2}) {
      int64_t len = at_traceback_affine(ptrs.data(), stride, q.data(), m,
                                        t.data(), n, start, i, j, stop,
                                        o1.data(), o2.data());
      if (len > static_cast<int64_t>(o1.size())) {
        std::fprintf(stderr, "FAIL: affine emitted past buffer (%lld)\n",
                     (long long)len);
        std::exit(1);
      }
    }
    int64_t len = at_traceback_overlap(ptrs.data(), stride, q.data(), m,
                                       t.data(), n, i, j, o1.data(),
                                       o2.data());
    if (len > static_cast<int64_t>(o1.size())) {
      std::fprintf(stderr, "FAIL: overlap emitted past buffer (%lld)\n",
                   (long long)len);
      std::exit(1);
    }
    ++checked;
  }
}

}  // namespace

int main(int argc, char** argv) {
  // argv[1] = scratch dir (required); argv[2..] = fixture files to parse.
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <scratch-dir> [fixture.fa ...]\n", argv[0]);
    return 2;
  }
  for (int a = 2; a < argc; ++a) check_parse(argv[a], true);
  fuzz_parser(argv[1]);
  fuzz_traceback();
  std::printf("SANITIZE CHECK PASSED (%d cases)\n", checked);
  return 0;
}
