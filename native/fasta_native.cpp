// Native FASTA/MSA ingest for gaussdca_tpu.
//
// Host-side equivalent of gaussdca_tpu/io/fasta.py (same contract as the
// DCAUtils read_fasta_alignment consumed at
// /root/reference/src/GaussDCA.jl:20): transparent gzip via zlib (gzopen
// reads plain files too), insert-state removal (lowercase + '.'),
// letter->state tokenization (20 amino acids -> 1..20, everything else
// -> 21), inclusive gap-fraction filtering, ragged-length detection.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this toolchain);
// the Python loader lives in gaussdca_tpu/io/native.py and falls back to
// the NumPy parser when this library is unavailable.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC fasta_native.cpp -lz -o _fasta_native.so

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Msa {
  int64_t m = 0;
  int64_t n = 0;
  int32_t n_dropped = 0;
  int32_t q = 0;
  std::vector<uint8_t> tokens;        // m*n row-major
  std::vector<std::string> headers;   // kept sequences only
  std::string error;                  // non-empty => parse failed
};

constexpr uint8_t kGapState = 21;

struct Luts {
  uint8_t state[256];
  bool insert[256];
  Luts() {
    for (int i = 0; i < 256; ++i) {
      state[i] = kGapState;
      insert[i] = false;
    }
    const char* aa = "ACDEFGHIKLMNPQRSTVWY";
    for (int i = 0; aa[i]; ++i) state[(uint8_t)aa[i]] = (uint8_t)(i + 1);
    for (int c = 'a'; c <= 'z'; ++c) insert[c] = true;
    insert[(uint8_t)'.'] = true;
  }
};
const Luts kLut;

bool read_all(const char* path, std::vector<char>* out, std::string* err) {
  gzFile f = gzopen(path, "rb");
  if (!f) {
    *err = std::string("cannot open file ") + path;
    return false;
  }
  (void)gzbuffer(f, 1 << 20);
  char buf[1 << 20];
  int got;
  while ((got = gzread(f, buf, sizeof buf)) > 0)
    out->insert(out->end(), buf, buf + got);
  bool ok = got == 0;
  if (!ok) {
    int zerr = 0;
    const char* msg = gzerror(f, &zerr);
    *err = std::string("error reading ") + path + ": " +
           (msg ? msg : "gzread failed");
  }
  gzclose(f);
  return ok;
}

// One kept sequence being assembled (insert states already removed).
void finish_record(Msa* msa, std::string* header, std::vector<uint8_t>* seq,
                   double max_gap_fraction, const char* path) {
  if (!msa->error.empty()) return;
  if (msa->n == 0 && msa->m == 0 && msa->n_dropped == 0) {
    msa->n = (int64_t)seq->size();
    if (msa->n == 0) {
      msa->error = std::string("invalid FASTA file ") + path +
                   ": empty first sequence";
      return;
    }
  } else if ((int64_t)seq->size() != msa->n) {
    msa->error = std::string("invalid FASTA file ") + path +
                 ": sequences have inconsistent lengths (" +
                 std::to_string(seq->size()) + " != " +
                 std::to_string(msa->n) + ")";
    return;
  }
  int64_t ngaps = 0;
  for (uint8_t b : *seq)
    if (b == (uint8_t)'-') ++ngaps;
  if ((double)ngaps / (double)msa->n > max_gap_fraction) {
    ++msa->n_dropped;
  } else {
    size_t base = msa->tokens.size();
    msa->tokens.resize(base + seq->size());
    for (size_t i = 0; i < seq->size(); ++i) {
      uint8_t s = kLut.state[(*seq)[i]];
      msa->tokens[base + i] = s;
      if (s > msa->q) msa->q = s;
    }
    msa->headers.push_back(std::move(*header));
    ++msa->m;
  }
  seq->clear();
  header->clear();
}

Msa* parse(const char* path, double max_gap_fraction) {
  auto msa = new Msa();
  std::vector<char> data;
  if (!read_all(path, &data, &msa->error)) return msa;

  std::string header;
  std::vector<uint8_t> seq;
  bool in_record = false;
  bool any_record = false;

  const char* p = data.data();
  const char* end = p + data.size();
  while (p < end && msa->error.empty()) {
    const char* nl = (const char*)memchr(p, '\n', (size_t)(end - p));
    const char* le = nl ? nl : end;
    // strip trailing CR / whitespace, leading whitespace
    const char* b = p;
    const char* e = le;
    while (b < e && (unsigned char)b[0] <= ' ') ++b;
    while (e > b && (unsigned char)e[-1] <= ' ') --e;
    if (b < e) {
      if (*b == '>') {
        if (in_record)
          finish_record(msa, &header, &seq, max_gap_fraction, path);
        header.assign(b + 1, (size_t)(e - b - 1));
        in_record = true;
        any_record = true;
      } else if (!in_record) {
        msa->error = std::string("invalid FASTA file ") + path +
                     ": sequence data before the first header";
      } else {
        for (const char* c = b; c < e; ++c)
          if (!kLut.insert[(uint8_t)*c]) seq.push_back((uint8_t)*c);
      }
    }
    p = nl ? nl + 1 : end;
  }
  if (in_record && msa->error.empty())
    finish_record(msa, &header, &seq, max_gap_fraction, path);
  if (msa->error.empty() && !any_record)
    msa->error = std::string("invalid FASTA file ") + path +
                 ": no sequences found";
  if (msa->error.empty() && msa->m == 0)
    msa->error = std::string("invalid FASTA file ") + path +
                 ": all sequences exceed max_gap_fraction=" +
                 std::to_string(max_gap_fraction);
  return msa;
}

}  // namespace

extern "C" {

void* gdca_parse(const char* path, double max_gap_fraction) {
  return parse(path, max_gap_fraction);
}

const char* gdca_msa_error(void* h) {
  auto* msa = (Msa*)h;
  return msa->error.empty() ? nullptr : msa->error.c_str();
}

int64_t gdca_msa_m(void* h) { return ((Msa*)h)->m; }
int64_t gdca_msa_n(void* h) { return ((Msa*)h)->n; }
int32_t gdca_msa_q(void* h) { return ((Msa*)h)->q; }
int32_t gdca_msa_dropped(void* h) { return ((Msa*)h)->n_dropped; }

const uint8_t* gdca_msa_tokens(void* h) { return ((Msa*)h)->tokens.data(); }

const char* gdca_msa_header(void* h, int64_t i) {
  auto* msa = (Msa*)h;
  if (i < 0 || i >= (int64_t)msa->headers.size()) return nullptr;
  return msa->headers[(size_t)i].c_str();
}

void gdca_msa_free(void* h) { delete (Msa*)h; }

}  // extern "C"
