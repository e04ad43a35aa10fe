// Native fast path for the hermetic hashed tokenizer.
//
// Host-side tokenization is the CPU-bound stage of the embed pipeline
// (the TPU analogue of model2vec's tokenize step, reference
// src/search/mod.rs:69). When no HuggingFace artifacts are on disk the
// framework tokenizes with HashTokenizer (semtools_tpu/models/tokenizer.py)
// — word hash + character-n-gram hashes over a fixed vocabulary. This file
// is the byte-for-byte C++ equivalent for ASCII text; the Python wrapper
// routes non-ASCII lines to the Python implementation so ids are identical
// either way (unit-tested against the Python reference implementation).
//
// Word model (must match tokenizer.py exactly for ASCII):
//   - text is ASCII-lowercased;
//   - tokens are maximal runs of [A-Za-z0-9_] plus single non-word,
//     non-space characters (the regex [\w]+|[^\w\s]); whitespace follows
//     Python's \s for ASCII: \t \n \v \f \r space and \x1c-\x1f;
//   - each word emits fnv1a64(word) % vocab, then for words longer than
//     ngram_min characters, fnv1a64("#" + gram) % vocab for every
//     character n-gram of "<word>" with n in [ngram_min, ngram_max].
//
// C ABI (consumed by semtools_tpu/models/tokenizer.py via ctypes):
//   hashtok_encode_batch(buf, text_offsets, n_texts, vocab, nmin, nmax,
//                        out_ids, cap, out_offsets) -> total id count
//     `buf` holds the concatenated texts; text i is
//     buf[text_offsets[i] : text_offsets[i+1]]. Fills out_ids with up to
//     `cap` ids and out_offsets (n_texts + 1 entries) with per-text id
//     offsets. If the return value exceeds `cap` the caller retries with a
//     larger buffer; offsets are valid regardless.

#include <cstdint>
#include <cstring>
#include <string>

namespace {

constexpr uint64_t kFnvOffset = 0xCBF29CE484222325ULL;
constexpr uint64_t kFnvPrime = 0x100000001B3ULL;

inline uint64_t fnv1a_update(uint64_t h, const char* data, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    h ^= static_cast<unsigned char>(data[i]);
    h *= kFnvPrime;
  }
  return h;
}

inline bool is_word(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
         (c >= '0' && c <= '9') || c == '_' || c >= 0x80;
}

// Python's re \s membership for ASCII code points.
inline bool is_space(unsigned char c) {
  return c == ' ' || (c >= '\t' && c <= '\r') || (c >= 0x1c && c <= 0x1f);
}

inline char ascii_lower(char c) {
  return (c >= 'A' && c <= 'Z') ? static_cast<char>(c + ('a' - 'A')) : c;
}

struct Emitter {
  uint32_t* out;
  int64_t cap;
  int64_t count = 0;

  inline void emit(uint64_t h, uint64_t vocab) {
    if (count < cap) out[count] = static_cast<uint32_t>(h % vocab);
    ++count;
  }
};

// Emits ids for one word (already lowercased) per the scheme above.
void word_ids(const char* w, size_t len, uint64_t vocab, int32_t nmin,
              int32_t nmax, Emitter* em) {
  em->emit(fnv1a_update(kFnvOffset, w, len), vocab);
  if (static_cast<int64_t>(len) <= nmin) return;

  // "<word>" in a thread-local scratch; capacity persists across calls.
  thread_local std::string marked_buf;
  marked_buf.clear();
  marked_buf.reserve(len + 2);
  marked_buf.push_back('<');
  marked_buf.append(w, len);
  marked_buf.push_back('>');
  const char* marked = marked_buf.data();
  const size_t mlen = marked_buf.size();

  // fnv1a("#") prefix shared by every gram hash.
  const uint64_t hash_prefix = fnv1a_update(kFnvOffset, "#", 1);
  for (int32_t n = nmin; n <= nmax; ++n) {
    if (static_cast<size_t>(n) > mlen) break;
    for (size_t i = 0; i + n <= mlen; ++i)
      em->emit(fnv1a_update(hash_prefix, marked + i, n), vocab);
  }
}

}  // namespace

extern "C" {

int64_t hashtok_encode_batch(const char* buf, const int64_t* text_offsets,
                             int64_t n_texts, int64_t vocab_size,
                             int32_t ngram_min, int32_t ngram_max,
                             uint32_t* out_ids, int64_t cap,
                             int64_t* out_offsets) {
  if (vocab_size <= 0) return -1;
  const uint64_t vocab = static_cast<uint64_t>(vocab_size);
  Emitter em{out_ids, cap};

  std::string word;
  for (int64_t t = 0; t < n_texts; ++t) {
    out_offsets[t] = em.count;
    const char* p = buf + text_offsets[t];
    const char* end = buf + text_offsets[t + 1];
    while (p < end) {
      unsigned char c = static_cast<unsigned char>(*p);
      if (is_space(c)) {
        ++p;
      } else if (is_word(c)) {
        word.clear();
        while (p < end && is_word(static_cast<unsigned char>(*p))) {
          word.push_back(ascii_lower(*p));
          ++p;
        }
        word_ids(word.data(), word.size(), vocab, ngram_min, ngram_max, &em);
      } else {
        char single = ascii_lower(*p);
        word_ids(&single, 1, vocab, ngram_min, ngram_max, &em);
        ++p;
      }
    }
  }
  out_offsets[n_texts] = em.count;
  return em.count;
}

int hashtok_abi_version() { return 1; }

}  // extern "C"
