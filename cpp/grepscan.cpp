// Native line-matching scanner backing the ask agent's grep tool.
//
// The reference backs its grep tool with the ripgrep engine crates
// (reference src/ask/tools.rs:434-553). This is the C++ equivalent for the
// TPU build: mmap'd file read, line iteration identical to Rust's
// str::lines() ('\n' splits, trailing '\r' stripped, no final empty line),
// and per-line pattern search. Literal patterns (including re.escape()'d
// ones coming from the Python side) take a Boyer-Moore-Horspool fast path;
// everything else goes through std::regex (ECMAScript, search semantics —
// the same "match anywhere in the line" contract as Python's re.search).
//
// Exposed C ABI (consumed by semtools_tpu/utils/grepscan.py via ctypes):
//   grepscan_match_lines(path, pattern, ignore_case, out, cap) -> n_matches
//     fills `out` with up to `cap` 0-based matching line indices; returns
//     the total match count (caller retries with a bigger buffer if
//     n > cap), or a negative error code (-1 open failed, -2 bad regex).

#include <cctype>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <regex>
#include <string>
#include <vector>

namespace {

// Reads a whole file; returns false if it cannot be opened.
bool read_file(const char* path, std::string* out) {
  std::ifstream in(path, std::ios::binary);
  if (!in) return false;
  in.seekg(0, std::ios::end);
  std::streampos size = in.tellg();
  if (size < 0) return false;
  out->resize(static_cast<size_t>(size));
  in.seekg(0);
  if (size > 0) in.read(&(*out)[0], size);
  return static_cast<bool>(in) || size == 0;
}

// If `pattern` is a literal — optionally with backslash-escapes of
// non-alphanumeric characters, as produced by Python's re.escape() —
// unescape it into `lit` and return true. Any unescaped regex
// metacharacter or an escape of an alphanumeric (a character class like
// \d, \w, \s) forces the regex path.
bool as_literal(const std::string& pattern, std::string* lit) {
  static const char kMeta[] = ".^$*+?()[]{}|\\";
  lit->clear();
  lit->reserve(pattern.size());
  for (size_t i = 0; i < pattern.size(); ++i) {
    char c = pattern[i];
    if (c == '\\') {
      if (i + 1 >= pattern.size()) return false;
      char next = pattern[++i];
      // \d, \w, \S, \1 ... are classes/backrefs, not escaped literals.
      if (std::isalnum(static_cast<unsigned char>(next))) return false;
      lit->push_back(next);
    } else if (std::strchr(kMeta, c) != nullptr) {
      return false;
    } else {
      lit->push_back(c);
    }
  }
  return true;
}

void ascii_lower(std::string* s) {
  for (char& c : *s)
    c = static_cast<char>(std::tolower(static_cast<unsigned char>(c)));
}

// Boyer-Moore-Horspool over one line. Empty needle matches everything
// (same as an empty regex).
struct LiteralSearcher {
  std::string needle;
  size_t skip[256];

  explicit LiteralSearcher(std::string n) : needle(std::move(n)) {
    const size_t m = needle.size();
    for (size_t i = 0; i < 256; ++i) skip[i] = m;
    for (size_t i = 0; m > 0 && i + 1 < m; ++i)
      skip[static_cast<unsigned char>(needle[i])] = m - 1 - i;
  }

  bool contains(const char* hay, size_t n) const {
    const size_t m = needle.size();
    if (m == 0) return true;
    if (n < m) return false;
    size_t pos = 0;
    while (pos <= n - m) {
      size_t j = m;
      while (j > 0 && hay[pos + j - 1] == needle[j - 1]) --j;
      if (j == 0) return true;
      pos += skip[static_cast<unsigned char>(hay[pos + m - 1])];
    }
    return false;
  }
};

// Calls `fn(line_ptr, line_len, line_index)` for every line of `text`,
// with str::lines() semantics.
template <typename Fn>
void for_each_line(const std::string& text, Fn fn) {
  if (text.empty()) return;
  size_t start = 0;
  int64_t index = 0;
  const size_t n = text.size();
  while (start <= n) {
    size_t nl = text.find('\n', start);
    size_t end = (nl == std::string::npos) ? n : nl;
    if (nl == std::string::npos && start == n) break;  // trailing '\n': no empty last line
    size_t len = end - start;
    if (len > 0 && text[end - 1] == '\r') --len;
    fn(text.data() + start, len, index);
    ++index;
    if (nl == std::string::npos) break;
    start = nl + 1;
  }
}

}  // namespace

extern "C" {

int64_t grepscan_match_lines(const char* path, const char* pattern,
                             int ignore_case, int64_t* out, int64_t cap) {
  std::string text;
  if (!read_file(path, &text)) return -1;

  std::string pat(pattern);
  int64_t count = 0;
  auto emit = [&](int64_t line_index) {
    if (count < cap) out[count] = line_index;
    ++count;
  };

  std::string lit;
  if (as_literal(pat, &lit)) {
    if (ignore_case) ascii_lower(&lit);
    LiteralSearcher searcher(lit);
    std::string lowered;
    for_each_line(text, [&](const char* p, size_t len, int64_t idx) {
      if (ignore_case) {
        lowered.assign(p, len);
        ascii_lower(&lowered);
        if (searcher.contains(lowered.data(), lowered.size())) emit(idx);
      } else {
        if (searcher.contains(p, len)) emit(idx);
      }
    });
    return count;
  }

  auto flags = std::regex::ECMAScript | std::regex::optimize;
  if (ignore_case) flags |= std::regex::icase;
  std::regex re;
  try {
    re = std::regex(pat, flags);
  } catch (const std::regex_error&) {
    return -2;
  }
  for_each_line(text, [&](const char* p, size_t len, int64_t idx) {
    if (std::regex_search(p, p + len, re)) emit(idx);
  });
  return count;
}

int grepscan_abi_version() { return 1; }

}  // extern "C"
