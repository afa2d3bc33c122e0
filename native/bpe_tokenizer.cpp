// CLIP byte-pair-encoding merge loop, native implementation.
//
// The reference relies on the OpenAI `clip` package's Python tokenizer
// (clip.tokenize at /root/reference/models/pretrained_clip.py:44,173); the
// BPE merge loop is the host-side hot path when batch-tokenizing prompts for
// text-conditioned sampling/serving. This library implements it in C++,
// exposed through a C ABI consumed via ctypes
// (pcdiff/tokenizer/bpe.py); a pure-Python fallback keeps behavior identical
// when the library is not built.
//
// Build: make -C native   (produces libbpe_tokenizer.so)

#include <cstring>
#include <string>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    std::hash<std::string> h;
    return h(p.first) * 1000003u ^ h(p.second);
  }
};

struct BpeState {
  std::unordered_map<std::pair<std::string, std::string>, int, PairHash> ranks;
  std::unordered_map<std::string, std::string> cache;
};

// Split a UTF-8 string into code points.
std::vector<std::string> utf8_chars(const std::string& s) {
  std::vector<std::string> out;
  for (size_t i = 0; i < s.size();) {
    unsigned char c = s[i];
    size_t len = (c < 0x80) ? 1 : (c < 0xE0) ? 2 : (c < 0xF0) ? 3 : 4;
    if (i + len > s.size()) len = 1;  // tolerate malformed input
    out.emplace_back(s.substr(i, len));
    i += len;
  }
  return out;
}

std::string apply_bpe(BpeState* st, const std::string& token) {
  auto cached = st->cache.find(token);
  if (cached != st->cache.end()) return cached->second;

  // initial word: each code point, with "</w>" appended to the last
  std::vector<std::string> word = utf8_chars(token);
  if (word.empty()) return token + "</w>";
  word.back() += "</w>";

  while (word.size() > 1) {
    // find the lowest-rank adjacent pair
    int best_rank = -1;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < word.size(); ++i) {
      auto it = st->ranks.find({word[i], word[i + 1]});
      if (it != st->ranks.end() &&
          (best_rank < 0 || it->second < best_rank)) {
        best_rank = it->second;
        best_i = i;
      }
    }
    if (best_rank < 0) break;

    // merge every occurrence of that pair (left to right)
    const std::string first = word[best_i];
    const std::string second = word[best_i + 1];
    std::vector<std::string> merged;
    merged.reserve(word.size());
    for (size_t i = 0; i < word.size();) {
      if (i + 1 < word.size() && word[i] == first && word[i + 1] == second) {
        merged.emplace_back(first + second);
        i += 2;
      } else {
        merged.emplace_back(word[i]);
        i += 1;
      }
    }
    word.swap(merged);
  }

  std::string joined;
  for (size_t i = 0; i < word.size(); ++i) {
    if (i) joined += ' ';
    joined += word[i];
  }
  st->cache.emplace(token, joined);
  return joined;
}

}  // namespace

extern "C" {

// merges_text: newline-separated "<first> <second>" merge rules in rank order.
void* bpe_create(const char* merges_text) {
  auto* st = new BpeState();
  const char* p = merges_text;
  int rank = 0;
  while (*p) {
    const char* nl = strchr(p, '\n');
    size_t len = nl ? static_cast<size_t>(nl - p) : strlen(p);
    std::string line(p, len);
    size_t sp = line.find(' ');
    if (sp != std::string::npos && sp > 0 && sp + 1 < line.size()) {
      st->ranks.emplace(
          std::make_pair(line.substr(0, sp), line.substr(sp + 1)), rank++);
    }
    if (!nl) break;
    p = nl + 1;
  }
  return st;
}

void bpe_free(void* handle) { delete static_cast<BpeState*>(handle); }

// Returns the number of bytes written (excluding NUL), or -1 if out_cap is
// too small. Output: space-joined merged symbols.
int bpe_apply(void* handle, const char* token_utf8, char* out, int out_cap) {
  auto* st = static_cast<BpeState*>(handle);
  std::string result = apply_bpe(st, token_utf8);
  if (static_cast<int>(result.size()) + 1 > out_cap) return -1;
  memcpy(out, result.data(), result.size());
  out[result.size()] = '\0';
  return static_cast<int>(result.size());
}

}  // extern "C"
