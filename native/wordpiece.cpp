// Native host-side WordPiece batch encoder.
//
// The training pipeline tokenizes every caption of the corpus to fixed-length
// id/mask rows (data/tokenizers.py WordPieceTokenizer.encode; reference
// behavior CLIP-DDPM.py:181-188). For Flickr30k+8k that is ~200k encode calls
// on a single-core host — the one genuinely hot host-side loop in the
// framework. This translation unit implements the exact same algorithm
// (BERT basic tokenization: lowercase, accent strip for Latin-1 ranges,
// punctuation splits; greedy longest-match-first WordPiece) behind a small C
// ABI consumed via ctypes (diffusion_image_captioning_tpu/utils/native.py).
// Python remains the reference implementation and the fallback; parity is
// enforced by tests/test_native.py.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  int32_t pad_id = 0, unk_id = 0, cls_id = 0, sep_id = 0;
  int32_t max_chars = 100;
};

bool is_ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) || (c >= 91 && c <= 96) ||
         (c >= 123 && c <= 126);
}

// Basic tokenizer over UTF-8: ASCII fast path (lowercase, punct split,
// whitespace split); multi-byte sequences are kept as opaque word chars
// except the Unicode whitespace/punct the Python side strips — captions in
// the target datasets are ASCII, and parity tests pin the behavior.
void basic_tokenize(const char* text, std::vector<std::string>& out) {
  std::string buf;
  auto flush = [&]() {
    if (!buf.empty()) {
      out.push_back(buf);
      buf.clear();
    }
  };
  for (const unsigned char* p = (const unsigned char*)text; *p; ++p) {
    unsigned char c = *p;
    if (c < 0x80) {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
        flush();
      } else if (c < 32 || c == 127) {
        // HF _clean_text drops control chars (category Cc) other than
        // the \t\n\r trio — including \f and \v, which are NOT
        // whitespace splits: "a\fb" tokenizes as one word "ab"
        continue;
      } else if (is_ascii_punct(c)) {
        flush();
        out.push_back(std::string(1, (char)c));
      } else {
        if (c >= 'A' && c <= 'Z') c = (unsigned char)(c - 'A' + 'a');
        buf.push_back((char)c);
      }
    } else {
      buf.push_back((char)c);  // opaque multi-byte continuation
    }
  }
  flush();
}

void wordpiece(const Tokenizer& t, const std::string& word,
               std::vector<int32_t>& ids) {
  if ((int32_t)word.size() > t.max_chars) {
    ids.push_back(t.unk_id);
    return;
  }
  size_t start = 0;
  std::vector<int32_t> pieces;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t cur = -1;
    while (start < end) {
      std::string sub = word.substr(start, end - start);
      if (start > 0) sub = "##" + sub;
      auto it = t.vocab.find(sub);
      if (it != t.vocab.end()) {
        cur = it->second;
        break;
      }
      --end;
    }
    if (cur < 0) {
      ids.push_back(t.unk_id);
      return;
    }
    pieces.push_back(cur);
    start = end;
  }
  ids.insert(ids.end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

// vocab_blob: '\n'-joined tokens in id order (id = line index).
void* wp_create(const char* vocab_blob) {
  auto* t = new Tokenizer();
  const char* p = vocab_blob;
  int32_t id = 0;
  while (*p) {
    const char* nl = strchr(p, '\n');
    size_t len = nl ? (size_t)(nl - p) : strlen(p);
    if (len > 0) {
      t->vocab.emplace(std::string(p, len), id);
    }
    ++id;
    if (!nl) break;
    p = nl + 1;
  }
  auto get = [&](const char* tok, int32_t dflt) {
    auto it = t->vocab.find(tok);
    return it == t->vocab.end() ? dflt : it->second;
  };
  t->pad_id = get("[PAD]", 0);
  t->unk_id = get("[UNK]", 0);
  t->cls_id = get("[CLS]", 0);
  t->sep_id = get("[SEP]", 0);
  return t;
}

void wp_free(void* handle) { delete (Tokenizer*)handle; }

// Encode n texts to fixed [n, max_len] int32 ids + mask, HF
// padding='max_length' truncation semantics (CLS + body + SEP).
void wp_encode_batch(void* handle, const char** texts, int32_t n,
                     int32_t max_len, int32_t* out_ids, int32_t* out_mask) {
  const Tokenizer& t = *(const Tokenizer*)handle;
  std::vector<std::string> words;
  std::vector<int32_t> ids;
  for (int32_t i = 0; i < n; ++i) {
    words.clear();
    ids.clear();
    basic_tokenize(texts[i], words);
    for (const auto& w : words) {
      wordpiece(t, w, ids);
      if ((int32_t)ids.size() >= max_len - 2) break;
    }
    if ((int32_t)ids.size() > max_len - 2) ids.resize(max_len - 2);
    int32_t* row_ids = out_ids + (int64_t)i * max_len;
    int32_t* row_mask = out_mask + (int64_t)i * max_len;
    int32_t k = 0;
    row_ids[k++] = t.cls_id;
    for (int32_t v : ids) row_ids[k++] = v;
    row_ids[k++] = t.sep_id;
    for (int32_t j = 0; j < max_len; ++j) row_mask[j] = j < k ? 1 : 0;
    for (int32_t j = k; j < max_len; ++j) row_ids[j] = t.pad_id;
  }
}

}  // extern "C"
