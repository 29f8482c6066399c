// PHOC (Pyramidal Histogram Of Characters) text descriptor, C++17.
//
// Fresh implementation of the published 604-d PHOC layout used by the
// reference's cphoc extension (reference: pythia/utils/phoc/src/cphoc.c,
// descriptor from Almazan et al., "Word Spotting and Recognition with
// Embedded Attributes", TPAMI 2014):
//   - pyramid levels 2..5 over 36 unigrams [a-z0-9]  -> 14*36 = 504 dims
//   - pyramid level 2 over 50 common English bigrams ->  2*50 = 100 dims
// A region bit is set when the fraction of the character span covered by the
// region is >= 0.5.
//
// Differences from the reference extension (by design):
//   - batch API `build_phoc_batch(list[str]) -> bytes` (float32, N*604),
//     avoiding a Python call per token (the hot loop feeds 960 OCR slots
//     per sample, reference: pythia/datasets/processors.py:913-928)
//   - input normalisation (lowercase + [a-z0-9] filter) happens here, not in
//     a Python wrapper (reference: pythia/utils/phoc/build_phoc.py:9-14)
//   - O(1) table lookup for unigrams/bigrams instead of linear scans

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <array>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int kPhocDim = 604;
constexpr int kNumUnigrams = 36;
constexpr int kNumBigrams = 50;
constexpr int kBigramOffset = 504;  // 14 regions * 36 unigrams

// level -> starting region index in the concatenated level-2..5 pyramid
constexpr int kLevelRegionStart[6] = {0, 0, 0, 2, 5, 9};

const char* kBigrams[kNumBigrams] = {
    "th", "he", "in", "er", "an", "re", "es", "on", "st", "nt",
    "en", "at", "ed", "nd", "to", "or", "ea", "ti", "ar", "te",
    "ng", "al", "it", "as", "is", "ha", "et", "se", "ou", "of",
    "le", "sa", "ve", "ro", "ra", "ri", "hi", "ne", "me", "de",
    "co", "ta", "ec", "si", "ll", "so", "na", "li", "la", "el"};

// Maps an ASCII byte to unigram index (a..z -> 0..25, 0..9 -> 26..35) or -1.
struct UnigramTable {
  std::array<int8_t, 256> idx;
  constexpr UnigramTable() : idx{} {
    for (int i = 0; i < 256; ++i) idx[i] = -1;
    for (int c = 'a'; c <= 'z'; ++c) idx[c] = static_cast<int8_t>(c - 'a');
    for (int c = 'A'; c <= 'Z'; ++c) idx[c] = static_cast<int8_t>(c - 'A');
    for (int c = '0'; c <= '9'; ++c) idx[c] = static_cast<int8_t>(26 + c - '0');
  }
};
constexpr UnigramTable kUnigramTable;

// bigram pair -> index, dense 36x36 table built once at import
struct BigramTable {
  std::array<int8_t, kNumUnigrams * kNumUnigrams> idx;
  BigramTable() {
    idx.fill(-1);
    for (int b = 0; b < kNumBigrams; ++b) {
      int u0 = kUnigramTable.idx[static_cast<uint8_t>(kBigrams[b][0])];
      int u1 = kUnigramTable.idx[static_cast<uint8_t>(kBigrams[b][1])];
      idx[u0 * kNumUnigrams + u1] = static_cast<int8_t>(b);
    }
  }
};
const BigramTable kBigramTable;

// Normalise: keep only [a-z0-9] (lowercased), as unigram indices.
inline void normalise(const char* word, Py_ssize_t len, std::vector<int8_t>* out) {
  out->clear();
  for (Py_ssize_t i = 0; i < len; ++i) {
    int8_t u = kUnigramTable.idx[static_cast<uint8_t>(word[i])];
    if (u >= 0) out->push_back(u);
  }
}

// Occupancy rule: region covers >= half of the item's span.
inline bool occupies(float s0, float s1, int region, int level) {
  const float r0 = static_cast<float>(region) / level;
  const float r1 = static_cast<float>(region + 1) / level;
  const float lo = s0 > r0 ? s0 : r0;
  const float hi = s1 < r1 ? s1 : r1;
  return (hi - lo) / (s1 - s0) >= 0.5f;
}

void phoc_fill(const std::vector<int8_t>& u, float* out /* 604 floats */) {
  std::memset(out, 0, kPhocDim * sizeof(float));
  const int n = static_cast<int>(u.size());
  if (n == 0) return;

  for (int i = 0; i < n; ++i) {
    const float c0 = static_cast<float>(i) / n;
    const float c1 = static_cast<float>(i + 1) / n;
    for (int level = 2; level <= 5; ++level) {
      for (int region = 0; region < level; ++region) {
        if (occupies(c0, c1, region, level)) {
          const int reg_idx = kLevelRegionStart[level] + region;
          out[reg_idx * kNumUnigrams + u[i]] = 1.0f;
        }
      }
    }
  }

  for (int i = 0; i + 1 < n; ++i) {
    const int8_t b = kBigramTable.idx[u[i] * kNumUnigrams + u[i + 1]];
    if (b < 0) continue;
    const float s0 = static_cast<float>(i) / n;
    const float s1 = static_cast<float>(i + 2) / n;
    for (int region = 0; region < 2; ++region) {
      if (occupies(s0, s1, region, 2)) {
        out[kBigramOffset + region * kNumBigrams + b] = 1.0f;
      }
    }
  }
}

PyObject* py_build_phoc(PyObject*, PyObject* args) {
  const char* word = nullptr;
  Py_ssize_t len = 0;
  if (!PyArg_ParseTuple(args, "s#", &word, &len)) return nullptr;

  std::vector<int8_t> u;
  normalise(word, len, &u);
  float feat[kPhocDim];
  phoc_fill(u, feat);

  PyObject* list = PyList_New(kPhocDim);
  if (!list) return nullptr;
  for (int i = 0; i < kPhocDim; ++i) {
    PyList_SET_ITEM(list, i, PyFloat_FromDouble(feat[i]));
  }
  return list;
}

PyObject* py_build_phoc_batch(PyObject*, PyObject* args) {
  PyObject* seq = nullptr;
  if (!PyArg_ParseTuple(args, "O", &seq)) return nullptr;
  PyObject* fast = PySequence_Fast(seq, "build_phoc_batch expects a sequence of str");
  if (!fast) return nullptr;

  const Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  PyObject* out = PyBytes_FromStringAndSize(
      nullptr, n * kPhocDim * static_cast<Py_ssize_t>(sizeof(float)));
  if (!out) {
    Py_DECREF(fast);
    return nullptr;
  }
  float* buf = reinterpret_cast<float*>(PyBytes_AS_STRING(out));

  // Extract UTF-8 pointers under the GIL (the `fast` reference keeps the
  // strings alive), then release it for the compute loop so DataLoader
  // worker threads overlap PHOC across samples.
  std::vector<std::pair<const char*, Py_ssize_t>> words(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(fast, i);
    Py_ssize_t len = 0;
    const char* word = PyUnicode_AsUTF8AndSize(item, &len);
    if (!word) {
      Py_DECREF(fast);
      Py_DECREF(out);
      return nullptr;
    }
    words[i] = {word, len};
  }
  Py_BEGIN_ALLOW_THREADS
  std::vector<int8_t> u;
  for (Py_ssize_t i = 0; i < n; ++i) {
    normalise(words[i].first, words[i].second, &u);
    phoc_fill(u, buf + i * kPhocDim);
  }
  Py_END_ALLOW_THREADS
  Py_DECREF(fast);
  return out;
}

PyMethodDef kMethods[] = {
    {"build_phoc", py_build_phoc, METH_VARARGS,
     "build_phoc(word) -> list[float] of length 604"},
    {"build_phoc_batch", py_build_phoc_batch, METH_VARARGS,
     "build_phoc_batch(words) -> bytes of N*604 little-endian float32"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_cphoc",
    "Batched PHOC descriptor (604-d) for OCR tokens", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr};

}  // namespace

PyMODINIT_FUNC PyInit__cphoc(void) { return PyModule_Create(&kModule); }
