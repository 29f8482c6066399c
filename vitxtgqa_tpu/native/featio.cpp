// Native threaded .npy feature reader.
//
// TPU-native runtime component replacing the reference's per-frame
// np.load loop inside torch DataLoader workers (reference:
// pythia/datasets/videoqa/vtextgqa/dataset.py:268-282 — 64 sequential
// np.load calls per sample — and feature_readers.py:103-142, whose
// "fast read" relies on torch's native worker pool).  Here the batch of
// files is parsed and copied by a std::thread pool with the GIL released;
// Python receives one zero-padded float32 block to wrap with
// numpy.frombuffer (no numpy C-API dependency, so the extension builds
// with only the CPython headers).
//
// Supported payloads: little-endian '<f4' / '<f8' / '<f2' C-order arrays
// (v1/v2/v3 npy headers).  Anything else (object arrays, fortran order)
// must take the Python fallback path.
//
// API (module _featio):
//   read_padded_batch(paths: list[str], max_rows: int, dim: int)
//       -> (bytearray, counts: list[int])
//     Each file holds [N, D'] (or [D']); rows are cast to f32 and copied
//     into out[i, :min(N, max_rows), :min(D', dim)]; missing/unsupported
//     files leave zeros and count -1 so the caller can fall back.
//   read_rows(paths: list[str], dim: int) -> (bytearray, ok: list[int])
//     First row of each file into out[i, :dim] (the per-frame ViT case).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyArray {
  int word_size = 0;      // bytes per element
  char kind = 0;          // 'f'
  std::vector<size_t> shape;
  size_t data_offset = 0;
  bool ok = false;
};

// Parse just enough of the npy header. Returns info with ok=false on any
// unsupported layout.
NpyArray parse_header(FILE* f) {
  NpyArray info;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return info;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return info;
  int major = magic[6];
  size_t header_len = 0;
  size_t pre = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return info;
    header_len = b[0] | (b[1] << 8);
    pre = 10;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return info;
    header_len = (size_t)b[0] | ((size_t)b[1] << 8) | ((size_t)b[2] << 16) |
                 ((size_t)b[3] << 24);
    pre = 12;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return info;

  if (header.find("'fortran_order': True") != std::string::npos) return info;

  size_t dpos = header.find("'descr':");
  if (dpos == std::string::npos) return info;
  size_t q1 = header.find('\'', dpos + 8);
  size_t q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (descr.size() < 3 || (descr[0] != '<' && descr[0] != '|')) return info;
  if (descr[1] != 'f') return info;  // floats only
  info.kind = 'f';
  info.word_size = descr[2] - '0';
  if (info.word_size != 2 && info.word_size != 4 && info.word_size != 8)
    return info;

  size_t spos = header.find("'shape':");
  if (spos == std::string::npos) return info;
  size_t p1 = header.find('(', spos);
  size_t p2 = header.find(')', p1);
  std::string dims = header.substr(p1 + 1, p2 - p1 - 1);
  size_t start = 0;
  while (start < dims.size()) {
    size_t comma = dims.find(',', start);
    std::string tok = dims.substr(
        start, comma == std::string::npos ? std::string::npos : comma - start);
    size_t val = 0;
    bool any = false;
    for (char c : tok) {
      if (c >= '0' && c <= '9') {
        val = val * 10 + (c - '0');
        any = true;
      }
    }
    if (any) info.shape.push_back(val);
    if (comma == std::string::npos) break;
    start = comma + 1;
  }
  info.data_offset = pre + header_len;
  info.ok = true;
  return info;
}

inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t mant = h & 0x3ff;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while (!(mant & 0x400)) {
        mant <<= 1;
        exp--;
      }
      mant &= 0x3ff;
      bits = sign | (exp << 23) | (mant << 13);
    }
  } else if (exp == 0x1f) {
    bits = sign | 0x7f800000 | (mant << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  memcpy(&out, &bits, 4);
  return out;
}

// Copy up to max_rows x dim f32 values from the file into dst (row-major
// [max_rows, dim], already zeroed). Returns rows copied, or -1 on failure.
long read_into(const std::string& path, float* dst, size_t max_rows,
               size_t dim) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return -1;
  NpyArray info = parse_header(f);
  if (!info.ok || info.shape.empty()) {
    fclose(f);
    return -1;
  }
  size_t rows, cols;
  if (info.shape.size() == 1) {
    rows = 1;
    cols = info.shape[0];
  } else {
    rows = info.shape[0];
    cols = info.shape[1];
    for (size_t i = 2; i < info.shape.size(); ++i) cols *= info.shape[i];
  }
  size_t use_rows = rows < max_rows ? rows : max_rows;
  size_t use_cols = cols < dim ? cols : dim;

  fseek(f, (long)info.data_offset, SEEK_SET);
  std::vector<unsigned char> rowbuf(cols * info.word_size);
  for (size_t r = 0; r < use_rows; ++r) {
    if (fread(rowbuf.data(), 1, rowbuf.size(), f) != rowbuf.size()) {
      fclose(f);
      return -1;
    }
    float* out = dst + r * dim;
    if (info.word_size == 4) {
      memcpy(out, rowbuf.data(), use_cols * 4);
    } else if (info.word_size == 8) {
      const double* src = (const double*)rowbuf.data();
      for (size_t c = 0; c < use_cols; ++c) out[c] = (float)src[c];
    } else {  // f2
      const uint16_t* src = (const uint16_t*)rowbuf.data();
      for (size_t c = 0; c < use_cols; ++c) out[c] = half_to_float(src[c]);
    }
  }
  fclose(f);
  return (long)use_rows;
}

// Shared worker loop.
void run_pool(const std::vector<std::string>& paths, float* base,
              size_t max_rows, size_t dim, std::vector<long>& counts) {
  std::atomic<size_t> next(0);
  size_t n = paths.size();
  unsigned n_threads = std::thread::hardware_concurrency();
  if (n_threads == 0) n_threads = 4;
  if (n_threads > 16) n_threads = 16;
  if ((size_t)n_threads > n) n_threads = (unsigned)(n ? n : 1);

  auto worker = [&]() {
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= n) break;
      counts[i] = read_into(paths[i], base + i * max_rows * dim, max_rows, dim);
    }
  };
  std::vector<std::thread> threads;
  for (unsigned t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

PyObject* read_padded_batch(PyObject*, PyObject* args) {
  PyObject* path_list;
  Py_ssize_t max_rows, dim;
  if (!PyArg_ParseTuple(args, "O!nn", &PyList_Type, &path_list, &max_rows,
                        &dim))
    return nullptr;
  Py_ssize_t n = PyList_Size(path_list);
  std::vector<std::string> paths;
  paths.reserve(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PyList_GetItem(path_list, i);
    const char* s = PyUnicode_AsUTF8(item);
    if (!s) return nullptr;
    paths.emplace_back(s);
  }

  Py_ssize_t total = n * max_rows * dim * (Py_ssize_t)sizeof(float);
  PyObject* buf = PyByteArray_FromStringAndSize(nullptr, total);
  if (!buf) return nullptr;
  float* base = (float*)PyByteArray_AsString(buf);
  memset(base, 0, (size_t)total);

  std::vector<long> counts((size_t)n, -1);
  Py_BEGIN_ALLOW_THREADS
  run_pool(paths, base, (size_t)max_rows, (size_t)dim, counts);
  Py_END_ALLOW_THREADS

  PyObject* count_list = PyList_New(n);
  for (Py_ssize_t i = 0; i < n; ++i)
    PyList_SET_ITEM(count_list, i, PyLong_FromLong(counts[(size_t)i]));
  PyObject* result = PyTuple_Pack(2, buf, count_list);
  Py_DECREF(buf);
  Py_DECREF(count_list);
  return result;
}

PyObject* read_rows(PyObject* self, PyObject* args) {
  PyObject* path_list;
  Py_ssize_t dim;
  if (!PyArg_ParseTuple(args, "O!n", &PyList_Type, &path_list, &dim))
    return nullptr;
  PyObject* new_args = Py_BuildValue("(Onn)", path_list, (Py_ssize_t)1, dim);
  PyObject* out = read_padded_batch(self, new_args);
  Py_DECREF(new_args);
  return out;
}

PyMethodDef methods[] = {
    {"read_padded_batch", read_padded_batch, METH_VARARGS,
     "(paths, max_rows, dim) -> (f32 bytearray [n,max_rows,dim], counts)"},
    {"read_rows", read_rows, METH_VARARGS,
     "(paths, dim) -> (f32 bytearray [n,1,dim], ok flags)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_featio",
                      "threaded npy feature reader", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__featio() { return PyModule_Create(&module); }
