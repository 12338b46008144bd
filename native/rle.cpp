// Native hot loops for COCO RLE mask processing.
//
// The reference's per-frame postprocessing spent its host time in
// pycocotools' C RLE routines (SURVEY.md §3, hot loop 5). This extension
// provides the equivalents for the TPU build's host-side tail: run-length
// extraction, decode, and batched mask IoU. Exposed via the CPython C API
// (no pybind11 in the image) as module `neurips2023_soc_tpu_native`.
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// flat column-major uint8 mask -> run lengths starting with a zero-run
static PyObject* rle_encode_counts(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  const uint8_t* data = static_cast<const uint8_t*>(buf.buf);
  Py_ssize_t n = buf.len;

  std::vector<int64_t> runs;
  runs.reserve(256);
  uint8_t cur = 0;
  int64_t run = 0;
  for (Py_ssize_t i = 0; i < n; ++i) {
    uint8_t v = data[i] ? 1 : 0;
    if (v == cur) {
      ++run;
    } else {
      runs.push_back(run);
      cur = v;
      run = 1;
    }
  }
  runs.push_back(run);
  PyBuffer_Release(&buf);

  PyObject* list = PyList_New(static_cast<Py_ssize_t>(runs.size()));
  if (!list) return nullptr;
  for (size_t i = 0; i < runs.size(); ++i) {
    PyList_SET_ITEM(list, static_cast<Py_ssize_t>(i),
                    PyLong_FromLongLong(runs[i]));
  }
  return list;
}

// runs (bytes of int64 little-endian) + size -> flat column-major mask bytes
static PyObject* rle_decode_flat(PyObject*, PyObject* args) {
  Py_buffer runs_buf;
  Py_ssize_t total;
  if (!PyArg_ParseTuple(args, "y*n", &runs_buf, &total)) return nullptr;
  const int64_t* runs = static_cast<const int64_t*>(runs_buf.buf);
  size_t n_runs = static_cast<size_t>(runs_buf.len) / sizeof(int64_t);

  PyObject* out = PyBytes_FromStringAndSize(nullptr, total);
  if (!out) {
    PyBuffer_Release(&runs_buf);
    return nullptr;
  }
  uint8_t* flat = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(out));
  std::memset(flat, 0, static_cast<size_t>(total));
  int64_t pos = 0;
  uint8_t val = 0;
  for (size_t i = 0; i < n_runs && pos < total; ++i) {
    int64_t r = runs[i];
    if (r < 0) r = 0;
    if (pos + r > total) r = total - pos;
    if (val) std::memset(flat + pos, 1, static_cast<size_t>(r));
    pos += r;
    val ^= 1;
  }
  PyBuffer_Release(&runs_buf);
  return out;
}

// two flat uint8 masks of equal length -> (intersection, union) pair
static PyObject* mask_inter_union(PyObject*, PyObject* args) {
  Py_buffer a, b;
  if (!PyArg_ParseTuple(args, "y*y*", &a, &b)) return nullptr;
  Py_ssize_t n = a.len < b.len ? a.len : b.len;
  const uint8_t* pa = static_cast<const uint8_t*>(a.buf);
  const uint8_t* pb = static_cast<const uint8_t*>(b.buf);
  int64_t inter = 0, uni = 0;
  for (Py_ssize_t i = 0; i < n; ++i) {
    uint8_t va = pa[i] != 0, vb = pb[i] != 0;
    inter += va & vb;
    uni += va | vb;
  }
  PyBuffer_Release(&a);
  PyBuffer_Release(&b);
  return Py_BuildValue("(LL)", (long long)inter, (long long)uni);
}

static PyMethodDef Methods[] = {
    {"rle_encode_counts", rle_encode_counts, METH_VARARGS,
     "flat uint8 mask bytes -> list of run lengths (zero-run first)"},
    {"rle_decode_flat", rle_decode_flat, METH_VARARGS,
     "int64 runs bytes + total -> flat uint8 mask bytes"},
    {"mask_inter_union", mask_inter_union, METH_VARARGS,
     "two flat uint8 masks -> (intersection, union)"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "neurips2023_soc_tpu_native",
    "native RLE/mask hot loops", -1, Methods};

}  // namespace

PyMODINIT_FUNC PyInit_neurips2023_soc_tpu_native(void) {
  return PyModule_Create(&moduledef);
}
