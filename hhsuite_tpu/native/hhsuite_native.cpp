/* Native runtime kernels for hhsuite_tpu (CPython extension).
 *
 * TPU-native equivalent of the reference's C storage layer: the
 * ffindex index parser (lib/ffindex/src/ffindex.c:ffindex_index_parse)
 * and the ca3m record decoder (src/a3m_compress.cpp:245-354) are the
 * host-side hot loops when streaming large template databases; both
 * are reimplemented here and loaded by io/ffindex.py and io/ca3m.py
 * when built (python -m hhsuite_tpu.native.build), with pure-Python
 * fallbacks otherwise.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

/* parse_index(data: bytes) -> list[(name, offset, length)]
 * Text lines "name\toffset\tlength\n". */
static PyObject *parse_index(PyObject *, PyObject *args) {
  const char *buf;
  Py_ssize_t n;
  if (!PyArg_ParseTuple(args, "y#", &buf, &n)) return nullptr;
  PyObject *out = PyList_New(0);
  if (!out) return nullptr;
  const char *p = buf;
  const char *end = buf + n;
  while (p < end) {
    const char *nl = static_cast<const char *>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    const char *line_end = nl ? nl : end;
    const char *t1 = static_cast<const char *>(
        memchr(p, '\t', static_cast<size_t>(line_end - p)));
    if (t1) {
      const char *t2 = static_cast<const char *>(
          memchr(t1 + 1, '\t', static_cast<size_t>(line_end - t1 - 1)));
      if (t2) {
        long long off = strtoll(t1 + 1, nullptr, 10);
        long long len = strtoll(t2 + 1, nullptr, 10);
        PyObject *tup = Py_BuildValue(
            "(s#LL)", p, static_cast<Py_ssize_t>(t1 - p), off, len);
        if (!tup || PyList_Append(out, tup) < 0) {
          Py_XDECREF(tup);
          Py_DECREF(out);
          return nullptr;
        }
        Py_DECREF(tup);
      }
    }
    if (!nl) break;
    p = nl + 1;
  }
  return out;
}

/* iter_ca3m_records(data: bytes, offset: int)
 *   -> list[(entry_index, start_pos, blocks_bytes)] */
static PyObject *iter_ca3m_records(PyObject *, PyObject *args) {
  const unsigned char *buf;
  Py_ssize_t n;
  Py_ssize_t pos;
  if (!PyArg_ParseTuple(args, "y#n", &buf, &n, &pos)) return nullptr;
  PyObject *out = PyList_New(0);
  if (!out) return nullptr;
  while (pos + 8 <= n) {
    uint32_t entry_index;
    uint16_t start_pos, nr_blocks;
    memcpy(&entry_index, buf + pos, 4);
    memcpy(&start_pos, buf + pos + 4, 2);
    memcpy(&nr_blocks, buf + pos + 6, 2);
    pos += 8;
    Py_ssize_t blk_bytes = static_cast<Py_ssize_t>(nr_blocks) * 2;
    if (pos + blk_bytes > n) break;
    PyObject *tup = Py_BuildValue(
        "(IHy#)", entry_index, start_pos,
        reinterpret_cast<const char *>(buf + pos), blk_bytes);
    pos += blk_bytes;
    if (!tup || PyList_Append(out, tup) < 0) {
      Py_XDECREF(tup);
      Py_DECREF(out);
      return nullptr;
    }
    Py_DECREF(tup);
  }
  return out;
}

/* expand_ca3m_record(start_pos, blocks: bytes, full_seq: bytes,
 *                    consensus_length) -> bytes (a3m row) */
static PyObject *expand_ca3m_record(PyObject *, PyObject *args) {
  Py_ssize_t start_pos, cons_len;
  const unsigned char *blocks;
  Py_ssize_t nblk_bytes;
  const unsigned char *full;
  Py_ssize_t full_len;
  if (!PyArg_ParseTuple(args, "ny#y#n", &start_pos, &blocks, &nblk_bytes,
                        &full, &full_len, &cons_len))
    return nullptr;
  std::string out;
  out.reserve(static_cast<size_t>(cons_len) + 64);
  Py_ssize_t actual = start_pos;
  Py_ssize_t aln_len = 0;
  for (Py_ssize_t b = 0; b + 1 < nblk_bytes; b += 2) {
    unsigned int nr_matches = blocks[b];
    int ins_del = static_cast<int8_t>(blocks[b + 1]);
    for (unsigned int i = 0; i < nr_matches; i++) {
      if (actual - 1 < 0 || actual - 1 >= full_len) {
        PyErr_SetString(PyExc_ValueError,
                        "ca3m record points outside full sequence");
        return nullptr;
      }
      out.push_back(static_cast<char>(full[actual - 1]));
      actual++;
      aln_len++;
    }
    if (ins_del > 0) {
      for (int i = 0; i < ins_del; i++) {
        if (actual - 1 < 0 || actual - 1 >= full_len) {
          PyErr_SetString(PyExc_ValueError,
                          "ca3m record points outside full sequence");
          return nullptr;
        }
        out.push_back(static_cast<char>(
            tolower(full[actual - 1])));
        actual++;
      }
    } else {
      for (int i = 0; i < -ins_del; i++) {
        out.push_back('-');
        aln_len++;
      }
    }
  }
  while (aln_len < cons_len) {
    out.push_back('-');
    aln_len++;
  }
  return PyBytes_FromStringAndSize(out.data(),
                                   static_cast<Py_ssize_t>(out.size()));
}

static PyMethodDef Methods[] = {
    {"parse_index", parse_index, METH_VARARGS,
     "parse .ffindex text -> list[(name, offset, length)]"},
    {"iter_ca3m_records", iter_ca3m_records, METH_VARARGS,
     "decode ca3m member records -> list[(entry, start, blocks)]"},
    {"expand_ca3m_record", expand_ca3m_record, METH_VARARGS,
     "expand one ca3m member record -> a3m row bytes"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_hhsuite_native",
    "native runtime kernels (ffindex + ca3m)", -1, Methods};

PyMODINIT_FUNC PyInit__hhsuite_native(void) {
  return PyModule_Create(&moduledef);
}
