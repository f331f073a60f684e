/* Native host-side runtime kernels for frame_interpolation_tpu.
 *
 * The TPU compute path is JAX/XLA/Pallas; this extension covers the
 * host-side data plane, where the reference leaned on TensorFlow's C++
 * kernels (TFRecordReader/Writer, crc32c) via tf.data
 * (google-research/frame-interpolation training/data_lib.py). Exposed:
 *
 *   crc32c(bytes) -> int        slicing-by-8 Castagnoli CRC (GB/s-class)
 *   masked_crc32c(bytes) -> int TFRecord-masked CRC
 *   scan_tfrecord(bytes, validate) -> list[(offset, length)]
 *       Frame boundaries of every record in an in-memory TFRecord file,
 *       so Python slices payloads without per-byte work.
 *
 * Built with setuptools (see native/build.py); pure-Python fallbacks in
 * data/tfrecord.py keep everything working when the extension is absent.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

static uint32_t crc_table[8][256];
static int table_ready = 0;

static void init_tables(void) {
  const uint32_t poly = 0x82F63B78u;
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t crc = i;
    for (int k = 0; k < 8; k++) crc = (crc >> 1) ^ (poly & (~(crc & 1) + 1));
    crc_table[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t crc = crc_table[0][i];
    for (int t = 1; t < 8; t++) {
      crc = (crc >> 8) ^ crc_table[0][crc & 0xFF];
      crc_table[t][i] = crc;
    }
  }
  table_ready = 1;
}

static uint32_t crc32c_raw(const uint8_t *buf, Py_ssize_t len) {
  uint32_t crc = 0xFFFFFFFFu;
  if (!table_ready) init_tables();
  /* Slicing-by-8 over the aligned bulk. */
  while (len >= 8) {
    uint64_t word;
    memcpy(&word, buf, 8);
    word ^= (uint64_t)crc;
    crc = crc_table[7][word & 0xFF] ^ crc_table[6][(word >> 8) & 0xFF] ^
          crc_table[5][(word >> 16) & 0xFF] ^
          crc_table[4][(word >> 24) & 0xFF] ^
          crc_table[3][(word >> 32) & 0xFF] ^
          crc_table[2][(word >> 40) & 0xFF] ^
          crc_table[1][(word >> 48) & 0xFF] ^
          crc_table[0][(word >> 56) & 0xFF];
    buf += 8;
    len -= 8;
  }
  while (len--) crc = (crc >> 8) ^ crc_table[0][(crc ^ *buf++) & 0xFF];
  return crc ^ 0xFFFFFFFFu;
}

static uint32_t masked(uint32_t crc) {
  return (uint32_t)(((crc >> 15) | (crc << 17)) + 0xA282EAD8u);
}

static PyObject *py_crc32c(PyObject *self, PyObject *args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return NULL;
  uint32_t crc;
  Py_BEGIN_ALLOW_THREADS
  crc = crc32c_raw((const uint8_t *)view.buf, view.len);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  return PyLong_FromUnsignedLong(crc);
}

static PyObject *py_masked_crc32c(PyObject *self, PyObject *args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return NULL;
  uint32_t crc;
  Py_BEGIN_ALLOW_THREADS
  crc = masked(crc32c_raw((const uint8_t *)view.buf, view.len));
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  return PyLong_FromUnsignedLong(crc);
}

static PyObject *py_scan_tfrecord(PyObject *self, PyObject *args) {
  Py_buffer view;
  int validate = 1;
  if (!PyArg_ParseTuple(args, "y*|p", &view, &validate)) return NULL;
  const uint8_t *buf = (const uint8_t *)view.buf;
  Py_ssize_t size = view.len;
  PyObject *result = PyList_New(0);
  if (!result) {
    PyBuffer_Release(&view);
    return NULL;
  }
  Py_ssize_t pos = 0;
  while (pos < size) {
    if (pos + 12 > size) goto corrupt;
    uint64_t length;
    uint32_t len_crc, data_crc;
    memcpy(&length, buf + pos, 8);
    memcpy(&len_crc, buf + pos + 8, 4);
    if (validate && masked(crc32c_raw(buf + pos, 8)) != len_crc) goto corrupt;
    if (pos + 12 + (Py_ssize_t)length + 4 > size) goto corrupt;
    memcpy(&data_crc, buf + pos + 12 + length, 4);
    if (validate &&
        masked(crc32c_raw(buf + pos + 12, (Py_ssize_t)length)) != data_crc)
      goto corrupt;
    PyObject *tup = Py_BuildValue("(nn)", (Py_ssize_t)(pos + 12),
                                  (Py_ssize_t)length);
    if (!tup || PyList_Append(result, tup) < 0) {
      Py_XDECREF(tup);
      Py_DECREF(result);
      PyBuffer_Release(&view);
      return NULL;
    }
    Py_DECREF(tup);
    pos += 12 + length + 4;
  }
  PyBuffer_Release(&view);
  return result;
corrupt:
  Py_DECREF(result);
  PyBuffer_Release(&view);
  PyErr_SetString(PyExc_IOError, "corrupted or truncated TFRecord data");
  return NULL;
}

static PyMethodDef methods[] = {
    {"crc32c", py_crc32c, METH_VARARGS, "CRC32C (Castagnoli) of bytes."},
    {"masked_crc32c", py_masked_crc32c, METH_VARARGS,
     "TFRecord-masked CRC32C of bytes."},
    {"scan_tfrecord", py_scan_tfrecord, METH_VARARGS,
     "Scan TFRecord bytes -> list of (payload_offset, payload_length)."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef module = {PyModuleDef_HEAD_INIT, "_fi_native",
                                    "Native host-side kernels.", -1, methods};

PyMODINIT_FUNC PyInit__fi_native(void) {
  init_tables();
  return PyModule_Create(&module);
}
