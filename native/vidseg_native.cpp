// vidseg_native — native IO runtime for vidseg_diffusion_tpu.
//
// The reference's frame/mask IO rides PIL/cv2 on the Python thread
// (svd_single_video_inference.py:174-190, 222-245; feature_extraction.py
// :79-110): every PNG encode/decode holds the GIL and serializes against
// pipeline orchestration. This module provides libpng codecs that RELEASE
// the GIL for the entire encode/decode, so a ThreadPoolExecutor gets true
// parallel frame IO that overlaps with TPU dispatch.
//
// CPython C API only (no pybind11 in the image). Data crosses the boundary
// as bytes + explicit shape — numpy conversion happens on the Python side
// via np.frombuffer (zero-copy read).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <png.h>

#include <csetjmp>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct MemReader {
  const unsigned char* data;
  size_t size;
  size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + n > r->size) {
    png_error(png, "read past end of PNG buffer");
  }
  std::memcpy(out, r->data + r->pos, n);
  r->pos += n;
}

void png_mem_write(png_structp png, png_bytep data, png_size_t n) {
  std::string* out = static_cast<std::string*>(png_get_io_ptr(png));
  out->append(reinterpret_cast<char*>(data), n);
}

void png_mem_flush(png_structp) {}

// Decodes a PNG byte buffer into 8-bit RGB/RGBA/gray pixels.
// Returns true on success; fills out/width/height/channels.
bool decode_png_impl(const unsigned char* buf, size_t len, std::string* out,
                     unsigned* width, unsigned* height, unsigned* channels,
                     std::string* err) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) {
    *err = "not a PNG";
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    *err = "png_create_read_struct failed";
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    *err = "png_create_info_struct failed";
    return false;
  }
  // locals with destructors are constructed BEFORE setjmp: a longjmp over
  // an in-scope construction is UB and leaks the vector's heap buffer on
  // every corrupt image
  MemReader reader{buf, len, 0};
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    *err = "libpng decode error";
    return false;
  }
  png_set_read_fn(png, &reader, png_mem_read);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);

  // normalize to 8-bit; expand palettes and low-bit grays
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_strip_16(png);
  png_read_update_info(png, info);

  const unsigned ch = png_get_channels(png, info);
  const size_t stride = png_get_rowbytes(png, info);
  out->resize(stride * h);
  rows.resize(h);
  for (png_uint_32 y = 0; y < h; ++y) {
    rows[y] = reinterpret_cast<png_bytep>(&(*out)[y * stride]);
  }
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  *width = w;
  *height = h;
  *channels = ch;
  return true;
}

bool encode_png_impl(const unsigned char* pixels, unsigned width,
                     unsigned height, unsigned channels, int compress_level,
                     std::string* out, std::string* err) {
  int color_type;
  switch (channels) {
    case 1: color_type = PNG_COLOR_TYPE_GRAY; break;
    case 3: color_type = PNG_COLOR_TYPE_RGB; break;
    case 4: color_type = PNG_COLOR_TYPE_RGBA; break;
    default: *err = "channels must be 1, 3 or 4"; return false;
  }
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    *err = "png_create_write_struct failed";
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    *err = "png_create_info_struct failed";
    return false;
  }
  std::vector<png_bytep> rows;  // constructed before setjmp (see decode)
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    *err = "libpng encode error";
    return false;
  }
  png_set_write_fn(png, out, png_mem_write, png_mem_flush);
  png_set_compression_level(png, compress_level);
  png_set_IHDR(png, info, width, height, 8, color_type, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  const size_t stride = static_cast<size_t>(width) * channels;
  rows.resize(height);
  for (unsigned y = 0; y < height; ++y) {
    rows[y] = const_cast<png_bytep>(pixels + y * stride);
  }
  png_write_image(png, rows.data());
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);
  return true;
}

PyObject* py_decode_png(PyObject*, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;

  std::string out, err;
  unsigned w = 0, h = 0, ch = 0;
  bool ok;
  Py_BEGIN_ALLOW_THREADS
  ok = decode_png_impl(static_cast<const unsigned char*>(view.buf), view.len,
                       &out, &w, &h, &ch, &err);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  PyObject* bytes = PyBytes_FromStringAndSize(out.data(), out.size());
  if (!bytes) return nullptr;
  return Py_BuildValue("(IIIN)", h, w, ch, bytes);
}

PyObject* py_encode_png(PyObject*, PyObject* args) {
  Py_buffer view;
  unsigned w, h, ch;
  int level = 6;
  if (!PyArg_ParseTuple(args, "y*III|i", &view, &h, &w, &ch, &level))
    return nullptr;
  if (static_cast<size_t>(view.len) != static_cast<size_t>(w) * h * ch) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "pixel buffer size != h*w*c");
    return nullptr;
  }
  std::string out, err;
  bool ok;
  Py_BEGIN_ALLOW_THREADS
  ok = encode_png_impl(static_cast<const unsigned char*>(view.buf), w, h, ch,
                       level, &out, &err);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return PyBytes_FromStringAndSize(out.data(), out.size());
}

PyObject* py_read_png_file(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  std::string data, out, err;
  unsigned w = 0, h = 0, ch = 0;
  bool ok = false;
  Py_BEGIN_ALLOW_THREADS
  FILE* f = std::fopen(path, "rb");
  if (f) {
    long n = -1;
    if (std::fseek(f, 0, SEEK_END) == 0) n = std::ftell(f);
    // ftell can return -1 (FIFOs/unseekable); resize((size_t)-1) would
    // throw inside ALLOW_THREADS with no catch -> std::terminate. Bound
    // the size (1 GiB) so oversized files raise IOError, not bad_alloc.
    if (n < 0 || n > (1L << 30) || std::fseek(f, 0, SEEK_SET) != 0) {
      err = "not a regular readable file";
      std::fclose(f);
    } else {
    data.resize(static_cast<size_t>(n));
    ok = std::fread(&data[0], 1, n, f) == static_cast<size_t>(n);
    std::fclose(f);
    if (ok) {
      ok = decode_png_impl(
          reinterpret_cast<const unsigned char*>(data.data()), data.size(),
          &out, &w, &h, &ch, &err);
    } else {
      err = "short read";
    }
    }
  } else {
    err = "cannot open file";
  }
  Py_END_ALLOW_THREADS
  if (!ok) {
    PyErr_Format(PyExc_IOError, "%s: %s", path, err.c_str());
    return nullptr;
  }
  PyObject* bytes = PyBytes_FromStringAndSize(out.data(), out.size());
  if (!bytes) return nullptr;
  return Py_BuildValue("(IIIN)", h, w, ch, bytes);
}

PyObject* py_write_png_file(PyObject*, PyObject* args) {
  const char* path;
  Py_buffer view;
  unsigned w, h, ch;
  int level = 6;
  if (!PyArg_ParseTuple(args, "sy*III|i", &path, &view, &h, &w, &ch, &level))
    return nullptr;
  if (static_cast<size_t>(view.len) != static_cast<size_t>(w) * h * ch) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "pixel buffer size != h*w*c");
    return nullptr;
  }
  std::string out, err;
  bool ok;
  Py_BEGIN_ALLOW_THREADS
  ok = encode_png_impl(static_cast<const unsigned char*>(view.buf), w, h, ch,
                       level, &out, &err);
  if (ok) {
    FILE* f = std::fopen(path, "wb");
    if (f) {
      ok = std::fwrite(out.data(), 1, out.size(), f) == out.size();
      std::fclose(f);
      if (!ok) err = "short write";
    } else {
      ok = false;
      err = "cannot open file for write";
    }
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  if (!ok) {
    PyErr_Format(PyExc_IOError, "%s: %s", path, err.c_str());
    return nullptr;
  }
  Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"decode_png", py_decode_png, METH_VARARGS,
     "decode_png(data: bytes) -> (h, w, c, pixels: bytes). GIL released."},
    {"encode_png", py_encode_png, METH_VARARGS,
     "encode_png(pixels: bytes, h, w, c, level=6) -> bytes. GIL released."},
    {"read_png_file", py_read_png_file, METH_VARARGS,
     "read_png_file(path) -> (h, w, c, pixels: bytes). GIL released."},
    {"write_png_file", py_write_png_file, METH_VARARGS,
     "write_png_file(path, pixels, h, w, c, level=6). GIL released."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "vidseg_native",
    "Native (C++/libpng) frame IO with GIL-released hot paths.", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_vidseg_native(void) { return PyModule_Create(&module); }
