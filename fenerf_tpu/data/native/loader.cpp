// Native data-loader: threaded JPEG/PNG decode + the dataset's preprocessing
// geometry (short-side-320 resize -> center-crop 256 -> resize to img_size),
// fused in C++ so the host input pipeline keeps up with the TPU.
//
// This is the native-runtime counterpart of the reference's torch DataLoader
// workers (datasets.py get_dataset_distributed); the compute path stays in
// XLA/Pallas, the IO path is C++. Exposed as a plain C ABI for ctypes
// (fenerf_tpu/data/native_loader.py builds and binds it; PIL remains the
// fallback when the toolchain is absent).
//
// Build: g++ -O3 -shared -fPIC loader.cpp -o libfenerf_loader.so -ljpeg -lpng

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <cmath>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // row-major, interleaved
};

// ----------------------------------------------------------------------
// decoders
// ----------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jump, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  int channels = png_get_channels(png, info);
  out->w = int(w);
  out->h = int(h);
  out->c = channels;
  out->data.resize(size_t(w) * h * channels);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + size_t(y) * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[4] = {0};
  fread(magic, 1, 4, f);
  rewind(f);
  bool ok = false;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (magic[0] == 0x89 && magic[1] == 'P') {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// ----------------------------------------------------------------------
// resizes (PIL-compatible center-based sampling)
// ----------------------------------------------------------------------

Image resize_nearest(const Image& src, int ow, int oh) {
  Image dst{ow, oh, src.c, {}};
  dst.data.resize(size_t(ow) * oh * src.c);
  const double sx = double(src.w) / ow, sy = double(src.h) / oh;
  for (int y = 0; y < oh; ++y) {
    int syi = std::min(int((y + 0.5) * sy), src.h - 1);
    for (int x = 0; x < ow; ++x) {
      int sxi = std::min(int((x + 0.5) * sx), src.w - 1);
      memcpy(&dst.data[(size_t(y) * ow + x) * src.c],
             &src.data[(size_t(syi) * src.w + sxi) * src.c], src.c);
    }
  }
  return dst;
}

// triangle-filter resample with support scaling (PIL BILINEAR semantics:
// filter support widens when downscaling, so it antialiases like PIL)
Image resize_bilinear(const Image& src, int ow, int oh) {
  auto resample_axis = [](const std::vector<float>& in, int iw, int ih, int c,
                          int ow_) {
    // horizontal pass: (ih, iw, c) -> (ih, ow_, c)
    std::vector<float> out(size_t(ih) * ow_ * c, 0.f);
    const double scale = double(iw) / ow_;
    const double support = std::max(1.0, scale);
    for (int x = 0; x < ow_; ++x) {
      const double center = (x + 0.5) * scale;
      int lo = std::max(0, int(center - support));
      int hi = std::min(iw, int(center + support + 1));
      std::vector<float> wts(hi - lo);
      float tot = 0.f;
      for (int i = lo; i < hi; ++i) {
        float wgt = 1.f - float(std::fabs((i + 0.5 - center) / support));
        wts[i - lo] = wgt > 0 ? wgt : 0.f;
        tot += wts[i - lo];
      }
      for (auto& wv : wts) wv /= tot;
      for (int y = 0; y < ih; ++y)
        for (int ch = 0; ch < c; ++ch) {
          float acc = 0.f;
          for (int i = lo; i < hi; ++i)
            acc += wts[i - lo] * in[(size_t(y) * iw + i) * c + ch];
          out[(size_t(y) * ow_ + x) * c + ch] = acc;
        }
    }
    return out;
  };

  const int c = src.c;
  std::vector<float> f(src.data.begin(), src.data.end());
  // horizontal, then transpose-free vertical via axis swap trick
  std::vector<float> hpass = resample_axis(f, src.w, src.h, c, ow);
  // vertical: treat columns by transposing logical roles
  std::vector<float> tr(size_t(ow) * src.h * c);
  for (int y = 0; y < src.h; ++y)
    for (int x = 0; x < ow; ++x)
      for (int ch = 0; ch < c; ++ch)
        tr[(size_t(x) * src.h + y) * c + ch] =
            hpass[(size_t(y) * ow + x) * c + ch];
  std::vector<float> vpass = resample_axis(tr, src.h, ow, c, oh);
  Image dst{ow, oh, c, {}};
  dst.data.resize(size_t(ow) * oh * c);
  for (int x = 0; x < ow; ++x)
    for (int y = 0; y < oh; ++y)
      for (int ch = 0; ch < c; ++ch) {
        float v = vpass[(size_t(x) * oh + y) * c + ch];
        dst.data[(size_t(y) * ow + x) * c + ch] =
            uint8_t(std::min(255.f, std::max(0.f, std::round(v))));
      }
  return dst;
}

Image center_crop(const Image& src, int size) {
  const int left = (src.w - size) / 2, top = (src.h - size) / 2;
  Image dst{size, size, src.c, {}};
  dst.data.resize(size_t(size) * size * src.c);
  for (int y = 0; y < size; ++y)
    memcpy(&dst.data[size_t(y) * size * src.c],
           &src.data[(size_t(y + top) * src.w + left) * src.c],
           size_t(size) * src.c);
  return dst;
}

// the dataset geometry: short side -> 320, center crop 256, resize out_size
int preprocess_one(const char* path, int out_size, int nearest, int gray,
                   uint8_t* out) {
  Image img;
  if (!decode_file(path, &img)) return -1;
  if (gray && img.c == 3) {
    // L conversion (ITU-R 601-2, PIL convert('L'))
    Image g{img.w, img.h, 1, {}};
    g.data.resize(size_t(img.w) * img.h);
    for (size_t i = 0; i < g.data.size(); ++i) {
      const uint8_t* p = &img.data[i * 3];
      g.data[i] = uint8_t((p[0] * 299 + p[1] * 587 + p[2] * 114 + 500) / 1000);
    }
    img = std::move(g);
  }
  const double scale = 320.0 / std::min(img.w, img.h);
  const int rw = int(std::lround(img.w * scale));
  const int rh = int(std::lround(img.h * scale));
  Image r = nearest ? resize_nearest(img, rw, rh) : resize_bilinear(img, rw, rh);
  Image cc = center_crop(r, 256);
  Image o = nearest ? resize_nearest(cc, out_size, out_size)
                    : resize_bilinear(cc, out_size, out_size);
  memcpy(out, o.data.data(), o.data.size());
  return o.c;
}

// full dataset item: decode img + mask, zero background at native image
// resolution (reference CelebAMaskHQ_wo_background_seg_18.__getitem__,
// datasets.py:526-536), then run both through the crop geometry
int preprocess_pair(const char* img_path, const char* mask_path, int out_size,
                    int background_mask, uint8_t* img_out, uint8_t* mask_out) {
  Image img, mask;
  if (!decode_file(img_path, &img)) return -1;
  if (!decode_file(mask_path, &mask)) return -1;
  if (mask.c != 1) {  // convert to L
    Image g{mask.w, mask.h, 1, {}};
    g.data.resize(size_t(mask.w) * mask.h);
    for (size_t i = 0; i < g.data.size(); ++i) {
      const uint8_t* p = &mask.data[i * mask.c];
      g.data[i] = mask.c >= 3
          ? uint8_t((p[0] * 299 + p[1] * 587 + p[2] * 114 + 500) / 1000)
          : p[0];
    }
    mask = std::move(g);
  }
  if (background_mask) {
    Image m = (mask.w == img.w && mask.h == img.h)
                  ? mask
                  : resize_nearest(mask, img.w, img.h);
    for (int y = 0; y < img.h; ++y)
      for (int x = 0; x < img.w; ++x)
        if (m.data[size_t(y) * img.w + x] == 0)
          memset(&img.data[(size_t(y) * img.w + x) * img.c], 0, img.c);
  }
  auto geometry = [&](const Image& src, bool nearest, uint8_t* dst) {
    const double scale = 320.0 / std::min(src.w, src.h);
    const int rw = int(std::lround(src.w * scale));
    const int rh = int(std::lround(src.h * scale));
    Image r = nearest ? resize_nearest(src, rw, rh)
                      : resize_bilinear(src, rw, rh);
    Image cc = center_crop(r, 256);
    Image o = nearest ? resize_nearest(cc, out_size, out_size)
                      : resize_bilinear(cc, out_size, out_size);
    memcpy(dst, o.data.data(), o.data.size());
  };
  geometry(img, false, img_out);
  geometry(mask, true, mask_out);
  return 0;
}

}  // namespace

extern "C" {

// paired dataset item (img RGB + mask L), background zeroing at native res;
// img_out: out_size*out_size*3, mask_out: out_size*out_size; 0 on success
int fenerf_preprocess_pair(const char* img_path, const char* mask_path,
                           int out_size, int background_mask,
                           uint8_t* img_out, uint8_t* mask_out) {
  return preprocess_pair(img_path, mask_path, out_size, background_mask,
                         img_out, mask_out);
}

// threaded batch of pairs; paths: 2n NUL-terminated strings (img, mask)*n
int fenerf_preprocess_pair_batch(const char* paths, int n, int out_size,
                                 int background_mask, int n_threads,
                                 uint8_t* img_out, uint8_t* mask_out) {
  std::vector<const char*> ptrs(2 * n);
  const char* p = paths;
  for (int i = 0; i < 2 * n; ++i) {
    ptrs[i] = p;
    p += strlen(p) + 1;
  }
  const size_t istride = size_t(out_size) * out_size * 3;
  const size_t mstride = size_t(out_size) * out_size;
  std::vector<int> status(n, 0);
  n_threads = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&, t]() {
      for (int i = t; i < n; i += n_threads)
        status[i] = preprocess_pair(ptrs[2 * i], ptrs[2 * i + 1], out_size,
                                    background_mask, img_out + istride * i,
                                    mask_out + mstride * i);
    });
  }
  for (auto& th : workers) th.join();
  for (int i = 0; i < n; ++i)
    if (status[i] < 0) return -1 - i;
  return 0;
}

// decode+preprocess one file; out must hold out_size*out_size*(gray?1:3)
// returns channel count or -1 on failure
int fenerf_preprocess(const char* path, int out_size, int nearest, int gray,
                      uint8_t* out) {
  return preprocess_one(path, out_size, nearest, gray, out);
}

// threaded batch: paths is n concatenated NUL-terminated strings
// out laid out (n, out_size, out_size, C); returns 0 on success
int fenerf_preprocess_batch(const char* paths, int n, int out_size,
                            int nearest, int gray, int n_threads,
                            uint8_t* out) {
  std::vector<const char*> ptrs(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    ptrs[i] = p;
    p += strlen(p) + 1;
  }
  const int c = gray ? 1 : 3;
  const size_t stride = size_t(out_size) * out_size * c;
  std::vector<int> status(n, 0);
  n_threads = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&, t]() {
      for (int i = t; i < n; i += n_threads)
        status[i] = preprocess_one(ptrs[i], out_size, nearest, gray,
                                   out + stride * i);
    });
  }
  for (auto& th : workers) th.join();
  for (int i = 0; i < n; ++i)
    if (status[i] < 0) return -1 - i;
  return 0;
}

}  // extern "C"
