// Native threaded JPEG decode pool for the input pipeline.
//
// The reference feeds PIL-per-item decoding through torch DataLoader worker
// PROCESSES (reference: lib/utils/data/dataloader.py spawns workers;
// dataset2.py decodes with PIL).  This library is the TPU-host-native
// equivalent: libjpeg decode with an in-process std::thread pool so a clip's
// frames (and a prefetch batch) decode concurrently without process
// overhead.  Decoded output is bit-identical to PIL's (both use libjpeg
// with the default ISLOW IDCT), so augmentation/refrng parity is preserved.
//
// Build: g++ -O3 -shared -fPIC jpegpool.cpp -o libjpegpool.so -ljpeg -lpthread

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrMgr {
    jpeg_error_mgr pub;
    jmp_buf jump;
};

void on_error(j_common_ptr cinfo) {
    ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
    longjmp(err->jump, 1);
}

// returns 0 on success
int decode_one(const char* path, uint8_t* out, int expect_h, int expect_w) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = on_error;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return 2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;  // grayscale/YCbCr → RGB like PIL
    jpeg_start_decompress(&cinfo);
    if ((int)cinfo.output_height != expect_h ||
        (int)cinfo.output_width != expect_w ||
        cinfo.output_components != 3) {
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return 3;
    }
    const size_t stride = (size_t)expect_w * 3;
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out + stride * cinfo.output_scanline;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
}

}  // namespace

extern "C" {

// Read image dimensions from the header only (cheap; no pixel decode).
int jpeg_dims(const char* path, int* h, int* w) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = on_error;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return 2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    *h = cinfo.image_height;
    *w = cinfo.image_width;
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
}

int jpeg_decode_rgb(const char* path, uint8_t* out, int h, int w) {
    return decode_one(path, out, h, w);
}

// Decode n files concurrently into caller-provided buffers.  Returns the
// number of failures (0 == all decoded).
int jpeg_decode_batch(const char** paths, int n, uint8_t** outs,
                      const int* hs, const int* ws, int nthreads) {
    if (nthreads < 1) nthreads = 1;
    if (nthreads > n) nthreads = n;
    std::vector<int> fails(nthreads, 0);
    std::vector<std::thread> pool;
    pool.reserve(nthreads);
    for (int t = 0; t < nthreads; ++t) {
        pool.emplace_back([&, t]() {
            for (int i = t; i < n; i += nthreads) {
                if (decode_one(paths[i], outs[i], hs[i], ws[i]) != 0)
                    fails[t]++;
            }
        });
    }
    for (auto& th : pool) th.join();
    int total = 0;
    for (int v : fails) total += v;
    return total;
}

}  // extern "C"
