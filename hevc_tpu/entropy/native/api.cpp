// C ABI for the hevc_tpu native entropy layer (loaded via ctypes).
#include <cstring>

#include "syntax.h"

using namespace hevctpu;

namespace hevctpu {
FILE* g_bin_trace = nullptr;
long g_bin_counter = 0;
}

extern "C" {

void hevc_set_trace(const char* path) {
  if (hevctpu::g_bin_trace) fclose(hevctpu::g_bin_trace);
  hevctpu::g_bin_trace = path ? fopen(path, "w") : nullptr;
  hevctpu::g_bin_counter = 0;
}

void hevc_trace_note(const char* s) {
  if (hevctpu::g_bin_trace) fprintf(hevctpu::g_bin_trace, "# %s\n", s);
}


// ---- slice-data encoder ----------------------------------------------------
void* hevc_enc_create(const SliceParams* sp) { return new SliceEncoder(*sp); }
void hevc_enc_destroy(void* h) { delete (SliceEncoder*)h; }
void hevc_enc_begin_slice(void* h) { ((SliceEncoder*)h)->begin_slice(); }

void hevc_enc_ctu(void* h, int ctu_x, int ctu_y,
                  const uint8_t* cu_depth, const uint8_t* nxn_flag,
                  const uint8_t* luma_mode, const uint8_t* chroma_mode,
                  const uint8_t* tu_depth, const int16_t* coeff_y,
                  const int16_t* coeff_cb, const int16_t* coeff_cr,
                  int end_of_slice) {
  CtuData d{cu_depth, nxn_flag, luma_mode, chroma_mode, tu_depth,
            coeff_y, coeff_cb, coeff_cr};
  ((SliceEncoder*)h)->encode_ctu(ctu_x, ctu_y, d, end_of_slice);
}

// Returns the finished slice-data RBSP (with rbsp trailing bits) length;
// copies into `out` if non-null.
long hevc_enc_get(void* h, uint8_t* out, long cap) {
  const std::vector<uint8_t>& b = ((SliceEncoder*)h)->finish_rbsp();
  if (out && (long)b.size() <= cap) std::memcpy(out, b.data(), b.size());
  return (long)b.size();
}

// ---- slice-data decoder ----------------------------------------------------
void* hevc_dec_create(const SliceParams* sp, const uint8_t* data, long size) {
  return new SliceDecoder(*sp, data, (size_t)size);
}
void hevc_dec_destroy(void* h) { delete (SliceDecoder*)h; }

int hevc_dec_ctu(void* h, int ctu_x, int ctu_y, uint8_t* cu_depth,
                 uint8_t* nxn_flag, uint8_t* luma_mode, uint8_t* chroma_mode,
                 uint8_t* tu_depth, int16_t* coeff_y, int16_t* coeff_cb,
                 int16_t* coeff_cr) {
  MutCtuData d{cu_depth, nxn_flag, luma_mode, chroma_mode, tu_depth,
               coeff_y, coeff_cb, coeff_cr};
  return ((SliceDecoder*)h)->decode_ctu(ctu_x, ctu_y, d);
}

}  // extern "C"
