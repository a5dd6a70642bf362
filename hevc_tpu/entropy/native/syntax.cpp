// Implementation of the slice-data syntax codec. See syntax.h.
#include "syntax.h"

#include <algorithm>
#include <cassert>
#include <cstring>

namespace hevctpu {

// ===========================================================================
// Context initialization values (ITU-T H.265 Tables 9-5..9-32), rows indexed
// by slice type in {B=0, P=1, I=2} (initType 2/1/0 without cabac_init_flag).
// ===========================================================================
namespace {
constexpr uint8_t CNU = 154;

const uint8_t IV_SPLIT[3][3] = {{107,139,126},{107,139,126},{139,141,157}};
const uint8_t IV_TQB[3][1] = {{154},{154},{154}};
const uint8_t IV_SKIP[3][3] = {{197,185,201},{197,185,201},{CNU,CNU,CNU}};
const uint8_t IV_MERGE_F[3][1] = {{154},{110},{CNU}};
const uint8_t IV_MERGE_I[3][1] = {{137},{122},{CNU}};
const uint8_t IV_PART[3][4] = {{154,139,154,154},{154,139,154,154},{184,CNU,CNU,CNU}};
const uint8_t IV_PREDM[3][1] = {{134},{149},{CNU}};
const uint8_t IV_ILUMA[3][1] = {{183},{154},{184}};
const uint8_t IV_ICHROMA[3][2] = {{152,139},{152,139},{63,139}};
const uint8_t IV_INTERDIR[3][5] = {{95,79,63,31,31},{95,79,63,31,31},{CNU,CNU,CNU,CNU,CNU}};
const uint8_t IV_MVD[3][2] = {{169,198},{140,198},{CNU,CNU}};
const uint8_t IV_REF[3][2] = {{153,153},{153,153},{CNU,CNU}};
const uint8_t IV_DQP[3][3] = {{154,154,154},{154,154,154},{154,154,154}};
const uint8_t IV_CBF_L[3][5] = {{153,111,CNU,CNU,CNU},{153,111,CNU,CNU,CNU},{111,141,CNU,CNU,CNU}};
const uint8_t IV_CBF_C[3][5] = {{149,92,167,154,154},{149,107,167,154,154},{94,138,182,154,154}};
const uint8_t IV_ROOTCBF[3][1] = {{79},{79},{CNU}};
const uint8_t IV_LAST[3][30] = {
  {125,110,124,110, 95, 94,125,111,111, 79,125,126,111,111, 79,
   108,123, 93,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU},
  {125,110, 94,110, 95, 79,125,111,110, 78,110,111,111, 95, 94,
   108,123,108,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU},
  {110,110,124,125,140,153,125,127,140,109,111,143,127,111, 79,
   108,123, 63,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU,CNU}};
const uint8_t IV_SIGCG[3][4] = {{121,140,61,154},{121,140,61,154},{91,171,134,141}};
const uint8_t IV_SIG[3][44] = {
  {170,154,139,153,139,123,123, 63,124,166,183,140,136,153,154,166,
   183,140,136,153,154,166,183,140,136,153,154,140,
   170,153,138,138,122,121,122,121,167,151,183,140,151,183,140,140},
  {155,154,139,153,139,123,123, 63,153,166,183,140,136,153,154,166,
   183,140,136,153,154,166,183,140,136,153,154,140,
   170,153,123,123,107,121,107,121,167,151,183,140,151,183,140,140},
  {111,111,125,110,110, 94,124,108,124,107,125,141,179,153,125,107,
   125,141,179,153,125,107,125,141,179,153,125,141,
   140,139,182,182,152,136,152,136,153,136,139,111,136,139,111,111}};
const uint8_t IV_ONE[3][24] = {
  {154,196,167,167,154,152,167,182,182,134,149,136,153,121,136,122,
   169,208,166,167,154,152,167,182},
  {154,196,196,167,154,152,167,182,182,134,149,136,153,121,136,137,
   169,194,166,167,154,167,137,182},
  {140, 92,137,138,140,152,138,139,153, 74,149, 92,139,107,122,152,
   140,179,166,182,140,227,122,197}};
const uint8_t IV_ABS[3][6] = {
  {107,167, 91,107,107,167},{107,167, 91,122,107,167},
  {138,153,136,167,152,152}};
const uint8_t IV_MVP[3][1] = {{168},{168},{CNU}};
const uint8_t IV_SAOM[3][1] = {{153},{153},{153}};
const uint8_t IV_SAOT[3][1] = {{160},{185},{200}};
const uint8_t IV_TSUB[3][3] = {{224,167,122},{124,138, 94},{153,138,138}};
const uint8_t IV_TSKIP[3][2] = {{139,139},{139,139},{139,139}};

template <size_t N>
void init_arr(ContextModel (&arr)[N], const uint8_t (&iv)[3][N], int st, int qp) {
  for (size_t i = 0; i < N; ++i) arr[i].init(qp, iv[st][i]);
}

// --- scan tables -----------------------------------------------------------
// scan position -> raster offset within the TU, DC first. Index [log2-2][scan].
struct ScanTables {
  std::vector<uint16_t> t[4][3];
  ScanTables() {
    for (int lg = 2; lg <= 5; ++lg)
      for (int s = 0; s < 3; ++s) t[lg - 2][s] = build(1 << lg, s);
  }
  static std::vector<std::pair<int,int>> order(int n, int s) {
    std::vector<std::pair<int,int>> o;  // (x, y)
    if (s == 1) {  // horizontal
      for (int y = 0; y < n; ++y) for (int x = 0; x < n; ++x) o.push_back({x, y});
    } else if (s == 2) {  // vertical
      for (int x = 0; x < n; ++x) for (int y = 0; y < n; ++y) o.push_back({x, y});
    } else {  // up-right diagonal
      int x = 0, y = 0;
      while ((int)o.size() < n * n) {
        while (y >= 0) {
          if (x < n && y < n) o.push_back({x, y});
          --y; ++x;
        }
        y = x; x = 0;
      }
    }
    return o;
  }
  static std::vector<uint16_t> build(int n, int s) {
    std::vector<uint16_t> out;
    if (n == 4) {
      for (auto& p : order(4, s)) out.push_back(p.second * 4 + p.first);
      return out;
    }
    auto sb = order(n / 4, s);
    auto in = order(4, s);
    for (auto& b : sb)
      for (auto& c : in)
        out.push_back((b.second * 4 + c.second) * n + b.first * 4 + c.first);
    return out;
  }
};
const ScanTables g_scans;

const uint8_t kCtxMap4x4[16] = {0,1,4,5,2,3,4,5,6,6,8,8,7,7,8,8};
const uint8_t kGroupIdx[32] = {0,1,2,3,4,4,5,5,6,6,6,6,7,7,7,7,
                               8,8,8,8,8,8,8,8,9,9,9,9,9,9,9,9};
const uint8_t kMinInGroup[10] = {0,1,2,3,4,6,8,12,16,24};

// spec 9.3.4.2.5 sig_coeff_flag ctxInc (relative within component class)
int sig_ctx_inc(int log2, int scan_idx, int xc, int yc,
                int csbf_right, int csbf_below, bool luma) {
  if (log2 == 2) return kCtxMap4x4[(yc << 2) + xc];
  if ((xc | yc) == 0) return 0;
  int xs = xc >> 2, ys = yc >> 2, xp = xc & 3, yp = yc & 3;
  int prev = csbf_right + 2 * csbf_below;
  int s;
  switch (prev) {
    case 0: s = (xp + yp == 0) ? 2 : (xp + yp < 3) ? 1 : 0; break;
    case 1: s = (yp == 0) ? 2 : (yp == 1) ? 1 : 0; break;
    case 2: s = (xp == 0) ? 2 : (xp == 1) ? 1 : 0; break;
    default: s = 2; break;
  }
  if (luma) {
    if (xs | ys) s += 3;
    s += (log2 == 3) ? ((scan_idx == 0) ? 9 : 15) : 21;
  } else {
    s += (log2 == 3) ? 9 : 12;
  }
  return s;
}

// spec 8.4.2 luma MPM candidate list
void mpm_list(const PicMaps& m, int x0, int y0, int cand[3]) {
  const int ctu = m.sp.ctu_size;
  int a = 1, b = 1;  // DC default
  if (m.available(x0 - 1, y0, x0, y0)) a = m.luma_mode[m.idx(x0 - 1, y0)];
  if (m.available(x0, y0 - 1, x0, y0) && (y0 % ctu) != 0)
    b = m.luma_mode[m.idx(x0, y0 - 1)];
  if (a == b) {
    if (a < 2) { cand[0] = 0; cand[1] = 1; cand[2] = 26; }
    else {
      cand[0] = a;
      cand[1] = 2 + ((a + 29) % 32);
      cand[2] = 2 + ((a - 2 + 1) % 32);
    }
  } else {
    cand[0] = a; cand[1] = b;
    cand[2] = (a != 0 && b != 0) ? 0 : ((a != 1 && b != 1) ? 1 : 26);
  }
}

// chroma candidate modes (spec 7.4.9.6 / 8.4.3): index 0..3 -> mode,
// with 34 substitution when colliding with the luma mode; index 4 = DM.
int chroma_cand(int idx, int luma_mode) {
  static const int base[4] = {0, 26, 10, 1};
  if (idx == 4) return luma_mode;
  int m = base[idx];
  return (m == luma_mode) ? 34 : m;
}

int chroma_mode_to_idx(int mode, int luma_mode) {
  if (mode == luma_mode) return 4;  // DM
  for (int i = 0; i < 4; ++i)
    if (chroma_cand(i, luma_mode) == mode) return i;
  return 4;  // fallback (mode must equal one of the candidates)
}

int mode_scan_idx(int log2, int c_idx, int pred_mode) {
  // spec 7.4.9.11: mode-dependent coefficient scan for small intra TUs
  bool mdcs = (c_idx == 0) ? (log2 == 2 || log2 == 3) : (log2 == 2);
  if (!mdcs) return 0;
  if (pred_mode >= 6 && pred_mode <= 14) return 2;   // near-horizontal: ver scan
  if (pred_mode >= 22 && pred_mode <= 30) return 1;  // near-vertical: hor scan
  return 0;
}

}  // namespace

void ContextSet::init(int st, int qp) {
  init_arr(split_cu, IV_SPLIT, st, qp);
  init_arr(tq_bypass, IV_TQB, st, qp);
  init_arr(skip_flag, IV_SKIP, st, qp);
  init_arr(merge_flag, IV_MERGE_F, st, qp);
  init_arr(merge_idx, IV_MERGE_I, st, qp);
  init_arr(part_size, IV_PART, st, qp);
  init_arr(pred_mode, IV_PREDM, st, qp);
  init_arr(intra_luma, IV_ILUMA, st, qp);
  init_arr(intra_chroma, IV_ICHROMA, st, qp);
  init_arr(inter_dir, IV_INTERDIR, st, qp);
  init_arr(mvd, IV_MVD, st, qp);
  init_arr(ref_idx, IV_REF, st, qp);
  init_arr(dqp, IV_DQP, st, qp);
  init_arr(cbf_luma, IV_CBF_L, st, qp);
  init_arr(cbf_chroma, IV_CBF_C, st, qp);
  init_arr(qt_root_cbf, IV_ROOTCBF, st, qp);
  init_arr(last_x, IV_LAST, st, qp);
  init_arr(last_y, IV_LAST, st, qp);
  init_arr(sig_cg, IV_SIGCG, st, qp);
  init_arr(sig, IV_SIG, st, qp);
  init_arr(one, IV_ONE, st, qp);
  init_arr(abs_, IV_ABS, st, qp);
  init_arr(mvp_idx, IV_MVP, st, qp);
  init_arr(sao_merge, IV_SAOM, st, qp);
  init_arr(sao_type, IV_SAOT, st, qp);
  init_arr(trans_subdiv, IV_TSUB, st, qp);
  init_arr(transform_skip, IV_TSKIP, st, qp);
}

// ===========================================================================
// PicMaps
// ===========================================================================
void PicMaps::init(const SliceParams& p) {
  sp = p;
  int ctus_w = (p.pic_w + p.ctu_size - 1) / p.ctu_size;
  int ctus_h = (p.pic_h + p.ctu_size - 1) / p.ctu_size;
  stride = ctus_w * p.ctu_size / 4;
  rows = ctus_h * p.ctu_size / 4;
  cu_depth.assign((size_t)stride * rows, 0);
  luma_mode.assign((size_t)stride * rows, 1);
  nxn_flag.assign((size_t)stride * rows, 0);
}

static inline uint32_t part1by1(uint32_t v) {
  v &= 0xFFFF;
  v = (v | (v << 8)) & 0x00FF00FF;
  v = (v | (v << 4)) & 0x0F0F0F0F;
  v = (v | (v << 2)) & 0x33333333;
  v = (v | (v << 1)) & 0x55555555;
  return v;
}

bool PicMaps::available(int x, int y, int cx, int cy) const {
  if (x < 0 || y < 0 || x >= sp.pic_w || y >= sp.pic_h) return false;
  int ctus_w = (sp.pic_w + sp.ctu_size - 1) / sp.ctu_size;
  auto key = [&](int px, int py) -> uint64_t {
    uint64_t ctu = (uint64_t)(py / sp.ctu_size) * ctus_w + px / sp.ctu_size;
    uint32_t bx = (px % sp.ctu_size) >> 2, by = (py % sp.ctu_size) >> 2;
    return (ctu << 16) | part1by1(bx) | (part1by1(by) << 1);
  };
  return key(x, y) < key(cx, cy);
}

// ===========================================================================
// Residual coding — shared small helpers
// ===========================================================================
namespace {

struct SigCoeff { int pos; int16_t val; };  // pos = scan index

// collect per-subblock state from a TU block
struct TuBlock {
  int16_t c[32 * 32];
  int n, log2;
  int16_t at(int pos_raster) const { return c[pos_raster]; }
};

}  // namespace

// ===========================================================================
// SliceEncoder
// ===========================================================================
SliceEncoder::SliceEncoder(const SliceParams& sp) : sp_(sp), cabac_(&bw_) {
  maps_.init(sp);
  begin_slice();
}

void SliceEncoder::begin_slice() {
  ctx_.init(sp_.slice_type, sp_.qp);
  bw_ = BitWriter();
  cabac_ = CabacEncoder(&bw_);
  finished_ = false;
}

void SliceEncoder::encode_ctu(int cx, int cy, const CtuData& d,
                              int end_of_slice) {
  cur_ = &d;
  ctu_x0_ = cx * sp_.ctu_size;
  ctu_y0_ = cy * sp_.ctu_size;
  // publish this CTU's maps so in-CTU and cross-CTU neighbour lookups work
  // (availability guards reads of not-yet-coded blocks).
  int bw4 = sp_.ctu_size / 4;
  for (int by = 0; by < bw4; ++by) {
    int py = (ctu_y0_ >> 2) + by;
    if (py >= maps_.rows) break;
    for (int bx = 0; bx < bw4; ++bx) {
      int px = (ctu_x0_ >> 2) + bx;
      if (px >= maps_.stride) break;
      size_t pi = (size_t)py * maps_.stride + px;
      maps_.cu_depth[pi] = d.cu_depth[by * bw4 + bx];
      maps_.luma_mode[pi] = d.luma_mode[by * bw4 + bx];
      maps_.nxn_flag[pi] = d.nxn_flag[by * bw4 + bx];
    }
  }
  cu_tree(ctu_x0_, ctu_y0_, sp_.max_cb_log2, 0);
  cabac_.encode_terminate(end_of_slice);
  if (end_of_slice) {
    // encode_terminate(1) already ran EncodeFlush; byte-align the RBSP with
    // rbsp_trailing: flush wrote the stop bit pattern; slice_data alignment
    // is handled by the caller appending rbsp_slice_trailing_bits.
  }
  cur_ = nullptr;
}

static int map_at(const uint8_t* m, int bw4, int lx, int ly) {
  return m[(ly >> 2) * bw4 + (lx >> 2)];
}

void SliceEncoder::cu_tree(int x0, int y0, int log2, int depth) {
  if (x0 >= sp_.pic_w || y0 >= sp_.pic_h) return;
  int size = 1 << log2;
  bool boundary = (x0 + size > sp_.pic_w) || (y0 + size > sp_.pic_h);
  int bw4 = sp_.ctu_size / 4;
  int target = map_at(cur_->cu_depth, bw4, x0 - ctu_x0_, y0 - ctu_y0_);
  bool split = boundary || (depth < target);
  if (log2 > sp_.min_cb_log2) {
    if (!boundary) {
      int ctxi = 0;
      if (maps_.available(x0 - 1, y0, x0, y0) &&
          maps_.cu_depth[maps_.idx(x0 - 1, y0)] > depth) ctxi++;
      if (maps_.available(x0, y0 - 1, x0, y0) &&
          maps_.cu_depth[maps_.idx(x0, y0 - 1)] > depth) ctxi++;
      cabac_.encode_bin(ctx_.split_cu[ctxi], split ? 1 : 0);
    }
  } else {
    split = false;
  }
  if (split) {
    int h = size >> 1;
    cu_tree(x0, y0, log2 - 1, depth + 1);
    cu_tree(x0 + h, y0, log2 - 1, depth + 1);
    cu_tree(x0, y0 + h, log2 - 1, depth + 1);
    cu_tree(x0 + h, y0 + h, log2 - 1, depth + 1);
    return;
  }
  code_cu(x0, y0, log2);
}

void SliceEncoder::code_cu(int x0, int y0, int log2) {
  if (g_bin_trace) fprintf(g_bin_trace, "# CU %d %d log2=%d\n", x0, y0, log2);
  int bw4 = sp_.ctu_size / 4;
  bool nxn = log2 == sp_.min_cb_log2 &&
             map_at(cur_->nxn_flag, bw4, x0 - ctu_x0_, y0 - ctu_y0_);
  // I-slice: no transquant bypass / skip / pred_mode syntax (PPS flags off).
  if (log2 == sp_.min_cb_log2) {
    cabac_.encode_bin(ctx_.part_size[0], nxn ? 0 : 1);
  }
  code_intra_luma_modes(x0, y0, log2, nxn);
  code_intra_chroma_mode(x0, y0);
  transform_tree(x0, y0, x0, y0, log2, 0, 0, nxn, 1, 1);
}

void SliceEncoder::code_intra_luma_modes(int x0, int y0, int log2, bool nxn) {
  int bw4 = sp_.ctu_size / 4;
  int npart = nxn ? 4 : 1;
  int half = 1 << (log2 - 1);
  int px[4], py[4], mode[4], cand[4][3], mpm_idx[4];
  for (int i = 0; i < npart; ++i) {
    px[i] = x0 + (i & 1) * half;
    py[i] = y0 + (i >> 1) * half;
    mode[i] = map_at(cur_->luma_mode, bw4, px[i] - ctu_x0_, py[i] - ctu_y0_);
    mpm_list(maps_, px[i], py[i], cand[i]);
    mpm_idx[i] = -1;
    for (int k = 0; k < 3; ++k)
      if (cand[i][k] == mode[i]) { mpm_idx[i] = k; break; }
    cabac_.encode_bin(ctx_.intra_luma[0], mpm_idx[i] >= 0 ? 1 : 0);
  }
  for (int i = 0; i < npart; ++i) {
    if (mpm_idx[i] >= 0) {
      // mpm_idx: truncated unary, bypass
      cabac_.encode_bypass(mpm_idx[i] > 0 ? 1 : 0);
      if (mpm_idx[i] > 0) cabac_.encode_bypass(mpm_idx[i] > 1 ? 1 : 0);
    } else {
      int c[3] = {cand[i][0], cand[i][1], cand[i][2]};
      std::sort(c, c + 3);
      int rem = mode[i];
      for (int k = 2; k >= 0; --k)
        if (rem > c[k]) rem--;
      cabac_.encode_bypass_bins(rem, 5);
    }
  }
}

void SliceEncoder::code_intra_chroma_mode(int x0, int y0) {
  int bw4 = sp_.ctu_size / 4;
  int cmode = map_at(cur_->chroma_mode, bw4, x0 - ctu_x0_, y0 - ctu_y0_);
  int lmode = map_at(cur_->luma_mode, bw4, x0 - ctu_x0_, y0 - ctu_y0_);
  int idx = chroma_mode_to_idx(cmode, lmode);
  if (idx == 4) {
    cabac_.encode_bin(ctx_.intra_chroma[0], 0);
  } else {
    cabac_.encode_bin(ctx_.intra_chroma[0], 1);
    cabac_.encode_bypass_bins(idx, 2);
  }
}

void SliceEncoder::transform_tree(int x0, int y0, int xb, int yb, int log2,
                                  int depth, int blk_idx, bool intra_split,
                                  int par_cb, int par_cr) {
  int bw4 = sp_.ctu_size / 4;
  int max_depth = sp_.max_tu_depth_intra + (intra_split ? 1 : 0);
  bool explicit_split =
      log2 <= sp_.max_tb_log2 && log2 > sp_.min_tb_log2 &&
      depth < max_depth && !(intra_split && depth == 0);
  bool split;
  if (log2 > sp_.max_tb_log2) split = true;
  else if (intra_split && depth == 0) split = true;
  else if (explicit_split)
    split = map_at(cur_->tu_depth, bw4, x0 - ctu_x0_, y0 - ctu_y0_) > depth;
  else split = false;
  if (explicit_split)
    cabac_.encode_bin(ctx_.trans_subdiv[5 - log2], split ? 1 : 0);

  auto any_nz = [&](const int16_t* plane, int pw, int px, int py, int n) {
    for (int yy = 0; yy < n; ++yy)
      for (int xx = 0; xx < n; ++xx)
        if (plane[(py + yy) * pw + px + xx]) return 1;
    return 0;
  };
  int half_ctu = sp_.ctu_size >> 1;
  int cbf_cb = 0, cbf_cr = 0;
  if (log2 > 2) {
    int cpx = (x0 - ctu_x0_) >> 1, cpy = (y0 - ctu_y0_) >> 1;
    int cn = 1 << (log2 - 1);
    if (depth == 0 || par_cb) {
      cbf_cb = any_nz(cur_->coeff_cb, half_ctu, cpx, cpy, cn);
      cabac_.encode_bin(ctx_.cbf_chroma[depth], cbf_cb);
    }
    if (depth == 0 || par_cr) {
      cbf_cr = any_nz(cur_->coeff_cr, half_ctu, cpx, cpy, cn);
      cabac_.encode_bin(ctx_.cbf_chroma[depth], cbf_cr);
    }
  } else {
    cbf_cb = par_cb;
    cbf_cr = par_cr;
  }

  if (split) {
    int h = 1 << (log2 - 1);
    transform_tree(x0, y0, x0, y0, log2 - 1, depth + 1, 0, intra_split, cbf_cb, cbf_cr);
    transform_tree(x0 + h, y0, x0, y0, log2 - 1, depth + 1, 1, intra_split, cbf_cb, cbf_cr);
    transform_tree(x0, y0 + h, x0, y0, log2 - 1, depth + 1, 2, intra_split, cbf_cb, cbf_cr);
    transform_tree(x0 + h, y0 + h, x0, y0, log2 - 1, depth + 1, 3, intra_split, cbf_cb, cbf_cr);
    return;
  }

  // leaf: cbf_luma always coded for intra
  if (g_bin_trace) fprintf(g_bin_trace, "# TULEAF %d %d log2=%d cb=%d cr=%d\n", x0, y0, log2, cbf_cb, cbf_cr);
  int n = 1 << log2;
  int cbf_y = any_nz(cur_->coeff_y, sp_.ctu_size, x0 - ctu_x0_, y0 - ctu_y0_, n);
  cabac_.encode_bin(ctx_.cbf_luma[depth == 0 ? 1 : 0], cbf_y);

  if (cbf_y) residual(x0, y0, log2, 0);
  if (log2 > 2) {
    if (cbf_cb) residual(x0, y0, log2 - 1, 1);
    if (cbf_cr) residual(x0, y0, log2 - 1, 2);
  } else if (blk_idx == 3) {
    if (par_cb) residual(xb, yb, 2, 1);
    if (par_cr) residual(xb, yb, 2, 2);
  }
}

void SliceEncoder::residual(int x0, int y0, int log2, int c_idx) {
  if (g_bin_trace) fprintf(g_bin_trace, "# RES %d %d log2=%d c=%d\n", x0, y0, log2, c_idx);
  int bw4 = sp_.ctu_size / 4;
  bool luma = c_idx == 0;
  int n = 1 << log2;
  const int16_t* plane;
  int pw, px, py;
  if (luma) {
    plane = cur_->coeff_y; pw = sp_.ctu_size;
    px = x0 - ctu_x0_; py = y0 - ctu_y0_;
  } else {
    plane = (c_idx == 1) ? cur_->coeff_cb : cur_->coeff_cr;
    pw = sp_.ctu_size >> 1;
    px = (x0 - ctu_x0_) >> 1; py = (y0 - ctu_y0_) >> 1;
  }
  int pred_mode = luma
      ? map_at(cur_->luma_mode, bw4, x0 - ctu_x0_, y0 - ctu_y0_)
      : map_at(cur_->chroma_mode, bw4, x0 - ctu_x0_, y0 - ctu_y0_);
  int scan_idx = mode_scan_idx(log2, c_idx, pred_mode);
  const auto& scan = g_scans.t[log2 - 2][scan_idx];

  // (transform_skip_flag would be coded here; disabled in our PPS)

  // last significant position
  int last_pos = -1;
  for (int i = n * n - 1; i >= 0; --i)
    if (plane[(py + scan[i] / n) * pw + px + scan[i] % n]) { last_pos = i; break; }
  assert(last_pos >= 0);
  int lx = scan[last_pos] % n, ly = scan[last_pos] / n;
  if (scan_idx == 2) std::swap(lx, ly);

  ContextModel* lastx = luma ? ctx_.last_x : ctx_.last_x + 15;
  ContextModel* lasty = luma ? ctx_.last_y : ctx_.last_y + 15;
  int ctx_offset = luma ? 3 * (log2 - 2) + ((log2 - 1) >> 2) : 0;
  int ctx_shift = luma ? (log2 + 1) >> 2 : log2 - 2;
  int cmax = (log2 << 1) - 1;
  int gx = kGroupIdx[lx], gy = kGroupIdx[ly];
  for (int b = 0; b < gx; ++b)
    cabac_.encode_bin(lastx[ctx_offset + (b >> ctx_shift)], 1);
  if (gx < cmax) cabac_.encode_bin(lastx[ctx_offset + (gx >> ctx_shift)], 0);
  for (int b = 0; b < gy; ++b)
    cabac_.encode_bin(lasty[ctx_offset + (b >> ctx_shift)], 1);
  if (gy < cmax) cabac_.encode_bin(lasty[ctx_offset + (gy >> ctx_shift)], 0);
  if (gx > 3) cabac_.encode_bypass_bins(lx - kMinInGroup[gx], (gx >> 1) - 1);
  if (gy > 3) cabac_.encode_bypass_bins(ly - kMinInGroup[gy], (gy >> 1) - 1);

  // sub-block loop
  int nsb = 1 << (2 * (log2 - 2));
  int sb_w = n >> 2;
  std::vector<uint8_t> csbf(nsb, 0);
  auto sb_of = [&](int i) {  // subblock scan index -> (xS, yS)
    int r = scan[i * 16];  // first inner pos of subblock i
    return std::make_pair((r % n) >> 2, (r / n) >> 2);
  };
  for (int i = 0; i < nsb; ++i) {
    for (int k = 0; k < 16; ++k) {
      int r = scan[i * 16 + k];
      if (plane[(py + r / n) * pw + px + r % n]) { csbf[i] = 1; break; }
    }
  }
  int last_sb = last_pos >> 4;
  // coded_sub_block_flag is inferred 1 for the DC sub-block and the one
  // containing the last coefficient: both are always processed.
  csbf[0] = 1;
  csbf[last_sb] = 1;
  if (g_bin_trace) fprintf(g_bin_trace, "# lastpos %d (x=%d y=%d) lastsb %d\n", last_pos, lx, ly, last_sb);
  auto csbf_at = [&](int xs, int ys) -> int {
    if (xs >= sb_w || ys >= sb_w) return 0;
    // find subblock scan index for (xs,ys): search (small n)
    for (int i = 0; i < nsb; ++i) {
      auto p = sb_of(i);
      if (p.first == xs && p.second == ys) return csbf[i];
    }
    return 0;
  };
  int c1 = 1;
  for (int i = last_sb; i >= 0; --i) {
    auto sbp = sb_of(i);
    int xs = sbp.first, ys = sbp.second;
    int right = csbf_at(xs + 1, ys), below = csbf_at(xs, ys + 1);
    if (i < last_sb && i > 0) {
      int ctxi = (right || below) ? 1 : 0;
      cabac_.encode_bin(ctx_.sig_cg[(luma ? 0 : 2) + ctxi], csbf[i]);
    }
    if (!csbf[i]) continue;

    int infer_dc = (i < last_sb && i > 0) ? 1 : 0;
    SigCoeff coeffs[16];
    int num = 0;
    int start = (i == last_sb) ? (last_pos & 15) : 15;
    if (i == last_sb) {  // the last coeff itself: sig inferred
      int r = scan[last_pos];
      coeffs[num++] = {last_pos, plane[(py + r / n) * pw + px + r % n]};
    }
    for (int k = start - (i == last_sb ? 1 : 0); k >= 0; --k) {
      int pos = i * 16 + k;
      int r = scan[pos];
      int16_t v = plane[(py + r / n) * pw + px + r % n];
      int sig = v != 0;
      if (k > 0 || !infer_dc) {
        int xc = r % n, yc = r / n;
        int sctx = sig_ctx_inc(log2, scan_idx, xc, yc, right, below, luma);
        cabac_.encode_bin(ctx_.sig[(luma ? 0 : 28) + sctx], sig);
        if (sig) infer_dc = 0;
      }
      if (sig) coeffs[num++] = {pos, v};
    }

    if (num == 0) continue;  // inferred-coded DC sub-block with no coeffs
    if (g_bin_trace) fprintf(g_bin_trace, "# sb %d num %d -> gt1\n", i, num);

    // greater1 / greater2
    int ctx_set = (i > 0 && luma) ? 2 : 0;
    if (c1 == 0) ctx_set++;
    c1 = 1;
    int first_gt1 = -1;
    int num_c1 = std::min(num, 8);
    for (int k = 0; k < num_c1; ++k) {
      int gt1 = std::abs(coeffs[k].val) > 1;
      cabac_.encode_bin(ctx_.one[(luma ? 0 : 16) + 4 * ctx_set + c1], gt1);
      if (gt1) { c1 = 0; if (first_gt1 < 0) first_gt1 = k; }
      else if (c1 < 3 && c1 > 0) c1++;
    }
    if (first_gt1 >= 0) {
      int gt2 = std::abs(coeffs[first_gt1].val) > 2;
      cabac_.encode_bin(ctx_.abs_[(luma ? 0 : 4) + ctx_set], gt2);
    }

    // signs (with optional sign-data hiding)
    if (g_bin_trace) fprintf(g_bin_trace, "# sb %d signs\n", i);
    int first_nz_k = coeffs[num - 1].pos & 15;  // lowest scan pos in sb
    int last_nz_k = coeffs[0].pos & 15;
    bool hide = sp_.sign_hiding && (last_nz_k - first_nz_k > 3);
    for (int k = 0; k < num; ++k) {
      if (hide && k == num - 1) break;  // hidden sign: parity conveys it
      cabac_.encode_bypass(coeffs[k].val < 0 ? 1 : 0);
    }

    // remaining levels
    if (g_bin_trace) fprintf(g_bin_trace, "# sb %d remaining\n", i);
    int first_coeff2 = 1, rice = 0;
    for (int k = 0; k < num; ++k) {
      int av = std::abs(coeffs[k].val);
      int base = (k < 8) ? (2 + first_coeff2) : 1;
      if (av >= base) {
        int rem = av - base;
        // coeff_abs_level_remaining binarization (spec 9.3.3.9)
        if (rem < (3 << rice)) {
          int len = rem >> rice;
          cabac_.encode_bypass_bins((1u << (len + 1)) - 2, len + 1);
          cabac_.encode_bypass_bins(rem & ((1 << rice) - 1), rice);
        } else {
          int len = rice;
          int val = rem - (3 << rice);
          while (val >= (1 << len)) { val -= 1 << len; len++; }
          int ones = 3 + len + 1 - rice;
          cabac_.encode_bypass_bins((1u << ones) - 2, ones);
          cabac_.encode_bypass_bins(val, len);
        }
        if (av > (3 << rice)) rice = std::min(rice + 1, 4);
      }
      if (av >= 2) first_coeff2 = 0;
    }
  }
}

// ===========================================================================
// SliceDecoder
// ===========================================================================
SliceDecoder::SliceDecoder(const SliceParams& sp, const uint8_t* data,
                           size_t size)
    : sp_(sp), br_(data, size), cabac_(&br_) {
  maps_.init(sp);
  ctx_.init(sp_.slice_type, sp_.qp);
}

void SliceDecoder::begin_slice() {}

void SliceDecoder::fill(uint8_t* map, int x0, int y0, int log2, uint8_t v) {
  int bw4 = sp_.ctu_size / 4;
  int b = 1 << (log2 - 2);
  int bx = (x0 - ctu_x0_) >> 2, by = (y0 - ctu_y0_) >> 2;
  for (int yy = 0; yy < b; ++yy)
    for (int xx = 0; xx < b; ++xx)
      map[(by + yy) * bw4 + bx + xx] = v;
}

int SliceDecoder::decode_ctu(int cx, int cy, const MutCtuData& d) {
  cur_ = &d;
  ctu_x0_ = cx * sp_.ctu_size;
  ctu_y0_ = cy * sp_.ctu_size;
  int bw4 = sp_.ctu_size / 4;
  std::memset(d.cu_depth, 0, bw4 * bw4);
  std::memset(d.nxn_flag, 0, bw4 * bw4);
  std::memset(d.luma_mode, 1, bw4 * bw4);
  std::memset(d.chroma_mode, 1, bw4 * bw4);
  std::memset(d.tu_depth, 0, bw4 * bw4);
  std::memset(d.coeff_y, 0, sizeof(int16_t) * sp_.ctu_size * sp_.ctu_size);
  std::memset(d.coeff_cb, 0, sizeof(int16_t) * (sp_.ctu_size / 2) * (sp_.ctu_size / 2));
  std::memset(d.coeff_cr, 0, sizeof(int16_t) * (sp_.ctu_size / 2) * (sp_.ctu_size / 2));
  cu_tree(ctu_x0_, ctu_y0_, sp_.max_cb_log2, 0);
  int eos = cabac_.decode_terminate();
  cur_ = nullptr;
  return eos;
}

void SliceDecoder::cu_tree(int x0, int y0, int log2, int depth) {
  if (x0 >= sp_.pic_w || y0 >= sp_.pic_h) return;
  int size = 1 << log2;
  bool boundary = (x0 + size > sp_.pic_w) || (y0 + size > sp_.pic_h);
  bool split = false;
  if (log2 > sp_.min_cb_log2) {
    if (boundary) {
      split = true;
    } else {
      int ctxi = 0;
      if (maps_.available(x0 - 1, y0, x0, y0) &&
          maps_.cu_depth[maps_.idx(x0 - 1, y0)] > depth) ctxi++;
      if (maps_.available(x0, y0 - 1, x0, y0) &&
          maps_.cu_depth[maps_.idx(x0, y0 - 1)] > depth) ctxi++;
      split = cabac_.decode_bin(ctx_.split_cu[ctxi]);
    }
  }
  if (split) {
    int h = size >> 1;
    cu_tree(x0, y0, log2 - 1, depth + 1);
    cu_tree(x0 + h, y0, log2 - 1, depth + 1);
    cu_tree(x0, y0 + h, log2 - 1, depth + 1);
    cu_tree(x0 + h, y0 + h, log2 - 1, depth + 1);
    return;
  }
  parse_cu(x0, y0, log2);
}

void SliceDecoder::parse_cu(int x0, int y0, int log2) {
  int depth = sp_.max_cb_log2 - log2;
  fill(cur_->cu_depth, x0, y0, log2, depth);
  // publish depth to picture maps
  int b = 1 << (log2 - 2);
  for (int yy = 0; yy < b; ++yy)
    for (int xx = 0; xx < b; ++xx)
      maps_.cu_depth[((y0 >> 2) + yy) * maps_.stride + (x0 >> 2) + xx] = depth;

  bool nxn = false;
  if (log2 == sp_.min_cb_log2)
    nxn = cabac_.decode_bin(ctx_.part_size[0]) == 0;
  fill(cur_->nxn_flag, x0, y0, log2, nxn ? 1 : 0);

  // luma modes
  int npart = nxn ? 4 : 1;
  int half = 1 << (log2 - 1);
  int prev_flag[4], mode[4];
  for (int i = 0; i < npart; ++i)
    prev_flag[i] = cabac_.decode_bin(ctx_.intra_luma[0]);
  for (int i = 0; i < npart; ++i) {
    int px = x0 + (i & 1) * half, py = y0 + (i >> 1) * half;
    int cand[3];
    mpm_list(maps_, px, py, cand);
    if (prev_flag[i]) {
      int idx = 0;
      if (cabac_.decode_bypass()) idx = cabac_.decode_bypass() ? 2 : 1;
      mode[i] = cand[idx];
    } else {
      int rem = cabac_.decode_bypass_bins(5);
      int c[3] = {cand[0], cand[1], cand[2]};
      std::sort(c, c + 3);
      for (int k = 0; k < 3; ++k)
        if (rem >= c[k]) rem++;
      mode[i] = rem;
    }
    int plog2 = nxn ? log2 - 1 : log2;
    fill(cur_->luma_mode, px, py, plog2, mode[i]);
    int pb = 1 << (plog2 - 2);
    for (int yy = 0; yy < pb; ++yy)
      for (int xx = 0; xx < pb; ++xx)
        maps_.luma_mode[((py >> 2) + yy) * maps_.stride + (px >> 2) + xx] =
            mode[i];
  }
  // chroma mode
  int cmode;
  if (cabac_.decode_bin(ctx_.intra_chroma[0]) == 0) {
    cmode = chroma_cand(4, mode[0]);
  } else {
    cmode = chroma_cand(cabac_.decode_bypass_bins(2), mode[0]);
  }
  fill(cur_->chroma_mode, x0, y0, log2, cmode);

  transform_tree(x0, y0, x0, y0, log2, 0, 0, nxn, 1, 1);
}

void SliceDecoder::transform_tree(int x0, int y0, int xb, int yb, int log2,
                                  int depth, int blk_idx, bool intra_split,
                                  int par_cb, int par_cr) {
  int max_depth = sp_.max_tu_depth_intra + (intra_split ? 1 : 0);
  bool explicit_split =
      log2 <= sp_.max_tb_log2 && log2 > sp_.min_tb_log2 &&
      depth < max_depth && !(intra_split && depth == 0);
  bool split;
  if (log2 > sp_.max_tb_log2) split = true;
  else if (intra_split && depth == 0) split = true;
  else if (explicit_split)
    split = cabac_.decode_bin(ctx_.trans_subdiv[5 - log2]);
  else split = false;

  int cbf_cb = 0, cbf_cr = 0;
  if (log2 > 2) {
    if (depth == 0 || par_cb)
      cbf_cb = cabac_.decode_bin(ctx_.cbf_chroma[depth]);
    if (depth == 0 || par_cr)
      cbf_cr = cabac_.decode_bin(ctx_.cbf_chroma[depth]);
  } else {
    cbf_cb = par_cb;
    cbf_cr = par_cr;
  }

  if (split) {
    int h = 1 << (log2 - 1);
    transform_tree(x0, y0, x0, y0, log2 - 1, depth + 1, 0, intra_split, cbf_cb, cbf_cr);
    transform_tree(x0 + h, y0, x0, y0, log2 - 1, depth + 1, 1, intra_split, cbf_cb, cbf_cr);
    transform_tree(x0, y0 + h, x0, y0, log2 - 1, depth + 1, 2, intra_split, cbf_cb, cbf_cr);
    transform_tree(x0 + h, y0 + h, x0, y0, log2 - 1, depth + 1, 3, intra_split, cbf_cb, cbf_cr);
    return;
  }

  fill(cur_->tu_depth, x0, y0, log2, depth);
  int cbf_y = cabac_.decode_bin(ctx_.cbf_luma[depth == 0 ? 1 : 0]);
  if (cbf_y) residual(x0, y0, log2, 0);
  if (log2 > 2) {
    if (cbf_cb) residual(x0, y0, log2 - 1, 1);
    if (cbf_cr) residual(x0, y0, log2 - 1, 2);
  } else if (blk_idx == 3) {
    if (par_cb) residual(xb, yb, 2, 1);
    if (par_cr) residual(xb, yb, 2, 2);
  }
}

void SliceDecoder::residual(int x0, int y0, int log2, int c_idx) {
  int bw4 = sp_.ctu_size / 4;
  bool luma = c_idx == 0;
  int n = 1 << log2;
  int16_t* plane;
  int pw, px, py;
  if (luma) {
    plane = cur_->coeff_y; pw = sp_.ctu_size;
    px = x0 - ctu_x0_; py = y0 - ctu_y0_;
  } else {
    plane = (c_idx == 1) ? cur_->coeff_cb : cur_->coeff_cr;
    pw = sp_.ctu_size >> 1;
    px = (x0 - ctu_x0_) >> 1; py = (y0 - ctu_y0_) >> 1;
  }
  int pred_mode = luma
      ? map_at(cur_->luma_mode, bw4, x0 - ctu_x0_, y0 - ctu_y0_)
      : map_at(cur_->chroma_mode, bw4, x0 - ctu_x0_, y0 - ctu_y0_);
  int scan_idx = mode_scan_idx(log2, c_idx, pred_mode);
  const auto& scan = g_scans.t[log2 - 2][scan_idx];

  // last significant position
  ContextModel* lastx = luma ? ctx_.last_x : ctx_.last_x + 15;
  ContextModel* lasty = luma ? ctx_.last_y : ctx_.last_y + 15;
  int ctx_offset = luma ? 3 * (log2 - 2) + ((log2 - 1) >> 2) : 0;
  int ctx_shift = luma ? (log2 + 1) >> 2 : log2 - 2;
  int cmax = (log2 << 1) - 1;
  int gx = 0, gy = 0;
  while (gx < cmax && cabac_.decode_bin(lastx[ctx_offset + (gx >> ctx_shift)]))
    gx++;
  while (gy < cmax && cabac_.decode_bin(lasty[ctx_offset + (gy >> ctx_shift)]))
    gy++;
  int lx = gx, ly = gy;
  if (gx > 3) lx = kMinInGroup[gx] + cabac_.decode_bypass_bins((gx >> 1) - 1);
  if (gy > 3) ly = kMinInGroup[gy] + cabac_.decode_bypass_bins((gy >> 1) - 1);
  if (scan_idx == 2) std::swap(lx, ly);

  // find last scan pos
  int last_pos = -1;
  for (int i = n * n - 1; i >= 0; --i)
    if (scan[i] % n == lx && scan[i] / n == ly) { last_pos = i; break; }

  int nsb = 1 << (2 * (log2 - 2));
  int sb_w = n >> 2;
  std::vector<uint8_t> csbf(nsb, 0);
  auto sb_of = [&](int i) {
    int r = scan[i * 16];
    return std::make_pair((r % n) >> 2, (r / n) >> 2);
  };
  auto csbf_at = [&](int xs, int ys) -> int {
    if (xs >= sb_w || ys >= sb_w) return 0;
    for (int i = 0; i < nsb; ++i) {
      auto p = sb_of(i);
      if (p.first == xs && p.second == ys) return csbf[i];
    }
    return 0;
  };

  int last_sb = last_pos >> 4;
  csbf[last_sb] = 1;
  csbf[0] = 1;
  int c1 = 1;
  for (int i = last_sb; i >= 0; --i) {
    auto sbp = sb_of(i);
    int xs = sbp.first, ys = sbp.second;
    int right = csbf_at(xs + 1, ys), below = csbf_at(xs, ys + 1);
    if (i < last_sb && i > 0) {
      int ctxi = (right || below) ? 1 : 0;
      csbf[i] = cabac_.decode_bin(ctx_.sig_cg[(luma ? 0 : 2) + ctxi]);
    }
    if (!csbf[i]) continue;

    int infer_dc = (i < last_sb && i > 0) ? 1 : 0;
    int sig_pos[16], num = 0;
    int start = (i == last_sb) ? (last_pos & 15) : 15;
    if (i == last_sb) sig_pos[num++] = last_pos;
    for (int k = start - (i == last_sb ? 1 : 0); k >= 0; --k) {
      int pos = i * 16 + k;
      int r = scan[pos];
      int sig;
      if (k > 0 || !infer_dc) {
        int xc = r % n, yc = r / n;
        int sctx = sig_ctx_inc(log2, scan_idx, xc, yc, right, below, luma);
        sig = cabac_.decode_bin(ctx_.sig[(luma ? 0 : 28) + sctx]);
        if (sig) infer_dc = 0;
      } else {
        sig = 1;  // inferred DC significance
      }
      if (sig) sig_pos[num++] = pos;
    }

    if (num == 0) continue;  // inferred-coded DC sub-block with no coeffs

    int ctx_set = (i > 0 && luma) ? 2 : 0;
    if (c1 == 0) ctx_set++;
    c1 = 1;
    int gt1[16] = {0}, first_gt1 = -1;
    int num_c1 = std::min(num, 8);
    for (int k = 0; k < num_c1; ++k) {
      gt1[k] = cabac_.decode_bin(ctx_.one[(luma ? 0 : 16) + 4 * ctx_set + c1]);
      if (gt1[k]) { c1 = 0; if (first_gt1 < 0) first_gt1 = k; }
      else if (c1 < 3 && c1 > 0) c1++;
    }
    int gt2 = 0;
    if (first_gt1 >= 0)
      gt2 = cabac_.decode_bin(ctx_.abs_[(luma ? 0 : 4) + ctx_set]);

    int first_nz_k = sig_pos[num - 1] & 15;
    int last_nz_k = sig_pos[0] & 15;
    bool hide = sp_.sign_hiding && (last_nz_k - first_nz_k > 3);
    int sign[16] = {0};
    for (int k = 0; k < num; ++k) {
      if (hide && k == num - 1) break;
      sign[k] = cabac_.decode_bypass();
    }

    // levels: inverse of the coeff_abs_level_remaining binarization
    auto read_remaining = [&](int rice) -> int {
      int p = 0;
      while (cabac_.decode_bypass()) p++;
      if (p < 3) return (p << rice) | (int)cabac_.decode_bypass_bins(rice);
      int eg_len = p - 3 + rice;
      return (3 << rice) + (1 << eg_len) - (1 << rice)
             + (int)cabac_.decode_bypass_bins(eg_len);
    };
    int level[16];
    int first_coeff2 = 1, rice = 0;
    long sum_abs = 0;
    for (int k = 0; k < num; ++k) {
      int flags_val, base_level;
      if (k < 8) {
        flags_val = 1 + gt1[k] + (k == first_gt1 ? gt2 : 0);
        base_level = 2 + first_coeff2;
      } else {
        flags_val = 1;
        base_level = 1;
      }
      int av = flags_val;
      if (flags_val == base_level) {  // flags saturated -> remaining present
        av += read_remaining(rice);
        if (av > (3 << rice)) rice = std::min(rice + 1, 4);
      }
      level[k] = av;
      if (av >= 2) first_coeff2 = 0;
      sum_abs += av;
    }
    for (int k = 0; k < num; ++k) {
      int s = sign[k];
      if (hide && k == num - 1) s = (sum_abs & 1);
      int r = scan[sig_pos[k]];
      plane[(py + r / n) * pw + px + r % n] = s ? -level[k] : level[k];
    }
  }
}

}  // namespace hevctpu
