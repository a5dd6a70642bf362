"""Deblocking filter (spec 8.7.2), vectorized over all edges of a frame.

Parity: reference TComLoopFilter.{h,cpp} (loopFilterPic:130, boundary
strength :417, luma/chroma edge filters :560,679). The reference walks CU by
CU; since HEVC's 8-sample edge spacing makes every same-direction edge
independent, this implementation filters ALL vertical edges of the picture
in one vectorized pass, then all horizontal edges — the natural
device-friendly formulation.

Shared by encoder and decoder (in-loop: the filtered picture is the
reference and the hash target).
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..core import tables

TC_TABLE = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 8,
    9, 10, 11, 13, 14, 16, 18, 20, 22, 24], dtype=np.int32)
BETA_TABLE = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10,
    11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32, 34, 36,
    38, 40, 42, 44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64], dtype=np.int32)


class DeblockMaps:
    """Per-4x4 edge flags and boundary-strength inputs for one frame.

    Built from the frame's decision maps (encoder) or parse maps (decoder):
    edge_v[by, bx]: a vertical TU/PU/CU boundary runs along the LEFT side of
    4x4 block (bx, by); edge_h: along its TOP. is_intra/nz/mv/ref per 4x4.
    """

    NO_POC = -(10 ** 6)

    def __init__(self, h4: int, w4: int):
        self.edge_v = np.zeros((h4, w4), bool)
        self.edge_h = np.zeros((h4, w4), bool)
        # transform-unit edges: the nonzero-coefficient BS rule applies
        # only here, not at pure PU boundaries (spec 8.7.2.4)
        self.tu_edge_v = np.zeros((h4, w4), bool)
        self.tu_edge_h = np.zeros((h4, w4), bool)
        self.is_intra = np.zeros((h4, w4), bool)
        self.nz = np.zeros((h4, w4), bool)
        self.mvx = np.zeros((2, h4, w4), np.int32)
        self.mvy = np.zeros((2, h4, w4), np.int32)
        self.poc = np.full((2, h4, w4), self.NO_POC, np.int32)


def build_maps(decisions, sps, ref_pocs=((), ())) -> DeblockMaps:
    """Derive deblocking maps from per-CTU decision maps. `ref_pocs` maps
    (list0, list1) reference indices to picture POCs for the BS rules."""
    from ..encoder.quadtree import cu_leaves, tu_leaves
    w, h = sps.pic_width_in_luma_samples, sps.pic_height_in_luma_samples
    ctu = sps.ctu_size
    m = DeblockMaps((h + 3) >> 2, (w + 3) >> 2)
    ctus_w = -(-w // ctu)
    min_cb = sps.log2_min_luma_coding_block_size_minus3 + 3

    def poc_of(lst, ridx):
        out = np.full(ridx.shape, DeblockMaps.NO_POC, np.int32)
        for i, pv in enumerate(lst):
            out[ridx == i] = pv
        return out

    for i, d in enumerate(decisions):
        cy, cx = divmod(i, ctus_w)
        x0c, y0c = cx * ctu, cy * ctu
        n4 = ctu // 4
        bx0, by0 = x0c >> 2, y0c >> 2
        h4 = min(n4, m.is_intra.shape[0] - by0)
        w4 = min(n4, m.is_intra.shape[1] - bx0)
        sl = (slice(by0, by0 + h4), slice(bx0, bx0 + w4))
        intra = d.pred_mode[:h4, :w4] == 1
        m.is_intra[sl] = intra
        m.mvx[0][sl] = d.mv_x[:h4, :w4]
        m.mvy[0][sl] = d.mv_y[:h4, :w4]
        m.poc[0][sl] = np.where(intra, DeblockMaps.NO_POC,
                                poc_of(ref_pocs[0], d.ref_idx[:h4, :w4]))
        m.mvx[1][sl] = d.mv_x1[:h4, :w4]
        m.mvy[1][sl] = d.mv_y1[:h4, :w4]
        m.poc[1][sl] = np.where(intra, DeblockMaps.NO_POC,
                                poc_of(ref_pocs[1], d.ref_idx1[:h4, :w4]))
        for (x0, y0, log2) in cu_leaves(d.cu_depth, x0c, y0c, w, h,
                                        ctu_log2=tables.log2(ctu),
                                        min_cb_log2=min_cb):
            intra = d.pred_mode[(y0 - y0c) >> 2, (x0 - x0c) >> 2] == 1
            nxn = bool(d.nxn_flag[(y0 - y0c) >> 2, (x0 - x0c) >> 2])
            maxd = (sps.max_transform_hierarchy_depth_intra if intra
                    else sps.max_transform_hierarchy_depth_inter)
            size = 1 << log2
            # CU boundary edges (CU edges are also TU edges)
            m.edge_v[y0 >> 2:(y0 + size) >> 2, x0 >> 2] = True
            m.edge_h[y0 >> 2, x0 >> 2:(x0 + size) >> 2] = True
            m.tu_edge_v[y0 >> 2:(y0 + size) >> 2, x0 >> 2] = True
            m.tu_edge_h[y0 >> 2, x0 >> 2:(x0 + size) >> 2] = True
            # interior PU boundary of 2NxN / Nx2N partitions (spec 8.7.2.2)
            if not intra:
                part = int(d.nxn_flag[(y0 - y0c) >> 2, (x0 - x0c) >> 2])
                off = {2: size >> 1, 4: size >> 2, 5: size - (size >> 2),
                       3: size >> 1, 6: size >> 2, 7: size - (size >> 2)}
                if part in (2, 4, 5):
                    m.edge_h[(y0 + off[part]) >> 2,
                             x0 >> 2:(x0 + size) >> 2] = True
                elif part in (3, 6, 7):
                    m.edge_v[y0 >> 2:(y0 + size) >> 2,
                             (x0 + off[part]) >> 2] = True
            for (tx, ty, tlog2, tdepth, blk) in tu_leaves(
                    d.tu_depth, x0, y0, log2, x0c, y0c,
                    intra_split=(intra and nxn),
                    max_tu_depth_intra=maxd):
                ts = 1 << tlog2
                m.edge_v[ty >> 2:(ty + ts) >> 2, tx >> 2] = True
                m.edge_h[ty >> 2, tx >> 2:(tx + ts) >> 2] = True
                m.tu_edge_v[ty >> 2:(ty + ts) >> 2, tx >> 2] = True
                m.tu_edge_h[ty >> 2, tx >> 2:(tx + ts) >> 2] = True
                tl = d.coeff_y[ty - y0c:ty - y0c + ts,
                               tx - x0c:tx - x0c + ts]
                if tl.any():
                    m.nz[ty >> 2:(ty + ts) >> 2,
                         tx >> 2:(tx + ts) >> 2] = True
    # picture boundaries are never filtered
    m.edge_v[:, 0] = False
    m.edge_h[0, :] = False
    m.tu_edge_v[:, 0] = False
    m.tu_edge_h[0, :] = False
    return m


def _boundary_strength(m: DeblockMaps, vertical: bool) -> np.ndarray:
    """BS per 4x4 block edge (spec 8.7.2.4). For the edge on the left/top of
    block (by,bx): P = neighbour block, Q = this block."""
    if vertical:
        q = (slice(None), slice(1, None))
        p = (slice(None), slice(0, -1))
        edge = m.edge_v[:, 1:]
        tu_edge = m.tu_edge_v[:, 1:]
    else:
        q = (slice(1, None), slice(None))
        p = (slice(0, -1), slice(None))
        edge = m.edge_h[1:, :]
        tu_edge = m.tu_edge_h[1:, :]
    intra = m.is_intra[p] | m.is_intra[q]
    nzpq = m.nz[p] | m.nz[q]

    # --- motion-based condition (spec 8.7.2.4, uni and bi cases) ---
    def side(sel):
        v0 = m.poc[0][sel] != DeblockMaps.NO_POC
        v1 = m.poc[1][sel] != DeblockMaps.NO_POC
        # normalized uni motion (whichever list is used)
        ux = np.where(v0, m.mvx[0][sel], m.mvx[1][sel])
        uy = np.where(v0, m.mvy[0][sel], m.mvy[1][sel])
        up = np.where(v0, m.poc[0][sel], m.poc[1][sel])
        return dict(n=v0.astype(np.int32) + v1.astype(np.int32),
                    ux=ux, uy=uy, up=up,
                    x0=m.mvx[0][sel], y0=m.mvy[0][sel], p0=m.poc[0][sel],
                    x1=m.mvx[1][sel], y1=m.mvy[1][sel], p1=m.poc[1][sel])

    P, Q = side(p), side(q)
    ncount_diff = P["n"] != Q["n"]
    # uni-uni
    uni_refdiff = P["up"] != Q["up"]
    uni_mvdiff = ((np.abs(P["ux"] - Q["ux"]) >= 4)
                  | (np.abs(P["uy"] - Q["uy"]) >= 4))
    uni_bad = uni_refdiff | uni_mvdiff
    # bi-bi
    straight_ref = (P["p0"] == Q["p0"]) & (P["p1"] == Q["p1"])
    cross_ref = (P["p0"] == Q["p1"]) & (P["p1"] == Q["p0"])
    st_mv_ok = ((np.abs(P["x0"] - Q["x0"]) < 4)
                & (np.abs(P["y0"] - Q["y0"]) < 4)
                & (np.abs(P["x1"] - Q["x1"]) < 4)
                & (np.abs(P["y1"] - Q["y1"]) < 4))
    cr_mv_ok = ((np.abs(P["x0"] - Q["x1"]) < 4)
                & (np.abs(P["y0"] - Q["y1"]) < 4)
                & (np.abs(P["x1"] - Q["x0"]) < 4)
                & (np.abs(P["y1"] - Q["y0"]) < 4))
    same_pic = P["p0"] == P["p1"]  # both lists reference the same picture
    bi_ok = np.where(
        same_pic & straight_ref,       # refs identical: either pairing ok
        st_mv_ok | cr_mv_ok,
        (straight_ref & st_mv_ok) | (cross_ref & ~straight_ref & cr_mv_ok))
    bi_bad = ~(straight_ref | cross_ref) | ~bi_ok
    motion_bad = np.where(ncount_diff, True,
                          np.where(P["n"] == 2, bi_bad, uni_bad))

    bs = np.where(intra, 2,
                  np.where((nzpq & tu_edge) | motion_bad, 1, 0))
    bs = np.where(edge, bs, 0)
    # re-embed at full grid (edge at left/top of block index >= 1)
    full = np.zeros(m.edge_v.shape, np.int32)
    if vertical:
        full[:, 1:] = bs
    else:
        full[1:, :] = bs
    return full


def _filter_luma_dir(y: np.ndarray, bs4: np.ndarray, qp: int, bd: int,
                     beta_off: int, tc_off: int, vertical: bool,
                     qp_map=None) -> None:
    """Filter all vertical (or horizontal) luma edges in place.
    bs4: per-4x4 BS grid. For horizontal edges the plane is transposed so
    one code path serves both directions. qp_map (per-4x4 luma QP, for
    cu_qp_delta streams) replaces the scalar qp: per segment the spec
    8.7.2.5.3 average of the two adjacent blocks' QPs is used."""
    if not vertical:
        y = y.T  # view: in-place writes go through
        bs4 = bs4.T
        if qp_map is not None:
            qp_map = qp_map.T
    h, w = y.shape
    scale = 1 << (bd - 8)
    maxv = (1 << bd) - 1
    # candidate edges: columns multiple of 8, per 4-row segment; one
    # nonzero over the [h/4, w/8] BS sub-grid (no Python per-edge loop)
    sub = bs4[:, 2::2][:, :(w - 9) // 8 + 1] if w > 8 else None
    if sub is None or sub.size == 0:
        return
    rows_nz, cols_nz = np.nonzero(sub > 0)
    if rows_nz.size == 0:
        return
    xs = (cols_nz + 1) * 8
    ys = rows_nz * 4
    bss = sub[rows_nz, cols_nz].astype(np.int64)
    n = len(xs)
    # gather 4x8 patches [n, 4, 8]: rows ys..ys+3, cols xs-4..xs+3
    row_idx = ys[:, None, None] + np.arange(4)[None, :, None]
    col_idx = xs[:, None, None] + np.arange(-4, 4)[None, None, :]
    patch = y[row_idx, col_idx].astype(np.int64)
    p3, p2, p1, p0 = patch[..., 0], patch[..., 1], patch[..., 2], patch[..., 3]
    q0, q1, q2, q3 = patch[..., 4], patch[..., 5], patch[..., 6], patch[..., 7]

    if qp_map is not None:
        qp = ((qp_map[ys >> 2, (xs >> 2) - 1] +
               qp_map[ys >> 2, xs >> 2] + 1) >> 1)       # [n]
    qidx_b = np.clip(qp + (beta_off << 1), 0, 51)
    beta = BETA_TABLE[qidx_b].astype(np.int64) * scale   # [n] (or scalar)
    qidx_t = np.clip(qp + 2 * (bss - 1) + (tc_off << 1), 0, 53)
    tc = TC_TABLE[qidx_t] * scale                        # [n]

    dp = np.abs(p2 - 2 * p1 + p0)                        # [n, 4]
    dq = np.abs(q2 - 2 * q1 + q0)
    dp0, dp3 = dp[:, 0], dp[:, 3]
    dq0, dq3 = dq[:, 0], dq[:, 3]
    d = dp0 + dq0 + dp3 + dq3
    do_filter = d < beta                                  # [n]

    # strong/weak decision per segment (lines 0 and 3; spec 8.7.2.5.3)
    def sdec(i):
        return ((2 * (dp[:, i] + dq[:, i]) < (beta >> 2))
                & ((np.abs(p3[:, i] - p0[:, i])
                    + np.abs(q0[:, i] - q3[:, i])) < (beta >> 3))
                & (np.abs(p0[:, i] - q0[:, i]) < ((5 * tc + 1) >> 1)))
    strong = do_filter & sdec(0) & sdec(3)
    weak = do_filter & ~strong

    tc_ = tc[:, None]
    # ---- strong filter ----
    sp0 = np.clip((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                  p0 - 2 * tc_, p0 + 2 * tc_)
    sp1 = np.clip((p2 + p1 + p0 + q0 + 2) >> 2, p1 - 2 * tc_, p1 + 2 * tc_)
    sp2 = np.clip((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                  p2 - 2 * tc_, p2 + 2 * tc_)
    sq0 = np.clip((p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3,
                  q0 - 2 * tc_, q0 + 2 * tc_)
    sq1 = np.clip((p0 + q0 + q1 + q2 + 2) >> 2, q1 - 2 * tc_, q1 + 2 * tc_)
    sq2 = np.clip((p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3,
                  q2 - 2 * tc_, q2 + 2 * tc_)

    # ---- weak filter ----
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4     # [n, 4]
    wf = weak[:, None] & (np.abs(delta) < (tc_ * 10))
    dlt = np.clip(delta, -tc_, tc_)
    wp0 = np.clip(p0 + dlt, 0, maxv)
    wq0 = np.clip(q0 - dlt, 0, maxv)
    side_thr = (beta + (beta >> 1)) >> 3
    filt_p1 = (dp0 + dp3) < side_thr                      # [n]
    filt_q1 = (dq0 + dq3) < side_thr
    tch = tc_ >> 1
    dp1 = np.clip((((p2 + p0 + 1) >> 1) - p1 + dlt) >> 1, -tch, tch)
    dq1 = np.clip((((q2 + q0 + 1) >> 1) - q1 - dlt) >> 1, -tch, tch)
    wp1 = np.clip(p1 + dp1, 0, maxv)
    wq1 = np.clip(q1 + dq1, 0, maxv)

    st = strong[:, None]
    out_p0 = np.where(st, sp0, np.where(wf, wp0, p0))
    out_p1 = np.where(st, sp1,
                      np.where(wf & filt_p1[:, None], wp1, p1))
    out_p2 = np.where(st, sp2, p2)
    out_q0 = np.where(st, sq0, np.where(wf, wq0, q0))
    out_q1 = np.where(st, sq1,
                      np.where(wf & filt_q1[:, None], wq1, q1))
    out_q2 = np.where(st, sq2, q2)

    out = patch.copy()
    out[..., 1] = out_p2
    out[..., 2] = out_p1
    out[..., 3] = out_p0
    out[..., 4] = out_q0
    out[..., 5] = out_q1
    out[..., 6] = out_q2
    y[row_idx, col_idx] = out.astype(y.dtype)


def _filter_chroma_dir(c: np.ndarray, bs4: np.ndarray, qp_c: int, bd: int,
                       tc_off: int, vertical: bool, eshift: int = 1,
                       qp_map=None, chroma_format: int = 1,
                       lshift: int = None, qp_off: int = 0) -> None:
    """Chroma edges: 8-chroma-sample grid, BS==2 only, line granularity
    matching the luma segment grid (spec 8.7.2.5.5). eshift is the
    subsampling shift PERPENDICULAR to the edge (sets the edge spacing
    in luma units), lshift the shift ALONG the edge (sets the chroma
    lines per 4-luma BS segment). For 4:2:0 both are 1; for 4:2:2
    vertical edges (eshift=1, lshift=0) and horizontal edges
    (eshift=0, lshift=1); 4:4:4 both 0."""
    if lshift is None:
        lshift = eshift
    if not vertical:
        c = c.T
        bs4 = bs4.T
        if qp_map is not None:
            qp_map = qp_map.T
    h, w = c.shape
    scale = 1 << (bd - 8)
    maxv = (1 << bd) - 1
    rows_per = 4 >> lshift            # chroma rows per luma 4-row segment
    # chroma x in {8, 16, ...} -> luma BS column ((x << eshift) >> 2);
    # BS==2 edges only, vectorized over the sub-grid
    nxe = (w - 9) // 8 + 1 if w > 8 else 0
    if nxe <= 0:
        return
    step = 2 << eshift
    sub = bs4[:, step::step][:, :nxe]
    rows_nz, cols_nz = np.nonzero(sub == 2)
    if rows_nz.size == 0:
        return
    xs = (cols_nz + 1) * 8
    ys = rows_nz * rows_per
    row_idx = ys[:, None, None] + np.arange(rows_per)[None, :, None]
    col_idx = xs[:, None, None] + np.arange(-2, 2)[None, None, :]
    patch = c[row_idx, col_idx].astype(np.int64)
    p1, p0, q0, q1 = (patch[..., 0], patch[..., 1],
                      patch[..., 2], patch[..., 3])
    if qp_map is not None:
        lx = xs << eshift   # luma column of the edge
        qpl = ((qp_map[(ys << lshift) >> 2, (lx >> 2) - 1] +
                qp_map[(ys << lshift) >> 2, lx >> 2] + 1) >> 1) + qp_off
        if chroma_format == 1:
            qp_c = tables.CHROMA_QP_MAP_420[np.clip(qpl, 0, 57)]
        else:
            qp_c = np.minimum(np.maximum(qpl, 0), 51)
        qp_c = qp_c[:, None]
    tc = TC_TABLE[np.clip(qp_c + 2 + (tc_off << 1), 0, 53)] * scale
    delta = np.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
    patch[..., 1] = np.clip(p0 + delta, 0, maxv)
    patch[..., 2] = np.clip(q0 - delta, 0, maxv)
    c[row_idx, col_idx] = patch.astype(c.dtype)


def deblock_frame(recon: List[np.ndarray], maps: DeblockMaps, qp: int,
                  sps, beta_off: int = 0, tc_off: int = 0,
                  qp_map=None, cb_qp_offset: int = 0,
                  cr_qp_offset: int = 0) -> None:
    """In-place deblocking of a reconstructed frame (both directions).
    qp_map: per-4x4 luma QP (cu_qp_delta streams; ops/qpmap.py).
    cb/cr_qp_offset: the PPS chroma QP offsets — spec 8.7.2.5.3 applies
    the pps (not slice) offset to the averaged edge QP before the
    chroma mapping."""
    bd = sps.bit_depth_luma
    bs_v = _boundary_strength(maps, vertical=True)
    bs_h = _boundary_strength(maps, vertical=False)
    qp_cb = tables.chroma_qp(qp, sps.chroma_format_idc, cb_qp_offset)
    qp_cr = tables.chroma_qp(qp, sps.chroma_format_idc, cr_qp_offset)
    csx, csy = sps.chroma_shift_x, sps.chroma_shift_y
    cf = sps.chroma_format_idc
    # vertical edges first (normative order), then horizontal; the
    # perpendicular/along-edge shifts swap between the two passes
    _filter_luma_dir(recon[0], bs_v, qp, bd, beta_off, tc_off, True, qp_map)
    _filter_chroma_dir(recon[1], bs_v, qp_cb, bd, tc_off, True, csx,
                       qp_map, cf, lshift=csy, qp_off=cb_qp_offset)
    _filter_chroma_dir(recon[2], bs_v, qp_cr, bd, tc_off, True, csx,
                       qp_map, cf, lshift=csy, qp_off=cr_qp_offset)
    _filter_luma_dir(recon[0], bs_h, qp, bd, beta_off, tc_off, False, qp_map)
    _filter_chroma_dir(recon[1], bs_h, qp_cb, bd, tc_off, False, csy,
                       qp_map, cf, lshift=csx, qp_off=cb_qp_offset)
    _filter_chroma_dir(recon[2], bs_h, qp_cr, bd, tc_off, False, csy,
                       qp_map, cf, lshift=csx, qp_off=cr_qp_offset)
