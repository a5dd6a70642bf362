"""Per-4x4 luma QP maps for cu_qp_delta streams.

With CTU-sized quantization groups (pps diff_cu_qp_delta_depth == 0) the
spec's per-CU QpY (8.6.1, mirrored from the reference decoder's
TDecCu::xFinishDecodeCU + TComDataCU::getRefQP) is:
  - qPY_PRED = the previous quantization group's final QP in decoding
    order (slice QP at the start of the slice, of a tile, and of each
    CTB row under WPP),
  - CUs in z-scan order BEFORE the CU that carries the cu_qp_delta (the
    first CU with any cbf) keep qPY_PRED; that CU and every one after it
    take the signalled QP,
  - a CTU with no cbf anywhere keeps qPY_PRED (no delta is coded).
The deblocking filter consumes this map (tc/beta are looked up from the
average QP of the two blocks at each edge, spec 8.7.2.5.3/5).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _tile_id(cx: int, cy: int, ctus_w: int, ctus_h: int,
             tile_cols: int, tile_rows: int) -> int:
    """Uniform-spacing tile id (mirrors the native tile_id_of)."""
    tx = 0
    for i in range(1, tile_cols):
        if cx >= (i * ctus_w) // tile_cols:
            tx = i
    ty = 0
    for i in range(1, tile_rows):
        if cy >= (i * ctus_h) // tile_rows:
            ty = i
    return ty * tile_cols + tx


def ctu_has_cbf(d, chroma_shift: int = 1) -> bool:
    """Any coded cbf in the CTU. I_PCM CUs carry raw samples in the coeff
    planes but have no cbf — mask them out (flag bit 0x80 at CU origin)."""
    if not (d.tu_depth & 0x80).any():
        return bool(d.coeff_y.any() or d.coeff_cb.any() or d.coeff_cr.any())
    cy = d.coeff_y.copy()
    cb = d.coeff_cb.copy()
    cr = d.coeff_cr.copy()
    for by, bx in np.argwhere(d.tu_depth & 0x80):
        # CU size from the depth map (the flag sits at the CU origin)
        log2 = (d.cu_depth.shape[0] * 4).bit_length() - 1 - \
            int(d.cu_depth[by, bx])
        n = 1 << log2
        y4, x4 = by * 4, bx * 4
        cy[y4:y4 + n, x4:x4 + n] = 0
        cb[y4 >> 1:(y4 >> 1) + (n >> 1), x4 >> 1:(x4 >> 1) + (n >> 1)] = 0
        cr[y4 >> 1:(y4 >> 1) + (n >> 1), x4 >> 1:(x4 >> 1) + (n >> 1)] = 0
    return bool(cy.any() or cb.any() or cr.any())


def qp_chain(targets: np.ndarray, has_cbf: List[bool], slice_qp: int,
             order: List[Tuple[int, int]], ctus_w: int, ctus_h: int,
             wpp: int = 0, tile_cols: int = 0, tile_rows: int = 0
             ) -> Tuple[np.ndarray, np.ndarray]:
    """(pred, final) per CTU in encode order — the Python twin of the
    chain the native slice codec records (used by the encoder, which
    needs the deblock QP map before entropy coding runs)."""
    n = len(order)
    pred = np.zeros(n, np.int32)
    fin = np.zeros(n, np.int32)
    carried = slice_qp
    prev_tile = -1
    for k, (cx, cy) in enumerate(order):
        first = k == 0
        if wpp and cx == 0:
            first = True
        if tile_cols > 1 or tile_rows > 1:
            tid = _tile_id(cx, cy, ctus_w, ctus_h, tile_cols, tile_rows)
            if tid != prev_tile:
                first = True
                prev_tile = tid
        p = slice_qp if first else carried
        f = int(targets[cy * ctus_w + cx]) if has_cbf[k] else p
        pred[k], fin[k] = p, f
        carried = f
    return pred, fin


def build_qp_map(get_d, order: List[Tuple[int, int]], pred: np.ndarray,
                 final: np.ndarray, ctu_size: int, pic_w: int, pic_h: int,
                 chroma_shift: int = 1) -> np.ndarray:
    """Per-4x4 luma QP map [(h+3)//4, (w+3)//4]. get_d(raster_idx) returns
    the CTU's decision maps; pred/final are per-CTU in encode order."""
    from ..encoder.quadtree import cu_leaves
    ctus_w = (pic_w + ctu_size - 1) // ctu_size
    qmap = np.zeros(((pic_h + 3) // 4, (pic_w + 3) // 4), np.int32)
    log2 = ctu_size.bit_length() - 1
    for k, (cx, cy) in enumerate(order):
        d = get_d(cy * ctus_w + cx)
        x0, y0 = cx * ctu_size, cy * ctu_size
        p, f = int(pred[k]), int(final[k])
        if p == f:
            qmap[y0 >> 2:(y0 + ctu_size) >> 2,
                 x0 >> 2:(x0 + ctu_size) >> 2] = f
            continue
        seen = False
        cs = chroma_shift
        for (ux, uy, ulog2) in cu_leaves(d.cu_depth, x0, y0, pic_w, pic_h,
                                         ctu_log2=log2):
            n = 1 << ulog2
            lx, ly = ux - x0, uy - y0
            if d.tu_depth[ly >> 2, lx >> 2] & 0x80:
                has = False   # I_PCM: no cbf
            else:
                has = bool(
                    d.coeff_y[ly:ly + n, lx:lx + n].any() or
                    d.coeff_cb[ly >> cs:(ly + n) >> cs,
                               lx >> cs:(lx + n) >> cs].any() or
                    d.coeff_cr[ly >> cs:(ly + n) >> cs,
                               lx >> cs:(lx + n) >> cs].any())
            seen = seen or has
            qmap[uy >> 2:(uy + n) >> 2, ux >> 2:(ux + n) >> 2] = \
                f if seen else p
    return qmap


def qg_qp_map(get_d, order: List[Tuple[int, int]], qg_qps: np.ndarray,
              slice_qp: int, ctu_size: int, dqp_depth: int,
              pic_w: int, pic_h: int, wpp: int = 0, tile_cols: int = 0,
              tile_rows: int = 0, chroma_format: int = 1) -> np.ndarray:
    """Per-4x4 luma QP map under sub-CTU quantization groups
    (diff_cu_qp_delta_depth > 0) — the Python twin of the native slice
    codec's qPY chain (qg_start + CU-finish semantics, spec 8.6.1 +
    7.3.8.4 IsCuQpDeltaCoded resets; reference TDecCu::xFinishDecodeCU),
    needed by the deblock filter before entropy coding runs. qg_qps is
    the flat per-QG target map the slice codec signals from."""
    from ..encoder.quadtree import cu_leaves
    qg = ctu_size >> dqp_depth
    qgs_w = (pic_w + qg - 1) // qg
    ctus_w = (pic_w + ctu_size - 1) // ctu_size
    ctus_h = (pic_h + ctu_size - 1) // ctu_size
    log2 = ctu_size.bit_length() - 1
    csx = 1 if chroma_format in (1, 2) else 0
    csy = 1 if chroma_format == 1 else 0
    qg_qps = np.asarray(qg_qps).reshape(-1)
    qmap = np.zeros(((pic_h + 3) // 4, (pic_w + 3) // 4), np.int32)
    last = slice_qp
    prev_tile = -1
    for k, (cx, cy) in enumerate(order):
        first = k == 0
        if wpp and cx == 0:
            first = True
        if tile_cols > 1 or tile_rows > 1:
            tid = _tile_id(cx, cy, ctus_w, ctus_h, tile_cols, tile_rows)
            if tid != prev_tile:
                first = True
                prev_tile = tid
        if first:
            last = slice_qp
        d = get_d(cy * ctus_w + cx)
        x0, y0 = cx * ctu_size, cy * ctu_size
        # seed the CTU area with qPY_PREV (the decoder's qp4_ init) so
        # QG-origin neighbour reads are always defined
        qmap[y0 >> 2:(y0 + ctu_size) >> 2,
             x0 >> 2:(x0 + ctu_size) >> 2] = last
        cur_qg = None
        seen = False
        qg_ref = last
        target = last
        for (ux, uy, ulog2) in cu_leaves(d.cu_depth, x0, y0, pic_w,
                                         pic_h, ctu_log2=log2):
            qo = (ux & ~(qg - 1), uy & ~(qg - 1))
            if qo != cur_qg:
                # new quantization group: left/above 4x4 neighbours of
                # the QG origin within this CTB, else qPY_PREV
                cur_qg = qo
                seen = False
                qx, qy = (qo[0] - x0) >> 2, (qo[1] - y0) >> 2
                lft = qmap[(y0 >> 2) + qy, (x0 >> 2) + qx - 1] \
                    if qx > 0 else last
                abv = qmap[(y0 >> 2) + qy - 1, (x0 >> 2) + qx] \
                    if qy > 0 else last
                qg_ref = (int(lft) + int(abv) + 1) >> 1
                target = int(qg_qps[(qo[1] // qg) * qgs_w + qo[0] // qg])
            n = 1 << ulog2
            lx, ly = ux - x0, uy - y0
            if d.tu_depth[ly >> 2, lx >> 2] & 0x80:
                has = False  # I_PCM carries no cbf
            else:
                has = bool(d.coeff_y[ly:ly + n, lx:lx + n].any())
                if not has and chroma_format != 0:
                    has = bool(
                        d.coeff_cb[ly >> csy:(ly + n) >> csy,
                                   lx >> csx:(lx + n) >> csx].any() or
                        d.coeff_cr[ly >> csy:(ly + n) >> csy,
                                   lx >> csx:(lx + n) >> csx].any())
            seen = seen or has
            q = target if seen else qg_ref
            qmap[uy >> 2:(uy + n) >> 2, ux >> 2:(ux + n) >> 2] = q
            last = q
    return qmap


def adaptive_qp_offsets(luma: np.ndarray, ctu_size: int, slice_qp: int,
                        qp_range: int = 6) -> np.ndarray:
    """Variance-driven per-CTU QP (reference TEncPreanalyzer::xPreanalyze
    + TEncCu activity-to-dQP mapping): activity = 1 + min quadrant
    variance; dQP = 6*log2((s*act + avg) / (act + s*avg)), s = 2^(r/6)."""
    h, w = luma.shape
    ctus_w = (w + ctu_size - 1) // ctu_size
    ctus_h = (h + ctu_size - 1) // ctu_size
    acts = np.zeros((ctus_h, ctus_w))
    half = ctu_size // 2
    for cy in range(ctus_h):
        for cx in range(ctus_w):
            blk = luma[cy * ctu_size:(cy + 1) * ctu_size,
                       cx * ctu_size:(cx + 1) * ctu_size].astype(np.float64)
            bh, bw = blk.shape
            vs = []
            for qy in (0, 1):
                for qx in (0, 1):
                    q = blk[qy * half:qy * half + half,
                            qx * half:qx * half + half]
                    if q.size:
                        vs.append(q.var())
            acts[cy, cx] = 1.0 + min(vs)
    avg = float(acts.mean())
    s = 2.0 ** (qp_range / 6.0)
    norm = (s * acts + avg) / (acts + s * avg)
    dqp = np.round(6.0 * np.log2(norm))
    return np.clip(slice_qp + dqp, 0, 51).astype(np.int8)
