"""Top-level decoder: Annex-B in, YUV frames out, hash verification.

Parity: reference TDecTop (NAL-at-a-time decode state machine,
TDecTop.cpp:698) + TDecGop::filterPicture's decoded-picture-hash
conformance check (TDecGop.cpp:209) + TAppDecTop::xWriteOutput output
bumping (TAppDecTop.cpp:262 — hold pictures until more than
sps_max_num_reorder_pics are waiting, then emit in POC order).
Maintains a multi-picture DPB keyed by POC so random-access
hierarchical-B streams with past+future reference lists decode.
Parsers assert on unsupported tools (tiles/WPP/TMVP).
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..core.params import PPS, SPS, VPS
from ..core.types import SliceType
from ..entropy import cabac
from ..entropy.nal import nal_to_rbsp, split_annexb
from ..ops.interp import pad_plane
from . import headers as dh
from .recon import PAD, CtuReconstructor

# pictures older than this many POCs below the newest are evicted; covers
# the reference cfgs' deepest RPS delta (-13, encoder_lowdelay_P_main.cfg)
DPB_KEEP = 32


class DecoderTop:
    def __init__(self, collect_stats: bool = False):
        self.vps: Optional[VPS] = None
        self.sps: Optional[SPS] = None
        self.pps: Optional[PPS] = None
        self.collect_stats = collect_stats
        self.stats: List[dict] = []   # per-picture analyser records
        self.dpb: Dict[int, List[np.ndarray]] = {}    # poc -> recon planes
        self.dpb_motion: Dict[int, dict] = {}         # poc -> motion field
        self.out_buf: List[Tuple[int, int, List[np.ndarray]]] = []
        self.cvs = 0
        self.hash_status: List[str] = []
        self.pic_structs = []  # pic_timing SEI per AU (field weaving)
        self._last_decoded = None

    def decode_stream(self, data: bytes) -> Iterator[List[np.ndarray]]:
        """Yields decoded frames (lists of planes) in output order."""
        for nal in split_annexb(data):
            nal_type, tid, rbsp = nal_to_rbsp(nal)
            if nal_type == 32:
                self.vps = dh.parse_vps(rbsp)
            elif nal_type == 33:
                self.sps = dh.parse_sps(rbsp)
            elif nal_type == 34:
                self.pps = dh.parse_pps(rbsp)
            elif nal_type == 39 or nal_type == 40:
                digests = self._parse_hash_sei(rbsp)
                if digests and self._last_decoded is not None:
                    ok = self._check_hash(self._last_decoded, digests)
                    self.hash_status.append("OK" if ok else "ERROR")
                from ..entropy.sei import parse_sei_messages, PIC_TIMING
                for (ptype, body) in parse_sei_messages(rbsp):
                    if ptype == PIC_TIMING and body:
                        # pic_struct u(4) is the first field (D.2.3)
                        self.pic_structs.append(body[0] >> 4)
            elif nal_type <= 21:  # VCL
                if nal_type in (19, 20):   # IDR: new CVS, flush + clear DPB
                    yield from self._bump(all_pics=True)
                    self.dpb = {}
                    self.dpb_motion = {}
                    self.cvs += 1
                try:
                    recon, poc = self._decode_slice(nal_type, rbsp)
                except (AssertionError, IndexError, ValueError) as e:
                    # corrupt/truncated slice: conceal by dropping the
                    # picture (reference TDecTop lost-picture handling,
                    # TDecTop.cpp:223) and keep decoding
                    import sys
                    print(f"warning: slice decode failed ({e}); "
                          "picture dropped", file=sys.stderr)
                    self.hash_status.append("LOST")
                    continue
                self._last_decoded = recon
                self.dpb[poc] = recon
                for old in [p for p in self.dpb if p < poc - DPB_KEEP]:
                    del self.dpb[old]
                self.out_buf.append((self.cvs, poc, recon))
                yield from self._bump(all_pics=False)
        yield from self._bump(all_pics=True)

    def _bump(self, all_pics: bool) -> Iterator[List[np.ndarray]]:
        limit = 0 if all_pics else (
            self.sps.sps_max_num_reorder_pics if self.sps else 0)
        self.out_buf.sort(key=lambda t: (t[0], t[1]))
        while len(self.out_buf) > limit:
            yield self.out_buf.pop(0)[2]

    # ------------------------------------------------------------------
    def _parse_hash_sei(self, rbsp: bytes):
        if len(rbsp) < 2 or rbsp[0] != 132:
            return None
        size = rbsp[1]
        if rbsp[2] != 0:  # not MD5
            return None
        body = rbsp[3:3 + size - 1]
        return [body[i:i + 16] for i in range(0, len(body), 16)]

    def _check_hash(self, planes, digests) -> bool:
        from ..entropy.sei import picture_md5
        ours = picture_md5(planes, self.sps.bit_depth_luma)
        return all(a == b for a, b in zip(ours, digests))

    def _decode_slice(self, nal_type: int, rbsp: bytes):
        sps, pps = self.sps, self.pps
        sh, offset = dh.parse_slice_header(rbsp, nal_type, sps, pps)
        slice_data = rbsp[offset:]
        ref_pocs_l0: List[int] = []
        ref_pocs_l1: List[int] = []
        if sh.slice_type != SliceType.I and sh.rps is not None:
            negs = sorted([d for d, u in zip(sh.rps.delta_pocs,
                                             sh.rps.used_flags)
                           if d < 0 and u], reverse=True)
            poss = sorted([d for d, u in zip(sh.rps.delta_pocs,
                                             sh.rps.used_flags)
                           if d > 0 and u])
            # default list construction (spec 8.3.4): L0 = negatives then
            # positives; L1 = positives then negatives
            ref_pocs_l0 = [sh.poc + d for d in (negs + poss)]
            ref_pocs_l1 = [sh.poc + d for d in (poss + negs)]
        nl0 = max(1, sh.num_ref_idx_active[0])
        nl1 = (sh.num_ref_idx_active[1]
               if sh.slice_type == SliceType.B else 0)
        sp = cabac.make_slice_params(
            sps.pic_width_in_luma_samples, sps.pic_height_in_luma_samples,
            sh.slice_qp, slice_type=int(sh.slice_type),
            ctu_size=sps.ctu_size,
            max_tu_depth_intra=sps.max_transform_hierarchy_depth_intra,
            max_tu_depth_inter=sps.max_transform_hierarchy_depth_inter,
            chroma_format=sps.chroma_format_idc,
            amp=sps.amp_enabled_flag,
            scaling_lists=sps.scaling_list_enabled_flag,
            transform_skip=pps.transform_skip_enabled_flag,
            cu_dqp=pps.cu_qp_delta_enabled_flag,
            pcm=sps.pcm_enabled_flag,
            sign_hiding=pps.sign_data_hiding_enabled_flag,
            max_merge_cand=5 - sh.five_minus_max_num_merge_cand,
            num_ref_l0=nl0, num_ref_l1=nl1,
            mvd_l1_zero=sh.mvd_l1_zero_flag,
            ref_poc_l0=ref_pocs_l0[:16], ref_poc_l1=ref_pocs_l1[:16],
            sao_luma=sh.slice_sao_luma_flag,
            sao_chroma=sh.slice_sao_chroma_flag,
            bit_depth=sps.bit_depth_luma, cur_poc=sh.poc,
            tile_cols=pps.num_tile_columns_minus1 + 1
            if pps.tiles_enabled_flag else 0,
            tile_rows=pps.num_tile_rows_minus1 + 1
            if pps.tiles_enabled_flag else 0)
        sp.wpp = pps.entropy_coding_sync_enabled_flag
        sdec = cabac.SliceDataDecoder(sp, slice_data)
        if (sh.slice_temporal_mvp_enabled_flag and ref_pocs_l0
                and ref_pocs_l0[0] in self.dpb_motion):
            cabac.set_collocated(sdec, self.dpb_motion[ref_pocs_l0[0]],
                                 False)
        if ((pps.entropy_coding_sync_enabled_flag
             or pps.tiles_enabled_flag) and sh.entry_point_offsets):
            # map NAL-payload entry offsets (incl. emulation prevention)
            # back to raw positions within the unescaped slice data; the
            # escape scanner's zero-run state carries in from the header
            targets = []
            acc = 0
            for o in sh.entry_point_offsets:
                acc += o
                targets.append(acc)
            zeros = 0
            for b in rbsp[:offset]:
                if zeros >= 2 and b <= 3:
                    zeros = 0
                zeros = zeros + 1 if b == 0 else 0
            raw_offs = []
            esc = 0
            ti = 0
            for i, b in enumerate(slice_data):
                if ti < len(targets) and esc == targets[ti]:
                    raw_offs.append(i)
                    ti += 1
                if zeros >= 2 and b <= 3:
                    esc += 1
                    zeros = 0
                esc += 1
                zeros = zeros + 1 if b == 0 else 0
            sdec.set_entry_points(raw_offs)
        w, h = sps.pic_width_in_luma_samples, sps.pic_height_in_luma_samples
        csh = 0 if sps.chroma_format_idc == 3 else 1
        recon = [np.zeros((h, w), np.int16),
                 np.zeros((h >> csh, w >> csh), np.int16),
                 np.zeros((h >> csh, w >> csh), np.int16)]
        refs_l0 = refs_l1 = None
        if sh.slice_type != SliceType.I:
            def resolve(pocs, n):
                out = []
                for rp in pocs[:n]:
                    assert rp in self.dpb, f"missing reference POC {rp}"
                    out.append([pad_plane(p, PAD) for p in self.dpb[rp]])
                return out
            refs_l0 = resolve(ref_pocs_l0, nl0)
            refs_l1 = resolve(ref_pocs_l1, nl1) if nl1 else None
        sps._tile_cols = (pps.num_tile_columns_minus1 + 1
                          if pps.tiles_enabled_flag else 0)
        sps._tile_rows = (pps.num_tile_rows_minus1 + 1
                          if pps.tiles_enabled_flag else 0)
        wp = ((sh.wp_log2_denom, sh.wp_weight, sh.wp_offset)
              if getattr(sh, "wp_luma_flag", 0) else None)
        rc = CtuReconstructor(sps, sh.slice_qp, refs_l0, refs_l1, wp=wp)
        ctus_w = sps.pic_width_in_ctus
        ctus_h = sps.pic_height_in_ctus
        from ..entropy.cabac import tile_scan_order
        order = tile_scan_order(
            w, h, sps.ctu_size,
            pps.num_tile_columns_minus1 + 1 if pps.tiles_enabled_flag else 0,
            pps.num_tile_rows_minus1 + 1 if pps.tiles_enabled_flag else 0)
        decisions = [None] * (ctus_w * ctus_h)
        dqp_on = pps.cu_qp_delta_enabled_flag
        qp_fin = None
        for k, (cx, cy) in enumerate(order):
            d, eos = sdec.decode_ctu(cx, cy)
            if dqp_on:
                qp_pred, qp_fin = cabac.fetch_ctu_qps(
                    sdec, len(order), decoder=True)
                rc.set_qp(int(qp_fin[k]))
            rc.recon_ctu(d, cx, cy, recon)
            decisions[cy * ctus_w + cx] = d
            assert eos == (1 if k == len(order) - 1 else 0), \
                f"end_of_slice mismatch at CTU {cx},{cy}"
        if sps.sps_temporal_mvp_enabled_flag:
            self.dpb_motion[sh.poc] = cabac.motion_field(
                decisions, sps, ref_pocs_l0[:nl0], ref_pocs_l1[:nl1],
                sh.poc)
        if not pps.pps_deblocking_filter_disabled_flag:
            from ..ops import deblock
            dmaps = deblock.build_maps(
                decisions, sps,
                (ref_pocs_l0[:nl0], ref_pocs_l1[:nl1]))
            qmap = None
            if dqp_on and qp_fin is not None:
                from ..ops import qpmap
                qmap = qpmap.build_qp_map(
                    lambda i: decisions[i], order, qp_pred, qp_fin,
                    sps.ctu_size, w, h)
            deblock.deblock_frame(recon, dmaps, sh.slice_qp, sps,
                                  pps.pps_beta_offset_div2,
                                  pps.pps_tc_offset_div2, qp_map=qmap)
        if self.collect_stats:
            self._collect(sh, decisions, len(slice_data))
        if sh.slice_sao_luma_flag or sh.slice_sao_chroma_flag:
            if sps.chroma_format_idc == 1:
                from ..entropy.cabac import sao_apply_native
                return (sao_apply_native(recon, [d.sao for d in decisions],
                                         sps, sps.bit_depth_luma), sh.poc)
            from ..ops import sao as saolib
            recon = saolib.apply_sao(recon, [d.sao for d in decisions],
                                     sps, sps.bit_depth_luma)
        return recon, sh.poc

    def _collect(self, sh, decisions, data_bytes):
        """Per-picture analyser record (reference TAppDecAnalyser-style
        statistics: CU mode shares, MV field summary, coefficient counts)."""
        rec = {"poc": sh.poc, "type": sh.slice_type.name,
               "qp": sh.slice_qp, "slice_bytes": data_bytes,
               "skip4": 0, "merge4": 0, "intra4": 0, "inter4": 0,
               "coeff_y": 0, "coeff_c": 0, "depth_hist": [0, 0, 0, 0],
               "abs_mv_sum": 0, "mv_blocks": 0}
        for d in decisions:
            rec["skip4"] += int(d.skip_flag.sum())
            rec["merge4"] += int((d.merge_flag & (1 - d.skip_flag)).sum())
            rec["intra4"] += int((d.pred_mode == 1).sum())
            rec["inter4"] += int((d.pred_mode == 0).sum())
            rec["coeff_y"] += int((d.coeff_y != 0).sum())
            rec["coeff_c"] += int((d.coeff_cb != 0).sum()
                                  + (d.coeff_cr != 0).sum())
            for dep in range(4):
                rec["depth_hist"][dep] += int((d.cu_depth == dep).sum())
            inter = d.pred_mode == 0
            rec["abs_mv_sum"] += int((np.abs(d.mv_x[inter])
                                      + np.abs(d.mv_y[inter])).sum())
            rec["mv_blocks"] += int(inter.sum())
        self.stats.append(rec)
