"""Top-level encoder: owns parameter sets, frame loop, NAL assembly.

Parity: reference TEncTop (create/init/encode, TEncTop.cpp:186,325) +
TEncGOP::compressGOP's NAL/SEI assembly (TEncGOP.cpp:1011) reduced to the
currently supported intra path; the GOP/inter machinery extends this class.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..core.params import PPS, SPS, VPS, ShortTermRPS, SliceHeader
from ..core.types import NalUnitType, SliceType
from ..entropy import headers, nal, sei
from ..entropy.cabac import (SliceDataEncoder, make_slice_params)
from ..io.cfg import EncoderConfig
from .intra_frame import IntraFrameEncoder
from .inter_frame import PFrameEncoder


class EncoderTop:
    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg
        self.sps = SPS(
            pic_width_in_luma_samples=cfg.width,
            pic_height_in_luma_samples=cfg.height,
            bit_depth_luma_minus8=cfg.internal_bit_depth - 8,
            bit_depth_chroma_minus8=cfg.internal_bit_depth - 8,
            chroma_format_idc=cfg.internal_chroma_format,
            max_transform_hierarchy_depth_intra=cfg.tu_depth_intra,
            max_transform_hierarchy_depth_inter=cfg.tu_depth_inter,
            sample_adaptive_offset_enabled_flag=1 if cfg.sao else 0,
        )
        # profile signalling: main (1) / main10 (2)
        if cfg.internal_bit_depth > 8 or cfg.profile == "main10":
            self.sps.ptl.general_profile_idc = 2
        self.vps = VPS()
        self.vps.ptl.general_profile_idc = self.sps.ptl.general_profile_idc
        self.pps = PPS(init_qp_minus26=cfg.qp - 26)
        if cfg.deblock_disable:
            self.pps.deblocking_filter_control_present_flag = 1
            self.pps.pps_deblocking_filter_disabled_flag = 1
        # low-delay reference structure: one RPS referring to the previous
        # picture (parity: TEncTop::xInitRPS for the default LD config)
        self.sps.short_term_rps = [ShortTermRPS(delta_pocs=[-1],
                                                used_flags=[1])]
        self.rc = None
        if cfg.rate_control and cfg.target_bitrate:
            from .rate_ctrl import RateController
            self.rc = RateController(cfg.target_bitrate, cfg.frame_rate,
                                     cfg.width, cfg.height)
        self.poc = 0
        self.last_idr_poc = 0  # POC restarts at every IDR (per-CVS numbering)
        self.stats = []
        self.dpb_recon: Optional[List[np.ndarray]] = None

    def encode_frame(self, planes: List[np.ndarray]) -> bytes:
        """Encode one frame, return its Annex-B bytes (with parameter sets
        prefixed on the first frame). Frame 0 (and every IntraPeriod-th
        frame when IntraPeriod > 0) is IDR intra; others low-delay P."""
        cfg = self.cfg
        is_intra = (self.poc == 0 or
                    (cfg.intra_period > 0 and
                     self.poc % max(cfg.intra_period, 1) == 0))
        base_qp = self.rc.pic_qp(is_intra) if self.rc else cfg.qp
        if is_intra:
            self.last_idr_poc = self.poc
            sh = SliceHeader(
                slice_type=SliceType.I,
                nal_unit_type=int(NalUnitType.IDR_W_RADL),
                poc=0, slice_qp=base_qp,
                slice_sao_luma_flag=1 if cfg.sao else 0,
                slice_sao_chroma_flag=1 if cfg.sao else 0)
            fe = IntraFrameEncoder(self.sps, base_qp)
            sp = make_slice_params(
                cfg.width, cfg.height, base_qp, slice_type=int(SliceType.I),
                ctu_size=self.sps.ctu_size,
                max_tu_depth_intra=self.sps.max_transform_hierarchy_depth_intra,
                sao_luma=sh.slice_sao_luma_flag,
                sao_chroma=sh.slice_sao_chroma_flag,
                bit_depth=self.sps.bit_depth_luma)
            senc = SliceDataEncoder(sp)
            decisions, recon = fe.encode_frame(planes)
        else:
            # hierarchical low-delay QP offsets + lambda weights (parity:
            # the cfg GOP table rows, e.g. encoder_lowdelay_P_main.cfg)
            gop_poc = self.poc - self.last_idr_poc
            is_b = False
            if cfg.gop_entries:
                e = cfg.gop_entries[(gop_poc - 1) % len(cfg.gop_entries)]
                qp_off, qf = e.qp_offset, e.qp_factor
                is_b = e.slice_type == "B"
            else:
                qp_off = (3, 2, 3, 1)[(gop_poc - 1) % 4]
                qf = (0.4624, 0.4624, 0.4624, 0.578)[(gop_poc - 1) % 4]
            slice_qp = int(np.clip(base_qp + (0 if self.rc else qp_off),
                                   0, 51))
            stype = SliceType.B if is_b else SliceType.P
            sh = SliceHeader(
                slice_type=stype,
                nal_unit_type=int(NalUnitType.TRAIL_R),
                poc=gop_poc, slice_qp=slice_qp,
                short_term_ref_pic_set_sps_flag=1, rps_sps_idx=0,
                num_ref_idx_active=[1, 1 if is_b else 0],
                slice_sao_luma_flag=1 if cfg.sao else 0,
                slice_sao_chroma_flag=1 if cfg.sao else 0)
            ref_poc = gop_poc - 1
            fe = PFrameEncoder(self.sps, slice_qp, self.dpb_recon,
                               search_range=min(cfg.search_range, 24),
                               qp_factor=qf, is_b=is_b)
            sp = make_slice_params(
                cfg.width, cfg.height, slice_qp,
                slice_type=int(stype),
                ctu_size=self.sps.ctu_size,
                max_tu_depth_intra=self.sps.max_transform_hierarchy_depth_intra,
                num_ref_l0=1, num_ref_l1=1 if is_b else 0,
                ref_poc_l0=[ref_poc], ref_poc_l1=[ref_poc] if is_b else [],
                sao_luma=sh.slice_sao_luma_flag,
                sao_chroma=sh.slice_sao_chroma_flag,
                bit_depth=self.sps.bit_depth_luma)
            senc = SliceDataEncoder(sp)
            fe.senc = senc
            decisions, recon = fe.encode_frame(planes)
            self._ref_pocs = ([ref_poc], [ref_poc] if is_b else [])

        # in-loop deblocking (normative; filtered picture is the hash
        # target and the reference for subsequent frames)
        if not self.pps.pps_deblocking_filter_disabled_flag:
            from ..ops import deblock
            ref_pocs = getattr(self, "_ref_pocs", ((), ())) \
                if not is_intra else ((), ())
            dmaps = deblock.build_maps(decisions, self.sps, ref_pocs)
            deblock.deblock_frame(recon, dmaps, sh.slice_qp, self.sps)

        # SAO: estimate on the deblocked picture, attach per-CTU params so
        # the slice-data coder emits them, apply for the final recon
        if sh.slice_sao_luma_flag or sh.slice_sao_chroma_flag:
            from ..ops import sao as saolib
            lam = 0.57 * (2.0 ** ((sh.slice_qp - 12) / 3.0))
            sao_params = saolib.estimate_sao(planes, recon, self.sps,
                                             self.sps.bit_depth_luma, lam)
            for d, prm in zip(decisions, sao_params):
                d.sao[:] = prm

        ctus_w = self.sps.pic_width_in_ctus
        ctus_h = self.sps.pic_height_in_ctus
        i = 0
        for cy in range(ctus_h):
            for cx in range(ctus_w):
                last = (cy == ctus_h - 1) and (cx == ctus_w - 1)
                senc.encode_ctu(cx, cy, decisions[i], last)
                i += 1
        slice_rbsp = headers.write_slice_header(sh, self.sps, self.pps) \
            + senc.get_bytes()

        if sh.slice_sao_luma_flag or sh.slice_sao_chroma_flag:
            recon = saolib.apply_sao(recon, [d.sao for d in decisions],
                                     self.sps, self.sps.bit_depth_luma)

        nals = []
        firsts = []
        if self.poc == 0:
            nals += [
                nal.rbsp_to_nal(headers.write_vps(self.vps),
                                int(NalUnitType.VPS_NUT)),
                nal.rbsp_to_nal(headers.write_sps(self.sps),
                                int(NalUnitType.SPS_NUT)),
                nal.rbsp_to_nal(headers.write_pps(self.pps),
                                int(NalUnitType.PPS_NUT)),
            ]
            firsts += [True, True, True]
        nals.append(nal.rbsp_to_nal(slice_rbsp, sh.nal_unit_type))
        firsts.append(self.poc != 0)  # slice starts the AU unless PS did
        if self.poc == 0:
            firsts[3] = False
        digest = sei.picture_md5(recon, self.sps.bit_depth_luma)
        nals.append(nal.rbsp_to_nal(sei.write_picture_hash_sei(digest),
                                    int(NalUnitType.SUFFIX_SEI_NUT)))
        firsts.append(False)

        bits = sum(len(x) for x in nals) * 8
        psnr = _psnr(planes, recon, self.sps.bit_depth_luma)
        self.stats.append({"poc": self.poc, "bits": bits, "psnr": psnr,
                           "md5": digest[0].hex(), "qp": sh.slice_qp,
                           "type": "I" if is_intra else str(sh.slice_type.name)})
        if self.rc:
            self.rc.update(bits)
        self.poc += 1
        self.recon = recon
        self.dpb_recon = recon
        return nal.write_annexb(nals, firsts)


def _psnr(orig, recon, bd):
    out = []
    peak = (1 << bd) - 1
    for o, r in zip(orig, recon):
        mse = np.mean((o.astype(np.float64) - r.astype(np.float64)) ** 2)
        out.append(99.99 if mse == 0 else 10 * np.log10(peak * peak / mse))
    return out
