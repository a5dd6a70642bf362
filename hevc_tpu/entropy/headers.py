"""Parameter-set and slice-header RBSP writers (spec 7.3.2/7.3.6).

Parity: reference TEncCavlc.cpp (codeVPS/codeSPS/codePPS/codeSliceHeader) —
transliterated from the spec syntax tables against the dataclasses in
hevc_tpu.core.params.
"""
from __future__ import annotations

import math

from ..core.params import PPS, SPS, VPS, ProfileTierLevel, ShortTermRPS, SliceHeader
from ..core.types import SliceType
from .bitwriter import BitWriter


def write_ptl(bw: BitWriter, ptl: ProfileTierLevel,
              max_sub_layers_minus1: int = 0) -> None:
    bw.u(0, 2)                                  # general_profile_space
    bw.flag(ptl.general_tier_flag)
    bw.u(ptl.general_profile_idc, 5)
    for i in range(32):                         # profile_compatibility_flags
        bw.flag(1 if i == ptl.general_profile_idc else 0)
    bw.flag(ptl.general_progressive_source_flag)
    bw.flag(ptl.general_interlaced_source_flag)
    bw.flag(ptl.general_non_packed_constraint_flag)
    bw.flag(ptl.general_frame_only_constraint_flag)
    if ptl.general_profile_idc in (4, 5):
        # format-range-extensions constraint flags (spec 7.3.3, RExt)
        bw.flag(ptl.general_max_12bit_constraint_flag)
        bw.flag(ptl.general_max_10bit_constraint_flag)
        bw.flag(ptl.general_max_8bit_constraint_flag)
        bw.flag(ptl.general_max_422chroma_constraint_flag)
        bw.flag(ptl.general_max_420chroma_constraint_flag)
        bw.flag(ptl.general_max_monochrome_constraint_flag)
        bw.flag(ptl.general_intra_constraint_flag)
        bw.flag(ptl.general_one_picture_only_constraint_flag)
        bw.flag(ptl.general_lower_bit_rate_constraint_flag)
        bw.u(0, 16)                             # general_reserved_zero_34bits
        bw.u(0, 16)
        bw.u(0, 2)
    else:
        bw.u(0, 16)                             # general_reserved_zero_43bits
        bw.u(0, 16)
        bw.u(0, 11)
    bw.flag(0)                                  # general_reserved_zero_bit
    bw.u(ptl.general_level_idc, 8)
    assert max_sub_layers_minus1 == 0


def write_st_rps(bw: BitWriter, rps: ShortTermRPS, idx: int) -> None:
    if idx != 0:
        bw.flag(0)  # inter_ref_pic_set_prediction_flag (always explicit)
    neg = sorted([d for d in rps.delta_pocs if d < 0], reverse=True)
    pos = sorted([d for d in rps.delta_pocs if d > 0])
    used = {d: u for d, u in zip(rps.delta_pocs, rps.used_flags)}
    bw.ue(len(neg))
    bw.ue(len(pos))
    prev = 0
    for d in neg:
        bw.ue(prev - d - 1)  # delta_poc_s0_minus1
        bw.flag(used.get(d, 1))
        prev = d
    prev = 0
    for d in pos:
        bw.ue(d - prev - 1)  # delta_poc_s1_minus1
        bw.flag(used.get(d, 1))
        prev = d


def write_scaling_list_data(bw: BitWriter, sld) -> None:
    """scaling_list_data (spec 7.3.4; reference TEncCavlc::
    codeScalingList/xCodeScalingList): every present matrix is written in
    DPCM mode over the diagonal scan; the 32x32 chroma entries are
    derived on the decoder side and not coded."""
    from ..core import tables
    for size_id in range(4):
        for list_id in range(6):
            if size_id == 3 and list_id % 3 != 0:
                continue
            flat = sld.lists[size_id][list_id]
            bw.flag(1)                  # scaling_list_pred_mode_flag: DPCM
            n = 4 if size_id == 0 else 8
            next_coef = 8
            if size_id > 1:
                dc = int(sld.dc[size_id][list_id])
                bw.se(dc - 8)           # scaling_list_dc_coef_minus8
                next_coef = dc
            scan = tables.diag_scan(n)
            for i in range(n * n):
                x, y = scan[i]
                v = int(flat[y * n + x])
                d = (v - next_coef) % 256   # scaling_list_delta_coef
                bw.se(d - 256 if d > 127 else d)
                next_coef = v


def write_vps(vps: VPS) -> bytes:
    bw = BitWriter()
    bw.u(vps.vps_video_parameter_set_id, 4)
    bw.u(3, 2)                                  # vps_reserved_three_2bits
    bw.u(0, 6)                                  # vps_max_layers_minus1
    bw.u(vps.vps_max_sub_layers_minus1, 3)
    bw.flag(vps.vps_temporal_id_nesting_flag)
    bw.u(0xFFFF, 16)                            # vps_reserved_0xffff_16bits
    write_ptl(bw, vps.ptl, vps.vps_max_sub_layers_minus1)
    bw.flag(1)                                  # vps_sub_layer_ordering_info_present
    for _ in range(vps.vps_max_sub_layers_minus1 + 1):
        bw.ue(vps.vps_max_dec_pic_buffering_minus1)
        bw.ue(vps.vps_max_num_reorder_pics)
        bw.ue(vps.vps_max_latency_increase_plus1)
    bw.u(0, 6)                                  # vps_max_layer_id
    bw.ue(0)                                    # vps_num_layer_sets_minus1
    bw.flag(0)                                  # vps_timing_info_present_flag
    bw.flag(0)                                  # vps_extension_flag
    bw.byte_align()
    return bw.bytes()


def write_sps(sps: SPS) -> bytes:
    bw = BitWriter()
    bw.u(sps.sps_video_parameter_set_id, 4)
    bw.u(sps.sps_max_sub_layers_minus1, 3)
    bw.flag(sps.sps_temporal_id_nesting_flag)
    write_ptl(bw, sps.ptl, sps.sps_max_sub_layers_minus1)
    bw.ue(sps.sps_seq_parameter_set_id)
    bw.ue(sps.chroma_format_idc)
    if sps.chroma_format_idc == 3:
        bw.flag(0)                              # separate_colour_plane_flag
    bw.ue(sps.pic_width_in_luma_samples)
    bw.ue(sps.pic_height_in_luma_samples)
    bw.flag(sps.conformance_window_flag)
    if sps.conformance_window_flag:
        bw.ue(sps.conf_win_left_offset)
        bw.ue(sps.conf_win_right_offset)
        bw.ue(sps.conf_win_top_offset)
        bw.ue(sps.conf_win_bottom_offset)
    bw.ue(sps.bit_depth_luma_minus8)
    bw.ue(sps.bit_depth_chroma_minus8)
    bw.ue(sps.log2_max_pic_order_cnt_lsb_minus4)
    bw.flag(1)                                  # sps_sub_layer_ordering_info_present
    for _ in range(sps.sps_max_sub_layers_minus1 + 1):
        bw.ue(sps.sps_max_dec_pic_buffering_minus1)
        bw.ue(sps.sps_max_num_reorder_pics)
        bw.ue(sps.sps_max_latency_increase_plus1)
    bw.ue(sps.log2_min_luma_coding_block_size_minus3)
    bw.ue(sps.log2_diff_max_min_luma_coding_block_size)
    bw.ue(sps.log2_min_luma_transform_block_size_minus2)
    bw.ue(sps.log2_diff_max_min_luma_transform_block_size)
    bw.ue(sps.max_transform_hierarchy_depth_inter)
    bw.ue(sps.max_transform_hierarchy_depth_intra)
    bw.flag(sps.scaling_list_enabled_flag)
    if sps.scaling_list_enabled_flag:
        if sps.scaling_list_data is not None:
            bw.flag(1)      # sps_scaling_list_data_present (explicit)
            write_scaling_list_data(bw, sps.scaling_list_data)
        else:
            bw.flag(0)      # use the spec default matrices
    bw.flag(sps.amp_enabled_flag)
    bw.flag(sps.sample_adaptive_offset_enabled_flag)
    bw.flag(sps.pcm_enabled_flag)
    if sps.pcm_enabled_flag:
        bw.u(sps.pcm_sample_bit_depth_luma_minus1, 4)
        bw.u(sps.pcm_sample_bit_depth_chroma_minus1, 4)
        bw.ue(sps.log2_min_pcm_luma_coding_block_size_minus3)
        bw.ue(sps.log2_diff_max_min_pcm_luma_coding_block_size)
        bw.flag(sps.pcm_loop_filter_disabled_flag)
    bw.ue(len(sps.short_term_rps))
    for i, rps in enumerate(sps.short_term_rps):
        write_st_rps(bw, rps, i)
    bw.flag(sps.long_term_ref_pics_present_flag)
    bw.flag(sps.sps_temporal_mvp_enabled_flag)
    bw.flag(sps.strong_intra_smoothing_enabled_flag)
    _sps_rext_on = (sps.transform_skip_rotation_enabled_flag
                    or sps.transform_skip_context_enabled_flag
                    or sps.implicit_rdpcm_enabled_flag
                    or sps.explicit_rdpcm_enabled_flag
                    or sps.persistent_rice_adaptation_enabled_flag
                    or sps.cabac_bypass_alignment_enabled_flag)
    bw.flag(sps.vui_parameters_present_flag)
    if sps.vui_parameters_present_flag:
        write_vui(bw, sps)
    if _sps_rext_on:
        # sps_range_extension (spec 7.3.2.2.2; mirrors the parse in
        # decoder/headers.py)
        bw.flag(1)                              # sps_extension_present
        bw.flag(1)                              # sps_range_extension_flag
        bw.flag(0)                              # multilayer
        bw.flag(0)                              # 3d
        bw.flag(0)                              # scc
        bw.u(0, 4)                              # sps_extension_4bits
        bw.flag(sps.transform_skip_rotation_enabled_flag)
        bw.flag(sps.transform_skip_context_enabled_flag)
        bw.flag(sps.implicit_rdpcm_enabled_flag)
        bw.flag(sps.explicit_rdpcm_enabled_flag)
        bw.flag(sps.extended_precision_processing_flag)
        bw.flag(sps.intra_smoothing_disabled_flag)
        bw.flag(sps.high_precision_offsets_enabled_flag)
        bw.flag(sps.persistent_rice_adaptation_enabled_flag)
        bw.flag(sps.cabac_bypass_alignment_enabled_flag)
    else:
        bw.flag(0)                              # sps_extension_present_flag
    bw.byte_align()
    return bw.bytes()


def write_vui(bw: BitWriter, sps: SPS) -> None:
    """vui_parameters (spec E.2.1; reference TEncCavlc::codeVUI): the
    flat SPS subset (field sequence / frame-field info / timing) plus
    every optional group carried by sps.vui_ext (aspect ratio, overscan,
    video signal type + colour description, chroma location, default
    display window, bitstream restriction — reference TAppEncCfg's VUI
    option block)."""
    from ..core.params import VuiExt
    v = sps.vui_ext or VuiExt()
    bw.flag(v.aspect_ratio_info_present_flag)
    if v.aspect_ratio_info_present_flag:
        bw.u(v.aspect_ratio_idc, 8)
        if v.aspect_ratio_idc == 255:        # EXTENDED_SAR
            bw.u(v.sar_width, 16)
            bw.u(v.sar_height, 16)
    bw.flag(v.overscan_info_present_flag)
    if v.overscan_info_present_flag:
        bw.flag(v.overscan_appropriate_flag)
    bw.flag(v.video_signal_type_present_flag)
    if v.video_signal_type_present_flag:
        bw.u(v.video_format, 3)
        bw.flag(v.video_full_range_flag)
        bw.flag(v.colour_description_present_flag)
        if v.colour_description_present_flag:
            bw.u(v.colour_primaries, 8)
            bw.u(v.transfer_characteristics, 8)
            bw.u(v.matrix_coeffs, 8)
    bw.flag(v.chroma_loc_info_present_flag)
    if v.chroma_loc_info_present_flag:
        bw.ue(v.chroma_sample_loc_type_top_field)
        bw.ue(v.chroma_sample_loc_type_bottom_field)
    bw.flag(v.neutral_chroma_indication_flag)
    bw.flag(sps.vui_field_seq_flag)
    bw.flag(sps.vui_frame_field_info_present_flag)
    bw.flag(v.default_display_window_flag)
    if v.default_display_window_flag:
        bw.ue(v.def_disp_win_left_offset)
        bw.ue(v.def_disp_win_right_offset)
        bw.ue(v.def_disp_win_top_offset)
        bw.ue(v.def_disp_win_bottom_offset)
    bw.flag(sps.vui_timing_info_present_flag)
    if sps.vui_timing_info_present_flag:
        bw.u(sps.vui_num_units_in_tick, 32)
        bw.u(sps.vui_time_scale, 32)
        bw.flag(v.poc_proportional_to_timing_flag)
        if v.poc_proportional_to_timing_flag:
            bw.ue(v.num_ticks_poc_diff_one_minus1)
        hrd = getattr(sps, "hrd", None)
        bw.flag(1 if hrd else 0)     # vui_hrd_parameters_present_flag
        if hrd:
            write_hrd_parameters(bw, hrd)
    bw.flag(v.bitstream_restriction_flag)
    if v.bitstream_restriction_flag:
        bw.flag(v.tiles_fixed_structure_flag)
        bw.flag(v.motion_vectors_over_pic_boundaries_flag)
        bw.flag(v.restricted_ref_pic_lists_flag)
        bw.ue(v.min_spatial_segmentation_idc)
        bw.ue(v.max_bytes_per_pic_denom)
        bw.ue(v.max_bits_per_min_cu_denom)
        bw.ue(v.log2_max_mv_length_horizontal)
        bw.ue(v.log2_max_mv_length_vertical)


def write_hrd_parameters(bw: BitWriter, hrd) -> None:
    """hrd_parameters (spec E.2.2; reference TEncCavlc::codeHrdParameters)
    — one sub-layer, NAL HRD only, fixed pic rate."""
    sub = getattr(hrd, "sub_pic", 0)
    bw.flag(1)                       # nal_hrd_parameters_present_flag
    bw.flag(0)                       # vcl_hrd_parameters_present_flag
    bw.flag(1 if sub else 0)         # sub_pic_hrd_params_present_flag
    if sub:
        # decoding-unit level CPB operation (reference setHrdParameters
        # sub-pic branch: tick divisor 100, 8-bit DU removal delays)
        bw.u(hrd.tick_divisor_minus2, 8)
        bw.u(hrd.du_cpb_removal_delay_length_minus1, 5)
        bw.flag(hrd.sub_pic_cpb_params_in_pic_timing_sei_flag)
        bw.u(hrd.dpb_output_delay_du_length_minus1, 5)
    bw.u(hrd.bit_rate_scale, 4)
    bw.u(hrd.cpb_size_scale, 4)
    if sub:
        bw.u(hrd.cpb_size_du_scale, 4)
    bw.u(hrd.initial_cpb_removal_delay_length_minus1, 5)
    bw.u(hrd.au_cpb_removal_delay_length_minus1, 5)
    bw.u(hrd.dpb_output_delay_length_minus1, 5)
    # one temporal sub-layer
    bw.flag(1)                       # fixed_pic_rate_general_flag
    bw.ue(0)                         # elemental_duration_in_tc_minus1
    bw.ue(0)                         # cpb_cnt_minus1
    bw.ue(hrd.bit_rate_value_minus1)
    bw.ue(hrd.cpb_size_value_minus1)
    if sub:                          # spec E.2.3 sub_layer_hrd_parameters
        bw.ue(hrd.cpb_size_du_value_minus1)
        bw.ue(hrd.bit_rate_du_value_minus1)
    bw.flag(0)                       # cbr_flag


def write_pps(pps: PPS) -> bytes:
    bw = BitWriter()
    bw.ue(pps.pps_pic_parameter_set_id)
    bw.ue(pps.pps_seq_parameter_set_id)
    bw.flag(pps.dependent_slice_segments_enabled_flag)
    bw.flag(pps.output_flag_present_flag)
    bw.u(pps.num_extra_slice_header_bits, 3)
    bw.flag(pps.sign_data_hiding_enabled_flag)
    bw.flag(pps.cabac_init_present_flag)
    bw.ue(pps.num_ref_idx_l0_default_active_minus1)
    bw.ue(pps.num_ref_idx_l1_default_active_minus1)
    bw.se(pps.init_qp_minus26)
    bw.flag(pps.constrained_intra_pred_flag)
    bw.flag(pps.transform_skip_enabled_flag)
    bw.flag(pps.cu_qp_delta_enabled_flag)
    if pps.cu_qp_delta_enabled_flag:
        bw.ue(pps.diff_cu_qp_delta_depth)
    bw.se(pps.pps_cb_qp_offset)
    bw.se(pps.pps_cr_qp_offset)
    bw.flag(pps.pps_slice_chroma_qp_offsets_present_flag)
    bw.flag(pps.weighted_pred_flag)
    bw.flag(pps.weighted_bipred_flag)
    bw.flag(pps.transquant_bypass_enabled_flag)
    bw.flag(pps.tiles_enabled_flag)
    bw.flag(pps.entropy_coding_sync_enabled_flag)
    if pps.tiles_enabled_flag:
        bw.ue(pps.num_tile_columns_minus1)
        bw.ue(pps.num_tile_rows_minus1)
        bw.flag(1)                              # uniform_spacing_flag
        bw.flag(1)                # loop_filter_across_tiles_enabled_flag
    bw.flag(pps.pps_loop_filter_across_slices_enabled_flag)
    bw.flag(pps.deblocking_filter_control_present_flag)
    if pps.deblocking_filter_control_present_flag:
        bw.flag(pps.deblocking_filter_override_enabled_flag)
        bw.flag(pps.pps_deblocking_filter_disabled_flag)
        if not pps.pps_deblocking_filter_disabled_flag:
            bw.se(pps.pps_beta_offset_div2)
            bw.se(pps.pps_tc_offset_div2)
    bw.flag(pps.pps_scaling_list_data_present_flag)
    bw.flag(pps.lists_modification_present_flag)
    bw.ue(pps.log2_parallel_merge_level_minus2)
    bw.flag(pps.slice_segment_header_extension_present_flag)
    if pps.cross_component_prediction_enabled_flag:
        # pps_range_extension (spec 7.3.3.3.1; mirrors the parse in
        # decoder/headers.py)
        bw.flag(1)                              # pps_extension_present_flag
        bw.flag(1)                              # pps_range_extension_flag
        bw.flag(0); bw.flag(0); bw.flag(0)      # multilayer / 3d / scc
        bw.u(0, 4)                              # pps_extension_4bits
        if pps.transform_skip_enabled_flag:
            bw.ue(pps.log2_max_transform_skip_block_size_minus2)
        bw.flag(1)             # cross_component_prediction_enabled_flag
        bw.flag(0)             # chroma_qp_offset_list_enabled_flag
        bw.ue(0)               # log2_sao_offset_scale_luma
        bw.ue(0)               # log2_sao_offset_scale_chroma
    else:
        bw.flag(0)                              # pps_extension_present_flag
    bw.byte_align()
    return bw.bytes()


def write_slice_header(sh: SliceHeader, sps: SPS, pps: PPS) -> bytes:
    bw = BitWriter()
    bw.flag(sh.first_slice_segment_in_pic_flag)
    nal = sh.nal_unit_type
    if 16 <= nal <= 23:  # IRAP
        bw.flag(sh.no_output_of_prior_pics_flag)
    bw.ue(sh.slice_pic_parameter_set_id)
    if not sh.first_slice_segment_in_pic_flag:
        if pps.dependent_slice_segments_enabled_flag:
            bw.flag(sh.dependent_slice_segment_flag)
        # slice_segment_address, u(ceil(log2(PicSizeInCtbsY)))
        ctu = sps.ctu_size
        ctus = (-(-sps.pic_width_in_luma_samples // ctu)
                * -(-sps.pic_height_in_luma_samples // ctu))
        bw.u(sh.slice_segment_address,
             max(1, math.ceil(math.log2(ctus))))
    if sh.dependent_slice_segment_flag:
        # short header (spec 7.3.6.1): entry points / alignment only
        if (pps.tiles_enabled_flag
                or pps.entropy_coding_sync_enabled_flag):
            offs = sh.entry_point_offsets
            bw.ue(len(offs))
            if offs:
                maxlen = max(o.bit_length() for o in offs)
                bw.ue(maxlen - 1)
                for o in offs:
                    bw.u(o - 1, maxlen)
        bw.u(1, 1)
        bw.align_zero()
        return bw.bytes()
    bw.ue(int(sh.slice_type))
    if pps.output_flag_present_flag:
        bw.flag(1)
    is_idr = nal in (19, 20)
    if not is_idr:
        max_poc_lsb = 1 << (sps.log2_max_pic_order_cnt_lsb_minus4 + 4)
        bw.u(sh.poc % max_poc_lsb, sps.log2_max_pic_order_cnt_lsb_minus4 + 4)
        if sh.short_term_ref_pic_set_sps_flag:
            bw.flag(1)
            n = len(sps.short_term_rps)
            if n > 1:
                bw.u(sh.rps_sps_idx, max(1, math.ceil(math.log2(n))))
        else:
            bw.flag(0)
            write_st_rps(bw, sh.rps, len(sps.short_term_rps))
        if sps.sps_temporal_mvp_enabled_flag:
            bw.flag(sh.slice_temporal_mvp_enabled_flag)
    if sps.sample_adaptive_offset_enabled_flag:
        bw.flag(sh.slice_sao_luma_flag)
        if sps.chroma_format_idc != 0:  # ChromaArrayType != 0 (7.3.6.1)
            bw.flag(sh.slice_sao_chroma_flag)
    if sh.slice_type != SliceType.I:
        default_active = [pps.num_ref_idx_l0_default_active_minus1 + 1,
                          pps.num_ref_idx_l1_default_active_minus1 + 1]
        lists = [0] + ([1] if sh.slice_type == SliceType.B else [])
        override = any(sh.num_ref_idx_active[l] != default_active[l]
                       for l in lists)
        bw.flag(override)
        if override:
            for l in lists:
                bw.ue(sh.num_ref_idx_active[l] - 1)
        if sh.slice_type == SliceType.B:
            bw.flag(sh.mvd_l1_zero_flag)
        if pps.cabac_init_present_flag:
            bw.flag(sh.cabac_init_flag)
        if sh.slice_temporal_mvp_enabled_flag:
            if sh.slice_type == SliceType.B:
                bw.flag(sh.collocated_from_l0_flag)
            lidx = 0 if sh.collocated_from_l0_flag else 1
            if sh.num_ref_idx_active[lidx] > 1:
                bw.ue(sh.collocated_ref_idx)
        if ((pps.weighted_pred_flag and sh.slice_type == SliceType.P)
                or (pps.weighted_bipred_flag
                    and sh.slice_type == SliceType.B)):
            # pred_weight_table (spec 7.3.6.3; reference TEncCavlc
            # xCodePredWeightTable): per-ref explicit luma + chroma
            # weight sets for list 0 (sh.wp_l0; legacy single-set
            # fields drive ref 0 when it is empty) and, for B slices,
            # list 1 (sh.wp_l1)
            bw.ue(sh.wp_log2_denom)             # luma_log2_weight_denom
            cden = sh.wp_chroma_log2_denom
            if sps.chroma_format_idc != 0:
                bw.se(cden - sh.wp_log2_denom)  # delta_chroma_log2_denom

            def wp_sets_of(lx):
                n = sh.num_ref_idx_active[lx]
                tab = sh.wp_l0 if lx == 0 else getattr(sh, "wp_l1", ())
                sets = [tab[r] if r < len(tab) else None for r in range(n)]
                if (lx == 0 and not sh.wp_l0
                        and (sh.wp_luma_flag or sh.wp_chroma_flag)):
                    sets[0] = (
                        (sh.wp_weight, sh.wp_offset) if sh.wp_luma_flag
                        else None,
                        sh.wp_chroma if sh.wp_chroma_flag else None)
                return n, sets

            def write_list(lx):
                n, sets = wp_sets_of(lx)
                for r in range(n):
                    bw.flag(1 if (sets[r] and sets[r][0]) else 0)
                if sps.chroma_format_idc != 0:
                    for r in range(n):
                        bw.flag(1 if (sets[r] and sets[r][1]) else 0)
                for r in range(n):
                    if sets[r] and sets[r][0]:
                        w, o = sets[r][0]
                        bw.se(w - (1 << sh.wp_log2_denom))
                        bw.se(o)
                    if (sps.chroma_format_idc != 0 and sets[r]
                            and sets[r][1]):
                        for (cw, co) in sets[r][1]:
                            bw.se(cw - (1 << cden))
                            # delta_chroma_offset vs the DC-preserving
                            # prediction (spec 7.4.7.3)
                            pred = 128 - ((128 * cw) >> cden)
                            bw.se(co - pred)

            write_list(0)
            if sh.slice_type == SliceType.B:
                write_list(1)
        bw.ue(sh.five_minus_max_num_merge_cand)
    bw.se(sh.slice_qp - 26 - pps.init_qp_minus26)
    if pps.pps_slice_chroma_qp_offsets_present_flag:
        bw.se(sh.slice_cb_qp_offset)
        bw.se(sh.slice_cr_qp_offset)
    if pps.deblocking_filter_control_present_flag:
        if pps.deblocking_filter_override_enabled_flag:
            bw.flag(0)  # deblocking_filter_override_flag
    # effective per-slice deblocking state inherits from the PPS when no
    # override is signalled (spec 7.4.7.1)
    deblock_disabled = (sh.slice_deblocking_filter_disabled_flag
                        or pps.pps_deblocking_filter_disabled_flag)
    if (pps.pps_loop_filter_across_slices_enabled_flag
            and (sh.slice_sao_luma_flag or sh.slice_sao_chroma_flag
                 or not deblock_disabled)):
        bw.flag(sh.slice_loop_filter_across_slices_enabled_flag)
    if pps.tiles_enabled_flag or pps.entropy_coding_sync_enabled_flag:
        offs = sh.entry_point_offsets
        bw.ue(len(offs))                        # num_entry_point_offsets
        if offs:
            maxlen = max(o.bit_length() for o in offs)
            bw.ue(maxlen - 1)                   # offset_len_minus1
            for o in offs:
                bw.u(o - 1, maxlen)             # entry_point_offset_minus1
    # byte_alignment() at the end of the slice header
    bw.u(1, 1)
    bw.align_zero()
    return bw.bytes()
