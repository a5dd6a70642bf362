"""HM-compatible configuration system.

Parity: reference TAppCommon/program_options_lite.{h,cpp} (typed Option<T>
registry, `Key : value` config files with '#' comments, layered `-c a.cfg -c
b.cfg --Override=v` CLI) and TAppEncoder/TAppEncCfg.cpp's option table +
per-GOP-entry `FrameN: Type POC QPoffset ...` rows. The reference's standard
cfg files under cfg/ parse unmodified; the `OpenCL`/`OpenCLDevice`/
`KernelOpenCL` keys map to this framework's `UseTPU` switch.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional


@dataclasses.dataclass
class GOPEntry:
    """One row of the GOP structure table (parity: TEncCfg.h GOPEntry)."""
    slice_type: str = "P"
    poc: int = 0
    qp_offset: int = 0
    qp_factor: float = 1.0
    tc_offset_div2: int = 0
    beta_offset_div2: int = 0
    temporal_id: int = 0
    num_ref_pics_active: int = 1
    num_ref_pics: int = 0
    reference_pics: List[int] = dataclasses.field(default_factory=list)
    inter_rps_prediction: int = 0
    delta_rps: int = 0
    num_ref_idcs: int = 0
    ref_idcs: List[int] = dataclasses.field(default_factory=list)


def parse_gop_entry(tokens: List[str]) -> GOPEntry:
    e = GOPEntry()
    e.slice_type = tokens[0]
    e.poc = int(tokens[1])
    e.qp_offset = int(tokens[2])
    e.qp_factor = float(tokens[3])
    e.tc_offset_div2 = int(tokens[4])
    e.beta_offset_div2 = int(tokens[5])
    e.temporal_id = int(tokens[6])
    e.num_ref_pics_active = int(tokens[7])
    e.num_ref_pics = int(tokens[8])
    idx = 9
    e.reference_pics = [int(t) for t in tokens[idx:idx + e.num_ref_pics]]
    idx += e.num_ref_pics
    if idx < len(tokens):
        e.inter_rps_prediction = int(tokens[idx]); idx += 1
        if e.inter_rps_prediction:
            e.delta_rps = int(tokens[idx]); idx += 1
            e.num_ref_idcs = int(tokens[idx]); idx += 1
            e.ref_idcs = [int(t) for t in tokens[idx:idx + e.num_ref_idcs]]
    return e


# Maps every cfg key we honour to (attribute, type). Keys present in HM cfgs
# but not yet meaningful here are listed in _IGNORED so parsing never fails
# on a standard file.
_OPTION_TABLE = {
    "InputFile": ("input_file", str),
    "BitstreamFile": ("bitstream_file", str),
    "ReconFile": ("recon_file", str),
    "SourceWidth": ("width", int),
    "SourceHeight": ("height", int),
    "InputBitDepth": ("input_bit_depth", int),
    "OutputBitDepth": ("output_bit_depth", int),
    "InternalBitDepth": ("internal_bit_depth", int),
    "InputChromaFormat": ("chroma_format", int),
    "FrameRate": ("frame_rate", int),
    "FrameSkip": ("frame_skip", int),
    "FramesToBeEncoded": ("frames_to_encode", int),
    "Profile": ("profile", str),
    "Level": ("level", float),
    "MaxCUWidth": ("ctu_size", int),
    "MaxCUHeight": ("ctu_size", int),
    "MaxPartitionDepth": ("max_part_depth", int),
    "QuadtreeTULog2MaxSize": ("tu_log2_max", int),
    "QuadtreeTULog2MinSize": ("tu_log2_min", int),
    "QuadtreeTUMaxDepthInter": ("tu_depth_inter", int),
    "QuadtreeTUMaxDepthIntra": ("tu_depth_intra", int),
    "IntraPeriod": ("intra_period", int),
    "DecodingRefreshType": ("decoding_refresh_type", int),
    "SEIDecodedPictureHash": ("hash_sei_type", int),
    "SEIBufferingPeriod": ("sei_buffering_period", int),
    "SEIDecodingUnitInfo": ("sei_decoding_unit_info", int),
    "SEIPictureTiming": ("sei_pic_timing", int),
    # extended SEI payload surface (reference TAppEncCfg.cpp:948-1060)
    "SEIToneMappingInfo": ("sei_tone_mapping", int),
    "SEIToneMapId": ("sei_tone_map_id", int),
    "SEIToneMapCancelFlag": ("sei_tone_map_cancel", int),
    "SEIToneMapPersistenceFlag": ("sei_tone_map_persistence", int),
    "SEIToneMapCodedDataBitDepth": ("sei_tone_map_coded_depth", int),
    "SEIToneMapTargetBitDepth": ("sei_tone_map_target_depth", int),
    "SEIToneMapModelId": ("sei_tone_map_model", int),
    "SEIToneMapMinValue": ("sei_tone_map_min", int),
    "SEIToneMapMaxValue": ("sei_tone_map_max", int),
    "SEIToneMapSigmoidMidpoint": ("sei_tone_map_sigmoid_mid", int),
    "SEIToneMapSigmoidWidth": ("sei_tone_map_sigmoid_width", int),
    "SEIFramePacking": ("sei_frame_packing", int),
    "SEIFramePackingType": ("sei_frame_packing_type", int),
    "SEIFramePackingId": ("sei_frame_packing_id", int),
    "SEIFramePackingQuincunx": ("sei_frame_packing_quincunx", int),
    "SEIFramePackingInterpretation": ("sei_frame_packing_interp", int),
    "SEISegmentedRectFramePacking": ("sei_segrect_frame_packing", int),
    "SEISegmentedRectFramePackingCancel":
        ("sei_segrect_frame_packing_cancel", int),
    "SEISegmentedRectFramePackingType":
        ("sei_segrect_frame_packing_type", int),
    "SEISegmentedRectFramePackingPersistence":
        ("sei_segrect_frame_packing_persist", int),
    "SEIDisplayOrientation": ("sei_display_orientation", int),
    "SEITemporalLevel0Index": ("sei_temporal_level0_index", int),
    "SEIGradualDecodingRefreshInfo": ("sei_gdr_info", int),
    "SEITempMotionConstrainedTileSets": ("sei_tmcts", int),
    "SEINoDisplay": ("sei_no_display", int),
    "SEISOPDescription": ("sei_sop_description", int),
    "SEIScalableNesting": ("sei_scalable_nesting", int),
    "SEITimeCodeEnabled": ("sei_time_code", int),
    "SEITimeCodeNumClockTs": ("sei_time_code_num_ts", int),
    "SEIMasteringDisplayColourVolume": ("sei_mastering_display", int),
    "SEIMasteringDisplayMaxLuminance": ("sei_mastering_max_lum", int),
    "SEIMasteringDisplayMinLuminance": ("sei_mastering_min_lum", int),
    "SEIMasteringDisplayPrimaries": ("sei_mastering_primaries", str),
    "SEIMasteringDisplayWhitePoint": ("sei_mastering_white_point", str),
    "SEIKneeFunctionInfo": ("sei_knee_function", int),
    "SEIKneeFunctionId": ("sei_knee_id", int),
    "SEIKneeFunctionCancelFlag": ("sei_knee_cancel", int),
    "SEIKneeFunctionPersistenceFlag": ("sei_knee_persistence", int),
    "SEIKneeFunctionInputDrange": ("sei_knee_input_drange", int),
    "SEIKneeFunctionInputDispLuminance": ("sei_knee_input_lum", int),
    "SEIKneeFunctionOutputDrange": ("sei_knee_output_drange", int),
    "SEIKneeFunctionOutputDispLuminance": ("sei_knee_output_lum", int),
    "SEIKneeFunctionNumKneePointsMinus1": ("sei_knee_points_minus1", int),
    "SEIKneeFunctionInputKneePointValue": ("sei_knee_input_points", str),
    "SEIKneeFunctionOutputKneePointValue": ("sei_knee_output_points", str),
    "SEIChromaSamplingFilterHint": ("sei_chroma_filter_hint", int),
    "SEIChromaSamplingHorizontalFilterType":
        ("sei_chroma_filter_hor", int),
    "SEIChromaSamplingVerticalFilterType":
        ("sei_chroma_filter_ver", int),
    "GOPSize": ("gop_size", int),
    "QP": ("qp", int),
    "SearchRange": ("search_range", int),
    "BipredSearchRange": ("bipred_search_range", int),
    "FastSearch": ("fast_search", int),
    "HadamardME": ("hadamard_me", int),
    "SAO": ("sao", int),
    "AMP": ("amp", int),
    "TransformSkip": ("transform_skip", int),
    "AdaptiveQP": ("adaptive_qp", int),
    "AQ": ("adaptive_qp", int),
    "MaxQPAdaptationRange": ("qp_adaptation_range", int),
    "MaxCuDQPDepth": ("max_cu_dqp_depth", int),
    "LCULevelRateControl": ("lcu_rate_control", int),
    "FieldCoding": ("field_coding", int),
    "TopFieldFirst": ("top_field_first", int),
    "VuiParametersPresent": ("vui", int),
    "PCMEnabledFlag": ("pcm", int),
    "RDOQ": ("rdoq", int),
    "RDOQTS": ("rdoq_ts", int),
    "LoopFilterDisable": ("deblock_disable", int),
    "LoopFilterBetaOffset_div2": ("deblock_beta_offset", int),
    "LoopFilterTcOffset_div2": ("deblock_tc_offset", int),
    "WaveFrontSynchro": ("wpp", int),
    "WeightedPredP": ("weighted_pred_p", int),
    "WeightedPredB": ("weighted_pred_b", int),
    "TMVPMode": ("tmvp", int),
    "NumTileColumnsMinus1": ("tile_cols_minus1", int),
    "NumTileRowsMinus1": ("tile_rows_minus1", int),
    "SignHideFlag": ("sign_hide", int),
    "SignDataHidingEnabled": ("sign_hide", int),
    "RateControl": ("rate_control", int),
    "TargetBitrate": ("target_bitrate", int),
    "ScalingList": ("scaling_list", int),
    "TransformSkip": ("transform_skip", int),
    "AdaptiveQP": ("adaptive_qp", int),
    "AQ": ("adaptive_qp", int),
    "MaxQPAdaptationRange": ("qp_adaptation_range", int),
    "MaxCuDQPDepth": ("max_cu_dqp_depth", int),
    "LCULevelRateControl": ("lcu_rate_control", int),
    "FieldCoding": ("field_coding", int),
    "TopFieldFirst": ("top_field_first", int),
    "VuiParametersPresent": ("vui", int),
    "PCMEnabledFlag": ("pcm", int),
    "TemporalSubsampleRatio": ("temporal_subsample", int),
    "ConformanceWindowMode": ("conformance_window_mode", int),
    "ConformanceMode": ("conformance_window_mode", int),
    "HorizontalPad": ("horizontal_pad", int),
    "VerticalPad": ("vertical_pad", int),
    # explicit conformance window (mode 3); ConfLeft etc. are the
    # reference's deprecated spellings of ConfWin* (TAppEncCfg.cpp)
    "ConfWinLeft": ("conf_win_left", int),
    "ConfWinRight": ("conf_win_right", int),
    "ConfWinTop": ("conf_win_top", int),
    "ConfWinBottom": ("conf_win_bottom", int),
    "ConfLeft": ("conf_win_left", int),
    "ConfRight": ("conf_win_right", int),
    "ConfTop": ("conf_win_top", int),
    "ConfBottom": ("conf_win_bottom", int),
    # Reference GPU keys → TPU switch (parity TAppEncCfg.cpp:1049-1051).
    "OpenCL": ("use_tpu", int),
    "UseTPU": ("use_tpu", int),
    "OpenCLDevice": ("tpu_device", int),
    "KernelOpenCL": ("_ignored_kernel_path", str),
    # reference-GPU-mode ME reproduction (SURVEY §7 "documented third
    # point"): per-CTU 593-partition full-search tables computed once at
    # the 64x64 2Nx2N predictor and reused by every sub-PU — the
    # MCV-Univalle fork's OpenCL search semantics
    # (TEncSearch.cpp:3743-3770, cl/sad.cl; see ops/me_gpu_mode.py)
    "GPUModeME": ("gpu_mode_me", int),
    "ReferenceGPUMode": ("gpu_mode_me", int),
    # validated surface (rejected by validate() outside supported values)
    "SliceMode": ("slice_mode", int),
    "SliceArgument": ("slice_argument", int),
    "SliceSegmentMode": ("slice_segment_mode", int),
    "SliceSegmentArgument": ("slice_segment_argument", int),
    "ScalingListFile": ("scaling_list_file", str),
    "Tier": ("tier", str),
    "MaxNumMergeCand": ("max_merge_cand", int),
    "CbQpOffset": ("cb_qp_offset", int),
    "CrQpOffset": ("cr_qp_offset", int),
    "DeltaQpRD": ("delta_qp_rd", int),
    "MaxDeltaQP": ("max_delta_qp", int),
    "CUTransquantBypassFlagForce": ("tq_bypass_force", int),
    "TransquantBypassEnableFlag": ("tq_bypass_enable", int),
    "CrossComponentPrediction": ("cross_comp_pred", int),
    "ExtendedPrecision": ("extended_precision", int),
    "HighPrecisionPredictionWeighting": ("high_prec_wp", int),
    "ImplicitResidualDPCM": ("implicit_rdpcm", int),
    "ExplicitResidualDPCM": ("explicit_rdpcm", int),
    "ResidualRotation": ("residual_rotation", int),
    "GolombRiceParameterAdaptation": ("rice_adaptation", int),
    "AlignCABACBeforeBypass": ("align_cabac_bypass", int),
    "SingleSignificanceMapContext": ("single_sig_ctx", int),
    "IntraReferenceSmoothing": ("intra_ref_smoothing", int),
    "SAOLcuBoundary": ("sao_lcu_boundary", int),
    "TransformSkipLog2MaxSize": ("ts_log2_max", int),
    "TransformSkipFast": ("ts_fast", int),
    "PCMLog2MaxSize": ("pcm_log2_max", int),
    "PCMLog2MinSize": ("pcm_log2_min", int),
    "PCMInputBitDepthFlag": ("pcm_input_bd", int),
    "PCMFilterDisableFlag": ("pcm_filter_disable", int),
    "LoopFilterOffsetInPPS": ("lf_offset_in_pps", int),
    "DeblockingFilterMetric": ("deblock_metric", int),
    "DeblockingFilterControlPresent": ("deblock_control_present", int),
    "LFCrossSliceBoundaryFlag": ("lf_cross_slice", int),
    "LFCrossTileBoundaryFlag": ("lf_cross_tile", int),
    "TileUniformSpacing": ("tile_uniform", int),
    "UniformSpacingIdc": ("tile_uniform", int),
    "ColumnWidthArray": ("tile_col_widths", str),
    "RowHeightArray": ("tile_row_heights", str),
    "TileColumnWidthArray": ("tile_col_widths", str),
    "TileRowHeightArray": ("tile_row_heights", str),
    # VUI option block (reference TAppEncCfg VUI section; annex E.2.1)
    "AspectRatioInfoPresent": ("vui_aspect_ratio_present", int),
    "AspectRatioIdc": ("vui_aspect_ratio_idc", int),
    "SarWidth": ("vui_sar_width", int),
    "SarHeight": ("vui_sar_height", int),
    "OverscanInfoPresent": ("vui_overscan_present", int),
    "OverscanAppropriate": ("vui_overscan_appropriate", int),
    "VideoSignalTypePresent": ("vui_video_signal_present", int),
    "VideoFormat": ("vui_video_format", int),
    "VideoFullRange": ("vui_video_full_range", int),
    "ColourDescriptionPresent": ("vui_colour_desc_present", int),
    "ColourPrimaries": ("vui_colour_primaries", int),
    "TransferCharacteristics": ("vui_transfer_characteristics", int),
    "MatrixCoefficients": ("vui_matrix_coefficients", int),
    "ChromaLocInfoPresent": ("vui_chroma_loc_present", int),
    "ChromaSampleLocTypeTopField": ("vui_chroma_loc_top", int),
    "ChromaSampleLocTypeBottomField": ("vui_chroma_loc_bottom", int),
    "NeutralChromaIndication": ("vui_neutral_chroma", int),
    "DefaultDisplayWindowFlag": ("vui_def_disp_window", int),
    "DefDispWinLeftOffset": ("vui_def_disp_left", int),
    "DefDispWinRightOffset": ("vui_def_disp_right", int),
    "DefDispWinTopOffset": ("vui_def_disp_top", int),
    "DefDispWinBottomOffset": ("vui_def_disp_bottom", int),
    "FrameFieldInfoPresentFlag": ("vui_frame_field_info", int),
    "PocProportionalToTimingFlag": ("vui_poc_proportional", int),
    "NumTicksPocDiffOneMinus1": ("vui_num_ticks_poc_diff", int),
    "BitstreamRestriction": ("vui_bitstream_restriction", int),
    "TilesFixedStructure": ("vui_tiles_fixed_structure", int),
    "MotionVectorsOverPicBoundaries": ("vui_mv_over_pic_boundaries", int),
    "MaxBytesPerPicDenom": ("vui_max_bytes_per_pic_denom", int),
    "MaxBitsPerMinCuDenom": ("vui_max_bits_per_min_cu_denom", int),
    "Log2MaxMvLengthHorizontal": ("vui_log2_max_mv_hor", int),
    "Log2MaxMvLengthVertical": ("vui_log2_max_mv_ver", int),
    "ConstrainedIntraPred": ("constrained_intra_pred", int),
    "Log2ParallelMergeLevel": ("log2_parallel_merge_level", int),
    "InitialQP": ("rc_initial_qp", int),
    "RCForceIntraQP": ("rc_force_intra_qp", int),
    "RCLCUSeparateModel": ("rc_lcu_separate", int),
    "KeepHierarchicalBit": ("rc_keep_hierarchy", int),
    "IntraConstraintFlag": ("intra_constraint", int),
}

_IGNORED_RE = re.compile(
    r"^(SEI|Max|Min|Num|Tile|PCM|Slice|LF|Debl|Loop|Scaling|Transquant|CU|"
    r"Weighted|TMVP|ASR|FEN|FDM|ECU|CFM|ESD|AdaptiveQ|dQP|RateControl|LCU|"
    r"KeepHierarchical|InitialQP|Lambda|Hash|Recovery|Progressive|Packed|"
    r"Frame[A-Z]|Field|Harmonize|Efficient|Cross|Vui|Video|Chroma|Matrix|"
    r"Aspect|Overscan|Neutral|Colour|Default|Motion|Bitstream|Access|"
    r"Display|Log2|Disable|Print|Summary|Verbose|Warn|TS|Implicit|Explicit)"
)


@dataclasses.dataclass
class EncoderConfig:
    """Full encoder configuration (parity: TEncCfg.h, reduced)."""
    input_file: str = ""
    bitstream_file: str = "str.bin"
    recon_file: str = ""
    width: int = 0
    height: int = 0
    input_bit_depth: int = 8
    output_bit_depth: int = 0
    internal_bit_depth: int = 8
    chroma_format: int = 420
    frame_rate: int = 30
    frame_skip: int = 0
    frames_to_encode: int = 0
    profile: str = "main"
    level: float = 4.0
    ctu_size: int = 64
    max_part_depth: int = 4
    tu_log2_max: int = 5
    tu_log2_min: int = 2
    tu_depth_inter: int = 3
    tu_depth_intra: int = 3
    intra_period: int = 1
    decoding_refresh_type: int = 0
    hash_sei_type: int = 1   # 1=MD5 2=CRC 3=checksum (0 disables)
    sei_buffering_period: int = 0
    sei_pic_timing: int = 0
    # extended SEI payload surface (reference TAppEncCfg.cpp:948-1060)
    sei_tone_mapping: int = 0
    sei_tone_map_id: int = 0
    sei_tone_map_cancel: int = 0
    sei_tone_map_persistence: int = 1
    sei_tone_map_coded_depth: int = 8
    sei_tone_map_target_depth: int = 8
    sei_tone_map_model: int = 0
    sei_tone_map_min: int = 0
    sei_tone_map_max: int = 1023
    sei_tone_map_sigmoid_mid: int = 512
    sei_tone_map_sigmoid_width: int = 960
    sei_frame_packing: int = 0
    sei_frame_packing_type: int = 0
    sei_frame_packing_id: int = 0
    sei_frame_packing_quincunx: int = 0
    sei_frame_packing_interp: int = 0
    sei_segrect_frame_packing: int = 0
    sei_segrect_frame_packing_cancel: int = 0
    sei_segrect_frame_packing_type: int = 0
    sei_segrect_frame_packing_persist: int = 0
    sei_display_orientation: int = 0
    sei_temporal_level0_index: int = 0
    sei_gdr_info: int = 0
    sei_tmcts: int = 0
    sei_decoding_unit_info: int = 0
    sei_no_display: int = 0
    sei_sop_description: int = 0
    sei_scalable_nesting: int = 0
    sei_time_code: int = 0
    sei_time_code_num_ts: int = 0
    sei_mastering_display: int = 0
    sei_mastering_max_lum: int = 10000
    sei_mastering_min_lum: int = 0
    sei_mastering_primaries: str = "0,50000 0,0 50000,0"
    sei_mastering_white_point: str = "16667,16667"
    sei_knee_function: int = 0
    sei_knee_id: int = 0
    sei_knee_cancel: int = 0
    sei_knee_persistence: int = 1
    sei_knee_input_drange: int = 1000
    sei_knee_input_lum: int = 100
    sei_knee_output_drange: int = 4000
    sei_knee_output_lum: int = 800
    sei_knee_points_minus1: int = 2
    sei_knee_input_points: str = "600 800 900"
    sei_knee_output_points: str = "100 250 450"
    sei_chroma_filter_hint: int = 0
    sei_chroma_filter_hor: int = 2
    sei_chroma_filter_ver: int = 2
    gop_size: int = 1
    qp: int = 32
    search_range: int = 64
    bipred_search_range: int = 4
    fast_search: int = 1
    hadamard_me: int = 1
    sao: int = 1
    amp: int = 1
    transform_skip: int = 1
    rdoq: int = 1
    rdoq_ts: int = 1
    deblock_disable: int = 0
    deblock_beta_offset: int = 0
    deblock_tc_offset: int = 0
    wpp: int = 0
    weighted_pred_p: int = 0
    weighted_pred_b: int = 0
    tmvp: int = 1
    tile_cols_minus1: int = 0
    tile_rows_minus1: int = 0
    sign_hide: int = 1
    rate_control: int = 0
    target_bitrate: int = 0
    scaling_list: int = 0
    transform_skip: int = 0
    adaptive_qp: int = 0
    qp_adaptation_range: int = 6
    max_cu_dqp_depth: int = 0
    lcu_rate_control: int = 0
    field_coding: int = 0
    top_field_first: int = 1
    vui: int = 0
    pcm: int = 0
    temporal_subsample: int = 1
    conformance_window_mode: int = 0
    horizontal_pad: int = 0
    vertical_pad: int = 0
    conf_win_left: int = 0
    conf_win_right: int = 0
    conf_win_top: int = 0
    conf_win_bottom: int = 0
    use_tpu: int = 1
    tpu_device: int = 0
    # reference-GPU-mode ME reproduction (GPUModeME / ReferenceGPUMode)
    gpu_mode_me: int = 0
    _ignored_kernel_path: str = ""
    slice_mode: int = 0
    slice_argument: int = 0
    slice_segment_mode: int = 0
    slice_segment_argument: int = 0
    scaling_list_file: str = ""
    tier: str = "main"
    max_merge_cand: int = 5
    cb_qp_offset: int = 0
    cr_qp_offset: int = 0
    delta_qp_rd: int = 0
    max_delta_qp: int = 0
    tq_bypass_force: int = 0
    tq_bypass_enable: int = 0
    cross_comp_pred: int = 0
    extended_precision: int = 0
    high_prec_wp: int = 0
    implicit_rdpcm: int = 0
    explicit_rdpcm: int = 0
    residual_rotation: int = 0
    rice_adaptation: int = 0
    align_cabac_bypass: int = 0
    single_sig_ctx: int = 0
    intra_ref_smoothing: int = 1
    sao_lcu_boundary: int = 0
    ts_log2_max: int = 2
    ts_fast: int = 1
    pcm_log2_max: int = 5
    pcm_log2_min: int = 3
    pcm_input_bd: int = 1
    pcm_filter_disable: int = 0
    lf_offset_in_pps: int = 0
    deblock_metric: int = 0
    deblock_control_present: int = 0
    lf_cross_slice: int = 1
    lf_cross_tile: int = 1
    tile_uniform: int = 1
    tile_col_widths: str = ""
    tile_row_heights: str = ""
    # VUI option block (defaults mirror reference TAppEncCfg)
    vui_aspect_ratio_present: int = 0
    vui_aspect_ratio_idc: int = 0
    vui_sar_width: int = 0
    vui_sar_height: int = 0
    vui_overscan_present: int = 0
    vui_overscan_appropriate: int = 0
    vui_video_signal_present: int = 0
    vui_video_format: int = 5
    vui_video_full_range: int = 0
    vui_colour_desc_present: int = 0
    vui_colour_primaries: int = 2
    vui_transfer_characteristics: int = 2
    vui_matrix_coefficients: int = 2
    vui_chroma_loc_present: int = 0
    vui_chroma_loc_top: int = 0
    vui_chroma_loc_bottom: int = 0
    vui_neutral_chroma: int = 0
    vui_def_disp_window: int = 0
    vui_def_disp_left: int = 0
    vui_def_disp_right: int = 0
    vui_def_disp_top: int = 0
    vui_def_disp_bottom: int = 0
    vui_frame_field_info: int = 0
    vui_poc_proportional: int = 0
    vui_num_ticks_poc_diff: int = 0
    vui_bitstream_restriction: int = 0
    vui_tiles_fixed_structure: int = 0
    vui_mv_over_pic_boundaries: int = 1
    vui_max_bytes_per_pic_denom: int = 2
    vui_max_bits_per_min_cu_denom: int = 1
    vui_log2_max_mv_hor: int = 15
    vui_log2_max_mv_ver: int = 15
    constrained_intra_pred: int = 0
    log2_parallel_merge_level: int = 2
    rc_initial_qp: int = 0
    rc_force_intra_qp: int = 0
    rc_lcu_separate: int = 1
    rc_keep_hierarchy: int = 0
    intra_constraint: int = 0
    gop_entries: List[GOPEntry] = dataclasses.field(default_factory=list)

    @property
    def internal_chroma_format(self) -> int:
        return {400: 0, 420: 1, 422: 2, 444: 3}[self.chroma_format]


def _strip_comment(line: str) -> str:
    return line.split("#", 1)[0].rstrip()


def _apply_kv(cfg: EncoderConfig, key: str, value: str) -> None:
    m = re.match(r"Frame(\d+)", key)
    if m:
        idx = int(m.group(1))
        entry = parse_gop_entry(value.split())
        while len(cfg.gop_entries) < idx:
            cfg.gop_entries.append(GOPEntry())
        cfg.gop_entries[idx - 1] = entry
        return
    if key in _OPTION_TABLE:
        attr, typ = _OPTION_TABLE[key]
        if typ is int:
            setattr(cfg, attr, int(float(value)))
        elif typ is float:
            setattr(cfg, attr, float(value))
        else:
            setattr(cfg, attr, value)
        return
    # Unknown-but-standard keys are ignored (with the same tolerance the
    # reference shows for unknown cfg-file entries: warn, don't fail).


def parse_cfg_file(path: str, cfg: Optional[EncoderConfig] = None
                   ) -> EncoderConfig:
    cfg = cfg or EncoderConfig()
    with open(path) as fh:
        for line in fh:
            line = _strip_comment(line)
            if not line.strip():
                continue
            if ":" not in line:
                continue
            key, value = line.split(":", 1)
            _apply_kv(cfg, key.strip(), value.strip())
    return cfg


# Short CLI flags, parity TAppEncCfg.cpp option table.
_SHORT_FLAGS = {
    "-i": "InputFile", "-b": "BitstreamFile", "-o": "ReconFile",
    "-wdt": "SourceWidth", "-hgt": "SourceHeight", "-fr": "FrameRate",
    "-f": "FramesToBeEncoded", "-q": "QP", "-fs": "FrameSkip",
    "-ip": "IntraPeriod", "-g": "GOPSize", "-sr": "SearchRange",
    "-d": "InternalBitDepth", "-level": "Level",
}


def parse_cli(argv: List[str], cfg: Optional[EncoderConfig] = None
              ) -> EncoderConfig:
    """Parse `-c file.cfg ... --Key=value ... -i in.yuv` argument lists with
    the same layering semantics as program_options_lite: later wins."""
    cfg = cfg or EncoderConfig()
    i = 0
    while i < len(argv):
        arg = argv[i]
        if arg == "-c":
            parse_cfg_file(argv[i + 1], cfg)
            i += 2
        elif arg.startswith("--"):
            if "=" in arg:
                key, value = arg[2:].split("=", 1)
            else:
                key, value = arg[2:], argv[i + 1]
                i += 1
            _apply_kv(cfg, key, value)
            i += 1
        elif arg in _SHORT_FLAGS:
            _apply_kv(cfg, _SHORT_FLAGS[arg], argv[i + 1])
            i += 2
        else:
            raise ValueError(f"unknown argument: {arg}")
    return cfg


class ConfigError(ValueError):
    """A cfg key was set to a value this encoder does not support."""


def validate(cfg: EncoderConfig, warn=None) -> None:
    """xConfirmPara-style validation (reference TAppEncCfg.cpp:1691
    xCheckParameter): unsupported values are REJECTED, never silently
    overridden. Optional coding TOOLS the encoder chooses not to use
    (RExt "enable the encoder to use X" switches) are accepted with a
    warning — an encoder may always decline a permitted tool; the
    stream stays conformant without it. Every key of the five CTC
    baseline cfgs is either honoured by the encoder or checked here.
    `warn`: callable for warnings (default: print to stdout)."""
    errs = []
    if warn is None:
        def warn(m):
            print(f"warning: {m}", flush=True)

    def confirm(bad: bool, msg: str) -> None:
        if bad:
            errs.append(msg)

    def tool_hint(enabled, name: str) -> None:
        if enabled:
            warn(f"{name} permitted by cfg but this encoder does not use "
                 "the tool (stream is conformant without it)")

    confirm(cfg.width <= 0 or cfg.height <= 0,
            "SourceWidth/SourceHeight must be positive")
    # ConformanceMode 1 auto-pads to the min-CU multiple; mode 2 pads by
    # HorizontalPad/VerticalPad (reference TAppEncCfg conformance modes)
    cw = cfg.width + (cfg.horizontal_pad
                      if cfg.conformance_window_mode == 2 else 0)
    ch = cfg.height + (cfg.vertical_pad
                       if cfg.conformance_window_mode == 2 else 0)
    confirm((cw % 8 or ch % 8) and cfg.conformance_window_mode != 1,
            "picture dimensions must be multiples of 8 (or use "
            "ConformanceMode 1/2 padding)")
    confirm(cfg.conformance_window_mode not in (0, 1, 2, 3),
            "ConformanceMode out of [0, 3]")
    confirm(cfg.conformance_window_mode == 3
            and (min(cfg.conf_win_left, cfg.conf_win_right,
                     cfg.conf_win_top, cfg.conf_win_bottom) < 0),
            "conformance window offsets must be non-negative")
    confirm(cfg.ctu_size != 64, "only MaxCUWidth/Height 64 supported")
    confirm(cfg.chroma_format not in (400, 420, 422, 444),
            f"InputChromaFormat {cfg.chroma_format} unsupported "
            "(400, 420, 422 and 444 implemented)")
    confirm(cfg.chroma_format == 444 and cfg.intra_period != 1,
            "4:4:4 encoding is all-intra only (IntraPeriod 1; DECODING "
            "4:4:4 inter streams is supported)")
    confirm(cfg.internal_bit_depth not in (8, 10, 12, 14, 16),
            f"InternalBitDepth {cfg.internal_bit_depth} unsupported "
            "(8, 10, 12, 14 and 16 implemented)")
    confirm(cfg.qp < 0 or cfg.qp > 51, "QP out of [0, 51]")
    confirm(cfg.search_range < 1 or cfg.search_range > 64,
            "SearchRange out of [1, 64]")
    confirm(bool(cfg.sei_tone_mapping)
            and cfg.sei_tone_map_model in (2, 3),
            "SEIToneMapModelId 2/3 (table modes) unsupported "
            "(0, 1 and 4 implemented)")
    confirm(bool(cfg.sei_chroma_filter_hint)
            and 1 in (cfg.sei_chroma_filter_hor, cfg.sei_chroma_filter_ver),
            "SEIChromaSampling filter type 1 (user-defined coefficients) "
            "unsupported")
    confirm(cfg.slice_segment_mode not in (0, 1, 2, 3),
            f"SliceSegmentMode {cfg.slice_segment_mode} unsupported "
            "(0 off, 1 = max CTUs, 2 = max bytes, 3 = tiles per "
            "dependent segment)")
    confirm(cfg.slice_segment_mode in (1, 2, 3) and
            cfg.slice_segment_argument < 1,
            "SliceSegmentMode requires SliceSegmentArgument >= 1")
    confirm(cfg.slice_segment_mode in (1, 2) and
            (cfg.slice_mode != 0 or bool(cfg.wpp)
             or cfg.tile_cols_minus1 > 0 or cfg.tile_rows_minus1 > 0
             or bool(cfg.adaptive_qp)),
            "SliceSegmentMode with SliceMode/WPP/tiles/AdaptiveQP "
            "unsupported")
    confirm(cfg.slice_segment_mode in (1, 2) and bool(cfg.tq_bypass_force),
            "SliceSegmentMode with lossless coding "
            "(CUTransquantBypassFlagForce) unsupported: the lossless "
            "recon path bypasses the native segment entropy coder and "
            "would silently emit a single-slice stream")
    confirm(cfg.slice_segment_mode == 3 and
            (cfg.slice_mode != 0 or bool(cfg.wpp)
             or (cfg.tile_cols_minus1 <= 0 and cfg.tile_rows_minus1 <= 0)
             or bool(cfg.adaptive_qp)),
            "SliceSegmentMode 3 (tile-aligned segments) requires tiles "
            "and no SliceMode/WPP/AdaptiveQP")
    confirm(cfg.slice_segment_mode == 3 and bool(cfg.tq_bypass_force),
            "SliceSegmentMode 3 with lossless coding "
            "(CUTransquantBypassFlagForce) unsupported: the lossless "
            "recon path bypasses the native tile-segment entropy coder "
            "and would silently emit a single-slice stream")
    confirm(cfg.slice_segment_mode in (1, 2, 3)
            and cfg.chroma_format != 420,
            "SliceSegmentMode requires 4:2:0 (native entropy path)")
    confirm(cfg.slice_mode == 3 and
            cfg.tile_cols_minus1 <= 0 and cfg.tile_rows_minus1 <= 0,
            "SliceMode 3 (tiles per slice) requires tiles")
    confirm(cfg.slice_mode == 3 and cfg.slice_argument < 1,
            "SliceMode 3 requires SliceArgument >= 1")
    confirm(cfg.slice_mode == 3 and bool(cfg.adaptive_qp),
            "SliceMode with AdaptiveQP unsupported")
    confirm(cfg.slice_mode not in (0, 1, 2, 3),
            f"SliceMode {cfg.slice_mode} unsupported (0 = one slice per "
            "picture, 1 = SliceArgument CTUs per slice, 2 = SliceArgument"
            " bytes per slice)")
    confirm(cfg.slice_mode in (1, 2) and cfg.slice_argument < 1,
            "SliceMode 1/2 requires SliceArgument >= 1")
    confirm(cfg.slice_mode in (1, 2) and bool(cfg.wpp),
            "SliceMode with WaveFrontSynchro unsupported")
    confirm(cfg.slice_mode in (1, 2) and
            (cfg.tile_cols_minus1 > 0 or cfg.tile_rows_minus1 > 0),
            "SliceMode with tiles unsupported")
    confirm(cfg.slice_mode in (1, 2) and bool(cfg.adaptive_qp),
            "SliceMode with AdaptiveQP unsupported")
    confirm(cfg.scaling_list not in (0, 1, 2),
            "ScalingList must be 0 (off), 1 (default) or 2 (file)")
    confirm(cfg.scaling_list == 2 and not cfg.scaling_list_file.strip(),
            "ScalingList=2 requires ScalingListFile")
    confirm(cfg.scaling_list == 2 and cfg.intra_period != 1,
            "explicit scaling lists (ScalingList=2) are all-intra only")
    # reference TAppEncCfg.cpp:1695 xConfirmPara(MaxCuDQPDepth > depth-1)
    confirm(cfg.max_cu_dqp_depth < 0 or cfg.max_cu_dqp_depth
            > cfg.max_part_depth - 1,
            "MaxCuDQPDepth exceeds maximum coding unit depth")
    confirm(cfg.delta_qp_rd != 0, "DeltaQpRD unsupported")
    confirm(cfg.max_delta_qp != 0, "MaxDeltaQP unsupported")
    confirm(cfg.tq_bypass_force and not cfg.tq_bypass_enable,
            "CUTransquantBypassFlagForce requires "
            "TransquantBypassEnableFlag")
    confirm(cfg.tq_bypass_force and cfg.internal_bit_depth > 15,
            "lossless coding needs residuals within int16 "
            "(InternalBitDepth <= 15)")
    # implicit (intra) and explicit (inter) RDPCM are honoured under
    # lossless (CUTransquantBypassFlagForce); on the transform-skip path
    # the encoder does not use them (the SPS flags stay 0 — conformant
    # without the tools, warned below).
    tool_hint(cfg.implicit_rdpcm and not cfg.tq_bypass_force,
              "ImplicitResidualDPCM")
    confirm((cfg.implicit_rdpcm or cfg.explicit_rdpcm)
            and cfg.tq_bypass_force and cfg.internal_bit_depth > 14,
            "lossless RDPCM needs residual differences within int16 "
            "(InternalBitDepth <= 14)")
    confirm(cfg.tq_bypass_enable and not cfg.tq_bypass_force,
            "TransquantBypassEnableFlag without the force flag "
            "unsupported (per-CU bypass RD search not implemented)")
    tool_hint(cfg.cross_comp_pred
              and not (cfg.internal_chroma_format == 3
                       and cfg.intra_period == 1),
              "CrossComponentPrediction")
    confirm(cfg.extended_precision != 0, "ExtendedPrecision unsupported")
    tool_hint(cfg.high_prec_wp, "HighPrecisionPredictionWeighting")
    tool_hint(cfg.explicit_rdpcm and not cfg.tq_bypass_force,
              "ExplicitResidualDPCM")
    # ResidualRotation / SingleSignificanceMapContext /
    # GolombRiceParameterAdaptation / AlignCABACBeforeBypass are honoured
    # on the encode side (the high-throughput RExt tool set)
    confirm(cfg.intra_ref_smoothing != 1,
            "IntraReferenceSmoothing must stay enabled")
    confirm(cfg.sao_lcu_boundary != 0, "SAOLcuBoundary unsupported")
    confirm(cfg.ts_log2_max != 2,
            "TransformSkipLog2MaxSize must be 2 (4x4 TS only)")
    confirm(cfg.pcm and (cfg.pcm_log2_max != 5 or cfg.pcm_log2_min != 3),
            "PCM sizes: only Log2Max 5 / Log2Min 3 supported")
    confirm(cfg.pcm and cfg.pcm_input_bd != 1,
            "PCMInputBitDepthFlag must be 1")
    confirm(cfg.pcm and cfg.pcm_filter_disable != 0,
            "PCMFilterDisableFlag unsupported")
    confirm(cfg.lf_offset_in_pps not in (0, 1),
            "LoopFilterOffsetInPPS out of range")
    confirm(cfg.deblock_metric != 0, "DeblockingFilterMetric unsupported")
    confirm(cfg.deblock_beta_offset != 0 or cfg.deblock_tc_offset != 0,
            "deblocking beta/tc offsets unsupported (must be 0)")
    confirm(cfg.lf_cross_slice != 1,
            "LFCrossSliceBoundaryFlag=0 unsupported")
    confirm(cfg.lf_cross_tile != 1,
            "LFCrossTileBoundaryFlag=0 unsupported")
    tiles_on = cfg.tile_cols_minus1 > 0 or cfg.tile_rows_minus1 > 0
    confirm(tiles_on and not cfg.tile_uniform,
            "only uniform tile spacing supported (TileUniformSpacing=1; "
            "the explicit width/height arrays are not implemented)")
    confirm(not (1 <= cfg.max_merge_cand <= 5),
            "MaxNumMergeCand out of [1, 5]")
    # reference TAppEncCfg xConfirmPara: 2 <= Log2ParallelMergeLevel <=
    # CtbLog2SizeY (CTU 64 -> 6)
    confirm(not (2 <= cfg.log2_parallel_merge_level <= 6),
            "Log2ParallelMergeLevel out of [2, 6]")
    confirm(bool(cfg.constrained_intra_pred) and cfg.intra_period != 1
            and (cfg.internal_chroma_format != 1 or bool(cfg.tq_bypass_force)
                 or cfg.scaling_list == 2),
            "ConstrainedIntraPred inter coding requires the native engine "
            "path (4:2:0, no explicit scaling lists, not lossless)")
    confirm(not (-12 <= cfg.cb_qp_offset <= 12)
            or not (-12 <= cfg.cr_qp_offset <= 12),
            "chroma QP offsets out of [-12, 12]")
    confirm(cfg.tier.lower() not in ("main", ""), "only Main tier")
    confirm(bool(cfg.rate_control) and cfg.target_bitrate <= 0,
            "RateControl=1 requires a positive TargetBitrate")
    confirm(bool(cfg.rate_control) and cfg.rc_force_intra_qp != 0,
            "RCForceIntraQP unsupported")
    confirm(cfg.field_coding and cfg.gop_entries
            and [e.poc for e in cfg.gop_entries]
            != list(range(1, len(cfg.gop_entries) + 1)),
            "FieldCoding with reordered GOPs unsupported")
    for e in cfg.gop_entries:
        confirm(e.slice_type not in ("P", "B"),
                f"GOP entry slice type {e.slice_type} unsupported")
        confirm(e.num_ref_pics_active > 16, "NumRefPicsActive > 16")
    if errs:
        raise ConfigError("; ".join(errs))
