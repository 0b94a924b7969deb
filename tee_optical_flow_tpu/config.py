"""One typed configuration tree for the whole framework.

Field names and defaults intentionally match the reference dataclasses
(reference: optical_flow/config.py:12-193) so run configs written for the
reference can be loaded unchanged; additions are TPU-specific knobs
(dtype policy, mesh shape, pallas toggles) grouped under ``DeviceConfig``.

All configs round-trip through JSON via ``to_json`` / ``from_json`` so a
resolved run config can be persisted next to its artifacts (the reference
does this ad hoc with args.json, finetune-SAM/SingleGPU_train_finetune_
noprompt.py:202-206).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, List, Literal, Optional, Tuple

from .exceptions import ConfigurationError


# ---------------------------------------------------------------------------
# serialization helpers
# ---------------------------------------------------------------------------

def _asdict(cfg: Any) -> Any:
    if is_dataclass(cfg):
        return {f.name: _asdict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [_asdict(v) for v in cfg]
    return cfg


# keys whose FIELD was renamed because its meaning changed: silently
# ignoring them (the unknown-key rule) or silently remapping them would
# both mis-run a persisted config, so they fail loudly with migration
# guidance instead
_RETIRED_KEYS = {
    "deepflow_iterations":
        "renamed to deepflow_sor_iterations in round 5 — the DeepFlow "
        "solver moved from damped Jacobi (this key counted TOTAL "
        "iterations) to red-black SOR (the new key counts sweeps PER "
        "psi round, x deepflow_psi_iterations rounds). Re-tune: the "
        "production default is deepflow_sor_iterations=12 with "
        "deepflow_psi_iterations=3.",
}


def _fromdict(cls: type, data: dict) -> Any:
    kwargs = {}
    known = {f.name: f for f in fields(cls)}
    for key, value in data.items():
        if key in _RETIRED_KEYS and key not in known:
            raise ConfigurationError(
                f"config key '{key}': {_RETIRED_KEYS[key]}")
        if key not in known:
            continue  # forward compatible: ignore unknown keys
        ftype = known[key].type
        target = _DATACLASS_FIELDS.get((cls, key))
        if target is not None and isinstance(value, dict):
            kwargs[key] = _fromdict(target, value)
        elif isinstance(ftype, str) and ftype.startswith("Tuple") and isinstance(value, list):
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


class _JsonMixin:
    def to_dict(self) -> dict:
        return _asdict(self)

    def to_json(self, path: Optional[str] = None, **kw) -> str:
        text = json.dumps(self.to_dict(), indent=2, **kw)
        if path is not None:
            with open(path, "w") as f:
                f.write(text)
        return text

    @classmethod
    def from_dict(cls, data: dict):
        return _fromdict(cls, data)

    @classmethod
    def from_json(cls, path_or_text: str):
        if path_or_text.lstrip().startswith("{"):
            data = json.loads(path_or_text)
        else:
            with open(path_or_text) as f:
                data = json.load(f)
        return cls.from_dict(data)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# analysis-side configs (parity with reference optical_flow/config.py)
# ---------------------------------------------------------------------------

@dataclass
class CardiacCycleConfig(_JsonMixin):
    """Cardiac-cycle detection knobs (reference config.py:12-29)."""

    smooth_fraction: float = 0.2
    pad_len: int = 20
    sys_thres: float = 0.9
    dia_thres: float = 0.5
    rr_sys_ratio: float = 0.333
    sys_extension: int = 2
    t_peak_thres: float = 0.5
    t_min_dist: int = 20
    rr_search_range: List[float] = field(default_factory=lambda: [0.2, 0.75])
    low_peak_thres: float = 0.9
    low_min_dist: int = 50
    high_peak_thres: float = 0.9
    high_min_dist: int = 50
    sys_upstroke_multiplier: int = 2
    sys_upstroke_offset: int = 5


@dataclass
class VisualizationConfig(_JsonMixin):
    """Plotting / video knobs (reference config.py:32-59)."""

    save_dir: Optional[str] = None
    show_plot: bool = False
    show_img: bool = False
    save_cc_plot: bool = False
    nbins: int = 1000
    invert_rad_yaxis: bool = False
    invert_long_yaxis: bool = False
    fps: int = 30
    colormap_mag: str = "hot"
    colormap_ang: str = "viridis"
    colormap_rad: str = "bwr"
    colormap_long: str = "BrBG"
    show_peak_annotations: bool = True
    peak_marker_size: int = 8
    peak_marker_style: str = "+"
    peak_annotation_fontsize: int = 8
    peak_annotation_offset: Tuple[float, float] = (1.5, 1.5)
    radial_peak_color: str = "r"
    longitudinal_peak_color: str = "b"
    systolic_peak_color: str = "r"
    diastolic_peak_color: str = "b"
    show_sysdia_shading: bool = False
    true_sysdia_mode: Literal["radial", "longitudinal"] = "radial"
    print_report: bool = False
    return_statistics: bool = False


@dataclass
class ProcessingConfig(_JsonMixin):
    """Data-processing knobs (reference config.py:62-71)."""

    recalculate: bool = True
    verbose: bool = False
    sampling_rate: Optional[int] = None
    ecg_sampling_rate: int = 500
    art_sampling_rate: int = 125
    cvp_sampling_rate: int = 125
    pap_sampling_rate: int = 125


@dataclass
class PeakDetectionConfig(_JsonMixin):
    """Peak detection knobs (reference config.py:74-82)."""

    peak_thres: float = 0.2
    min_dist: int = 5
    pick_peak_by_subset: bool = True
    show_all_peaks: bool = False
    smooth_fraction: float = 0.3
    pad_len: int = 20


@dataclass
class AnalysisConfig(_JsonMixin):
    """Histogram / statistics knobs (reference config.py:85-95)."""

    percentile: int = 99
    perc_lo: int = 1
    perc_hi: int = 99
    av_filter_flag: bool = True
    av_savgol_window: int = 10
    av_savgol_poly: int = 4
    print_report: bool = False
    return_value: bool = True
    nbins: int = 1000


@dataclass
class CardiacCycleMethodConfig(_JsonMixin):
    """Cycle-method selection (reference config.py:98-105)."""

    method: Literal["angle", "area", "ecg", "ecg_lazy", "metadata", "arterial"] = "angle"
    label: str = "rv_inner"
    true_sysdia_mode: Literal["radial", "longitudinal"] = "radial"
    waveform_data: Optional[object] = None
    show_sysdia: bool = False


@dataclass
class OpticalFlowCalculationConfig(_JsonMixin):
    """Flow-production knobs (reference config.py:174-189).

    ``tvl1_*`` fields expose the solver parameters that OpenCV's DualTVL1
    hardcodes; defaults match OpenCV's defaults so EPE comparisons are
    apples-to-apples.
    """

    lambda_value: float = 0.15
    moving_avg_window: int = 4
    moving_avg_threshold: float = 0.49
    min_mask_size: int = 500
    waveform_flatness_threshold: float = 0.05
    pap_max_mean: float = 100.0
    cvp_max_mean: float = 50.0
    cvp_min_mean: float = -10.0
    ecg_sampling_rate: int = 500
    art_sampling_rate: int = 125
    cvp_sampling_rate: int = 125
    pap_sampling_rate: int = 125
    # TV-L1 solver internals (OpenCV DualTVL1 defaults: tau .25, theta .3,
    # 5 scales at step 0.8, 5 warps, 10x30 iterations, 5x5 median)
    tvl1_tau: float = 0.25
    tvl1_theta: float = 0.3
    tvl1_nscales: int = 5
    tvl1_zoom_factor: float = 0.8
    tvl1_warps: int = 5
    tvl1_outer_iterations: int = 10
    tvl1_inner_iterations: int = 30
    # epsilon: OpenCV's early-stop criterion (0 = fixed counts); gamma:
    # OpenCV's illumination term (a third primal field; 0 = off, the
    # OpenCV/reference default — ops/tvl1._tvl1_scale_gamma)
    tvl1_epsilon: float = 0.01
    tvl1_gamma: float = 0.0
    tvl1_median_filtering: bool = True
    tvl1_max_displacement: int = 16
    tvl1_use_pallas: bool = True
    # warp + inter-level flow interpolation: "bicubic" (Catmull-Rom — the
    # IPOL/OpenCV reference's OWN interpolator; production default since
    # round 3: meets every masked EPE target at 480x640 — worst interior
    # median 0.029 px, sector-masked p95 0.063 px, EPE_r03.json
    # tvl1_bicubic — for ~13% solver time over bilinear) or "bilinear"
    # (gather-free hat shift-warps, the fast mode; the low-level
    # ops/tvl1.tvl1_flow_pairs default)
    tvl1_interpolation: str = "bicubic"
    # DeepFlow-style variational refinement
    # smoothness weight, calibrated for [0, 255] intensities: alpha 1
    # under-smooths (7-18% of pixels ran away on weakly textured frames,
    # flow values +-150 px); the alpha 3..8 plateau is flat, 8 is safest
    deepflow_alpha: float = 8.0
    deepflow_delta: float = 0.5
    deepflow_gamma: float = 5.0
    # red-black SOR sweeps per lagged-nonlinearity (psi) round, psi
    # rounds per fixed point, and the SOR relaxation factor — the
    # numerics OpenCV's own DeepFlow runs (sorIterations / omega=1.6).
    # Round 5: replaced the damped-Jacobi solve, which under-converged
    # the low-data cavity (sector p95 0.13-0.22 px vs the converged
    # fixed point). The 3 x 12 schedule was picked by sweep at 480x640
    # echo content: sector p95 vs the 4x-depth converged float64 oracle
    # 0.031-0.043 px (psi5/sor30 buys only 0.023-0.033 at 19% lower
    # fps); EPE_r05.json deepflow_matching carries the floor numbers.
    # RENAMED in round 5 from ``deepflow_iterations`` (which counted
    # TOTAL damped-Jacobi iterations): a persisted round-4 value of 25
    # would silently mean 25 sweeps x psi rounds under the new solver,
    # so old JSONs fail loudly instead (see _RETIRED_KEYS)
    deepflow_sor_iterations: int = 12
    deepflow_psi_iterations: int = 3
    deepflow_omega: float = 1.6
    deepflow_nscales: int = 5
    # DeepFlow matching term: patch-NCC cost-volume matches at the two
    # coarsest levels as a soft constraint (reference's DeepMatching stage)
    deepflow_matching: bool = True
    deepflow_match_radius: int = 4
    deepflow_beta: float = 0.3
    # fixed-point (re-warping) iterations per pyramid level and the
    # finest-level displacement bound of the gather-free shift warp
    deepflow_fp_iterations: int = 3
    deepflow_max_displacement: int = 16
    # VMEM-resident fused Jacobi kernel (ops/deepflow_pallas.py); ignored
    # off-TPU and for levels too large for VMEM
    deepflow_use_pallas: bool = True
    # warp + inter-level flow interpolation, like tvl1_interpolation:
    # "bicubic" is the production default since round 4 — Catmull-Rom is
    # the published Brox/DeepFlow warp interpolator, and on echo content
    # it was the dominant wall-mask EPE term (240x320, vs the float64
    # Brox oracle: wall p95 0.160 -> 0.048 px, sector p95 0.62 -> 0.10)
    deepflow_interpolation: str = "bicubic"
    # clip-shape bucketing (core.py; SURVEY §7 "ragged clip shapes"):
    # pad N to a multiple of frame_bucket (last-frame repeats — exact,
    # sliced off on output) and the flow solver's H/W to multiples of
    # spatial_bucket (edge-replicate; boundary band only) so ragged
    # DICOM cohorts compile once per bucket, not once per shape
    # (~67-90 s each, NOTES.md)
    bucket_shapes: bool = True
    frame_bucket: int = 8
    spatial_bucket: int = 32


# ---------------------------------------------------------------------------
# TPU-specific configs (new in this framework)
# ---------------------------------------------------------------------------

@dataclass
class DeviceConfig(_JsonMixin):
    """Device/mesh/dtype policy for all on-device compute."""

    # mesh axis sizes (cli/process --config: data_axis > 1 builds a
    # frame-axis DP mesh for the segmentor); None -> single device
    data_axis: Optional[int] = None
    model_axis: int = 1
    # dtype policy: compute_dtype is the flow solver precision (float32 is
    # the only supported value — validated), model_dtype the SAM inference
    # precision (cli/process.load_segmentor)
    # ("int8" = weight-only quantized kernels with bfloat16 compute)
    compute_dtype: str = "float32"
    model_dtype: str = "bfloat16"
    # clip-shape bucketing for generic device programs; the flow pipeline
    # reads the equivalently-named knobs on OpticalFlowCalculationConfig
    # (core.py documents the policy)
    frame_bucket: int = 8            # pad clip length to a multiple of this
    spatial_bucket: int = 32         # pad H/W to a multiple of this
    # persistent XLA compilation cache directory: compiled solver
    # executables survive process restarts, so repeat CLI runs skip the
    # ~67-90 s per-bucket compiles (core.enable_compilation_cache);
    # None = in-process jit cache only
    compilation_cache_dir: Optional[str] = None


@dataclass
class TrainConfig(_JsonMixin):
    """SAM fine-tuning run config (parity with finetune-SAM/cfg.py:3-77)."""

    arch: Literal["vit_h", "vit_l", "vit_b", "vit_t"] = "vit_t"
    finetune_type: Literal["vanilla", "adapter", "lora"] = "vanilla"
    num_cls: int = 2
    image_size: int = 1024
    out_size: int = 256
    epochs: int = 200
    b: int = 4                      # batch size (reference flag name)
    lr: float = 1e-4
    weight_decay: float = 0.1
    warmup: bool = True
    warmup_period: int = 200
    poly_power: float = 0.9
    lora_rank: int = 4
    # PEFT placement (reference cfg.py:59-67): which encoder blocks (or
    # vit_t stages) get adapters / LoRA factors; [] = every block for LoRA
    lora_layers: Optional[List[int]] = None
    if_update_encoder: bool = True
    if_encoder_lora_layer: bool = False
    if_decoder_lora_layer: bool = False
    if_encoder_adapter: bool = False
    encoder_adapter_depths: List[int] = field(default_factory=lambda: [0, 1, 10, 11])
    if_mask_decoder_adapter: bool = False
    eval_interval: int = 2
    early_stop_patience: int = 20
    dir_checkpoint: str = "checkpoints"
    targets: str = "multi_all"
    seed: int = 0
    # TinyViT layer-wise lr decay (reference tiny_vit_sam.py:655-687,
    # rate 0.8 from build_sam.py:77); 1.0 disables
    layer_lr_decay: float = 1.0
    # TPU additions
    mesh_data_axis: Optional[int] = None
    grad_accum: int = 1
    remat: bool = False


@dataclass
class PipelineConfig(_JsonMixin):
    """Top-level bundle for DICOM->HDF5 production."""

    flow: OpticalFlowCalculationConfig = field(default_factory=OpticalFlowCalculationConfig)
    processing: ProcessingConfig = field(default_factory=ProcessingConfig)
    device: DeviceConfig = field(default_factory=DeviceConfig)
    mode: str = "otsu"               # 'otsu' | 'RVIO_2class' | 'A4C' | 'MouseRV_A4C'
    of_algo: Literal["tvl1", "deepflow"] = "tvl1"
    no_saliency: bool = True
    wase: bool = False               # background (WASE) compensation
    include_waveforms: bool = True
    save_mask_subset: Optional[List[str]] = None


# nested-field registry used by _fromdict
_DATACLASS_FIELDS = {
    (PipelineConfig, "flow"): OpticalFlowCalculationConfig,
    (PipelineConfig, "processing"): ProcessingConfig,
    (PipelineConfig, "device"): DeviceConfig,
}


# ---------------------------------------------------------------------------
# preset factories (parity with reference config.py:108-193)
# ---------------------------------------------------------------------------

def default_cardiac_cycle_config() -> CardiacCycleConfig:
    return CardiacCycleConfig()


def default_visualization_config() -> VisualizationConfig:
    return VisualizationConfig()


def default_processing_config() -> ProcessingConfig:
    return ProcessingConfig()


def default_peak_detection_config() -> PeakDetectionConfig:
    return PeakDetectionConfig()


def default_analysis_config() -> AnalysisConfig:
    return AnalysisConfig()


def ecg_gated_config() -> CardiacCycleConfig:
    return CardiacCycleConfig(smooth_fraction=0.2, pad_len=20, rr_sys_ratio=0.333)


def arterial_gated_config() -> CardiacCycleConfig:
    return CardiacCycleConfig(
        smooth_fraction=0.2, pad_len=20,
        low_peak_thres=0.9, low_min_dist=50,
        high_peak_thres=0.9, high_min_dist=50,
    )


def angle_detection_config() -> CardiacCycleConfig:
    return CardiacCycleConfig(smooth_fraction=0.2, pad_len=20)


def area_detection_config() -> CardiacCycleConfig:
    return CardiacCycleConfig(smooth_fraction=0.3, pad_len=20, sys_thres=0.9, dia_thres=0.5)


def default_optical_flow_config() -> OpticalFlowCalculationConfig:
    return OpticalFlowCalculationConfig()


def validate_pipeline_config(cfg: PipelineConfig) -> None:
    """Raise ConfigurationError on inconsistent settings (reference
    calculate_optical_flow.py:509-517 validates mode/labels similarly)."""
    valid_modes = {"otsu", "RVIO_2class", "A4C", "MouseRV_A4C"}
    if cfg.mode not in valid_modes:
        raise ConfigurationError(f"mode {cfg.mode!r} not in {sorted(valid_modes)}")
    if cfg.of_algo not in ("tvl1", "deepflow"):
        raise ConfigurationError(f"of_algo {cfg.of_algo!r} must be 'tvl1' or 'deepflow'")
    if cfg.flow.lambda_value <= 0:
        raise ConfigurationError("lambda_value must be positive")
    if not (0 < cfg.flow.tvl1_zoom_factor < 1):
        raise ConfigurationError("tvl1_zoom_factor must be in (0, 1)")
    if cfg.flow.tvl1_interpolation not in ("bilinear", "bicubic"):
        raise ConfigurationError(
            "tvl1_interpolation must be 'bilinear' or 'bicubic'")
    if cfg.flow.deepflow_interpolation not in ("bilinear", "bicubic"):
        raise ConfigurationError(
            "deepflow_interpolation must be 'bilinear' or 'bicubic'")
    if cfg.mode == "otsu" and cfg.wase:
        raise ConfigurationError(
            "WASE background compensation needs segmentation masks; "
            "mode=otsu only supports wase=False "
            "(reference calculate_optical_flow.py:509-517)")
    if cfg.device.compute_dtype != "float32":
        raise ConfigurationError(
            "device.compute_dtype: only float32 is supported for the "
            "variational flow solvers")
    if cfg.device.model_dtype not in ("float32", "bfloat16", "int8"):
        raise ConfigurationError(
            "device.model_dtype must be 'float32', 'bfloat16', or 'int8' "
            "(int8 = weight-only quantized kernels, bfloat16 compute; "
            "models/quantize.py)")
