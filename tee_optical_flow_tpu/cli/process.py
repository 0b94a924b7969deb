"""Flow-production CLI: DICOM folder -> HDF5 clips.

Parity with reference optical_flow/calculate_optical_flow.py:699-739 (same
flags: nchunks/dcm_folder/save_folder/waveform_folder/checkpoint_dir/arch/
verbose/recalculate; per-chunk output directories) plus TPU-native
additions (mode/of_algo/saliency/WASE toggles exposed instead of
hardcoded).

Usage:
    python -m tee_optical_flow_tpu.cli.process --dcm_folder d --save_folder s \
        --nchunks 1 [--mode otsu|RVIO_2class|A4C] [--of_algo tvl1|deepflow]
"""

from __future__ import annotations

import argparse
import logging
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Process DICOM files and calculate optical flow")
    parser.add_argument("--nchunks", type=int, default=1)
    parser.add_argument("--dcm_folder", type=str, required=True)
    parser.add_argument("--save_folder", type=str, required=True)
    parser.add_argument("--waveform_folder", type=str, default=None)
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="Dir with checkpoint_best + args.json "
                             "(required for SAM modes)")
    parser.add_argument("--arch", type=str, default="vit_t")
    parser.add_argument("--mode", type=str, default="RVIO_2class",
                        choices=["otsu", "RVIO_2class", "A4C", "MouseRV_A4C"])
    parser.add_argument("--of_algo", type=str, default="TVL1",
                        choices=["TVL1", "deepflow"])
    parser.add_argument("--bkgd_comp", type=str, default="none",
                        choices=["none", "WASE"])
    parser.add_argument("--saliency", action="store_true",
                        help="use fine-grained saliency as the flow input")
    parser.add_argument("--flipLR", action="store_true")
    parser.add_argument("--include_waveforms", action="store_true")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--recalculate", action="store_true")
    parser.add_argument("--config", type=str, default=None,
                        help="PipelineConfig JSON (config.py): supplies "
                             "mode/of_algo/saliency/WASE/waveforms/solver "
                             "knobs and the device policy; CLI flags that "
                             "differ from their parser defaults override "
                             "the file")
    parser.add_argument("--compilation_cache_dir", type=str, default=None,
                        help="persistent XLA compilation cache: repeat "
                             "runs skip the ~67-90 s solver compiles "
                             "(DeviceConfig.compilation_cache_dir)")
    return parser


def _apply_pipeline_config(args, parser) -> "object":
    """Load ``--config`` (a PipelineConfig JSON), validate it, and fold it
    into ``args`` — any flag left at its parser default takes the file's
    value. Returns the loaded PipelineConfig (or None)."""
    from ..config import PipelineConfig, validate_pipeline_config

    if args.config is None:
        return None
    cfg = PipelineConfig.from_json(args.config)
    validate_pipeline_config(cfg)
    file_values = {
        "mode": cfg.mode,
        "of_algo": "TVL1" if cfg.of_algo == "tvl1" else "deepflow",
        "saliency": not cfg.no_saliency,
        "bkgd_comp": "WASE" if cfg.wase else "none",
        "include_waveforms": cfg.include_waveforms,
    }
    for name, value in file_values.items():
        if getattr(args, name) == parser.get_default(name):
            setattr(args, name, value)
    return cfg


def load_segmentor(checkpoint_dir: str, arch: str = "vit_t",
                   model_dtype: str = "bfloat16", data_axis=None):
    """Rebuild the segmentor from a run directory (args.json + checkpoint),
    mirroring reference _load_segmentor_model
    (calculate_optical_flow.py:662-696). Accepts either an orbax snapshot
    from this framework or a torch .pth to convert."""
    import json

    from ..models.registry import sam_model_registry
    from ..models.sam import make_clip_segmentor

    num_cls = 9
    args_path = os.path.join(checkpoint_dir, "args.json")
    if os.path.exists(args_path):
        with open(args_path) as f:
            run_args = json.load(f)
        num_cls = int(run_args.get("num_cls", num_cls))
        arch = run_args.get("arch", arch)

    import jax.numpy as jnp

    torch_ckpt = os.path.join(checkpoint_dir, "checkpoint_best.pth")
    orbax_ckpt = os.path.join(checkpoint_dir, "checkpoint_best")
    # bf16 compute for inference by default (labels come from an argmax,
    # robust to the precision drop; 99.7% label agreement vs f32 measured
    # on v5e) — DeviceConfig.model_dtype overrides; "int8" keeps bf16
    # compute and stores kernels weight-only-quantized (models/quantize.py)
    if model_dtype not in ("float32", "bfloat16", "int8"):
        # load_segmentor is callable directly (bypassing
        # validate_pipeline_config), so a typo like 'int4' must not
        # silently run bf16 unquantized
        from ..exceptions import ConfigurationError

        raise ConfigurationError(
            f"model_dtype must be one of float32/bfloat16/int8, "
            f"got {model_dtype!r}")
    weights_int8 = model_dtype == "int8"
    dtype = jnp.float32 if model_dtype == "float32" else jnp.bfloat16
    if os.path.exists(torch_ckpt):
        model, variables = sam_model_registry[arch](
            num_classes=num_cls, checkpoint=torch_ckpt, dtype=dtype)
    else:
        model, variables = sam_model_registry[arch](num_classes=num_cls,
                                                    dtype=dtype)
        if os.path.isdir(orbax_ckpt):
            from ..train.checkpoint import load_checkpoint

            restored = load_checkpoint(checkpoint_dir, {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})})
            variables = {k: v for k, v in restored.items() if v is not None}
    mesh = None
    if data_axis and data_axis > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(data_axis=data_axis, model_axis=1)
    # micro_batch 4: at 1024^2 bf16 on v5e the device-resident segmentor
    # measured 7.6-8.0 ms/frame at mb 2-4 vs 10.2 at mb 16 (the early
    # conv stages' (B,1024^2,C) activations stop fitting on-chip as B
    # grows), and small chunks also pad short clips less; a sharded
    # segmentor needs mb divisible by the mesh data axis, so round up
    mb = 4 if mesh is None else -(-4 // data_axis) * data_axis
    return make_clip_segmentor(model, variables, micro_batch=mb, mesh=mesh,
                               weights_int8=weights_int8)


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    parser = build_parser()
    args = parser.parse_args(argv)
    pipeline_cfg = _apply_pipeline_config(args, parser)

    cache_dir = args.compilation_cache_dir
    if cache_dir is None and pipeline_cfg is not None:
        cache_dir = pipeline_cfg.device.compilation_cache_dir
    if cache_dir:
        from ..core import enable_compilation_cache

        enable_compilation_cache(cache_dir)

    from ..flow.pipeline import process_folder

    segmentor = None
    if args.mode != "otsu":
        if args.checkpoint_dir is None:
            raise SystemExit("--checkpoint_dir is required for SAM modes")
        dev = pipeline_cfg.device if pipeline_cfg is not None else None
        segmentor = load_segmentor(
            args.checkpoint_dir, args.arch,
            model_dtype=dev.model_dtype if dev else "bfloat16",
            data_axis=dev.data_axis if dev else None)

    extra = {}
    if pipeline_cfg is not None:
        extra["config"] = pipeline_cfg.flow
        if pipeline_cfg.save_mask_subset is not None:
            extra["save_mask_subset"] = pipeline_cfg.save_mask_subset

    all_errors = []
    for chunk_index in range(args.nchunks):
        save_folder = os.path.join(args.save_folder, f"chunk{chunk_index}")
        errors = process_folder(
            args.dcm_folder, save_folder, segmentor,
            nchunks=args.nchunks, chunk_index=chunk_index,
            recalculate=args.recalculate, verbose=args.verbose,
            mode=args.mode, bkgd_comp=args.bkgd_comp, flipLR=args.flipLR,
            no_saliency=not args.saliency, OF_algo=args.of_algo,
            include_waveforms=args.include_waveforms,
            waveform_folder=args.waveform_folder, **extra)
        all_errors.extend(errors)
    from ..utils import get_stage_report

    report = get_stage_report()
    if report:
        logging.getLogger(__name__).info(
            "stage timings: %s",
            {k: round(v["total_s"], 2) for k, v in report.items()})
    if all_errors:
        logging.getLogger(__name__).warning("%d files failed", len(all_errors))
    return 1 if all_errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
