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
    return parser


def load_segmentor(checkpoint_dir: str, arch: str = "vit_t"):
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
    # bf16 compute for inference (labels come from an argmax, robust to
    # the precision drop; 99.7% label agreement vs f32 measured on v5e)
    if os.path.exists(torch_ckpt):
        model, variables = sam_model_registry[arch](
            num_classes=num_cls, checkpoint=torch_ckpt, dtype=jnp.bfloat16)
    else:
        model, variables = sam_model_registry[arch](num_classes=num_cls,
                                                    dtype=jnp.bfloat16)
        if os.path.isdir(orbax_ckpt):
            from ..train.checkpoint import load_checkpoint

            restored = load_checkpoint(checkpoint_dir, {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})})
            variables = {k: v for k, v in restored.items() if v is not None}
    # micro_batch 16: at 1024^2 on v5e the segmentor measured 25.4 fps at
    # (f32, mb=4) and 32.4 fps at (bf16, mb=16) with the one-DMA clip path
    return make_clip_segmentor(model, variables, micro_batch=16)


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    args = build_parser().parse_args(argv)

    from ..flow.pipeline import process_folder

    segmentor = None
    if args.mode != "otsu":
        if args.checkpoint_dir is None:
            raise SystemExit("--checkpoint_dir is required for SAM modes")
        segmentor = load_segmentor(args.checkpoint_dir, args.arch)

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
            waveform_folder=args.waveform_folder)
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
