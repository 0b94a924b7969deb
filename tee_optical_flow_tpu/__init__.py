"""tee_optical_flow_tpu — TPU-native TEE optical-flow framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
nquach/TEE_optical_flow: SAM (TinyViT) heart segmentation, dense TV-L1 /
variational optical flow over DICOM clips, HDF5 clip artifacts, cardiac
cycle detection, radial/longitudinal decomposition, S/e'/l'/a' peak
detection, plotting/video, cohort batch processing, and SAM fine-tuning —
with the hot path expressed as batched, jitted device programs instead of
frame-sequential Python loops.

Subpackage map (one module <-> one reference responsibility; see SURVEY.md):
  config, exceptions    typed config tree + error taxonomy
  io/                   DICOM (native), HDF5 (schema-compatible), waveforms, CSV
  dataset               OpticalFlowDataset clip object
  ops/                  Pallas/jnp kernels: TV-L1, warping, pyramids, saliency,
                        otsu, morphology, histograms, smoothing
  signal/               ECG cleaning/R-peaks, spectral smoother, peak finding,
                        the six cardiac-cycle detectors
  analysis/             centroid, radial/longitudinal projection, histograms
  peak_detection        S/e'/l'/a' extraction
  models/               Flax SAM zoo (TinyViT vit_t, ViT-Det, prompt encoder,
                        mask decoder, LoRA/Adapter) + torch checkpoint import
  flow/                 DICOM -> masks -> flow -> HDF5 production pipeline
  viz/                  heatmaps, peak-line plots, overlay video
  batch/                cohort-scale orchestration with error manifests
  parallel/             mesh construction, shardings, collectives
  train/                optax fine-tuning (DP/model-parallel via shard_map)
  cli/                  command-line entry points
"""

__version__ = "0.1.0"

from . import config as config
from . import exceptions as exceptions
from .exceptions import (
    OpticalFlowError, DICOMReadError, WaveformLoadError,
    WaveformValidationError, OpticalFlowCalculationError, ConfigurationError,
)

__all__ = [
    "config", "exceptions", "__version__",
    "OpticalFlowError", "DICOMReadError", "WaveformLoadError",
    "WaveformValidationError", "OpticalFlowCalculationError",
    "ConfigurationError",
]
