"""Alias of reference optical_flow/file_io.py (HDF5/pickle/CSV
persistence incl. the 69-column cohort export; reference
file_io.py:18-251) -> tee_optical_flow_tpu.io."""

from tee_optical_flow_tpu.io.hdf5 import HDF5Reader, HDF5Writer  # noqa: F401
from tee_optical_flow_tpu.io.pickle_io import PickleSerializer  # noqa: F401
from tee_optical_flow_tpu.io.tabular import (  # noqa: F401
    CSVExporter,
    aggregate_pkl_files,
    cohort_csv_header,
)

__all__ = ["HDF5Reader", "HDF5Writer", "PickleSerializer", "CSVExporter",
           "aggregate_pkl_files", "cohort_csv_header"]
