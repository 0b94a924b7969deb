from .waveforms import load_all_waveforms
from .hdf5 import HDF5Reader, HDF5Writer, save_optical_flow_hdf5
from .pickle_io import PickleSerializer
from .tabular import CSVExporter, aggregate_pkl_files

__all__ = [
    "load_all_waveforms", "HDF5Reader", "HDF5Writer", "save_optical_flow_hdf5",
    "PickleSerializer", "CSVExporter", "aggregate_pkl_files",
]
