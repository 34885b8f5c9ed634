"""MATLAB .mat file reading.

Capability parity with the reference `MatReader`
(multipole-graph-neural-operator/utilities.py:18-69): supports both the
pre-v7.3 format (scipy.io) and the v7.3/HDF5 format (h5py), where the
HDF5 path reverses the axis order to undo MATLAB's column-major layout.
Returns float32 numpy arrays (host-side; callers `jax.device_put` what
they need on device).
"""
from __future__ import annotations

import numpy as np


class MatReader:
    """Reads fields out of a MATLAB .mat file as float32 numpy arrays."""

    def __init__(self, file_path: str, to_float: bool = True):
        self.to_float = to_float
        self.file_path = file_path
        self.data = None
        self.old_mat = None
        self._load_file()

    def _load_file(self) -> None:
        import scipy.io

        try:
            self.data = scipy.io.loadmat(self.file_path)
            self.old_mat = True
        except Exception:
            import h5py

            self.data = h5py.File(self.file_path, "r")
            self.old_mat = False

    def load_file(self, file_path: str) -> None:
        self.file_path = file_path
        self._load_file()

    def read_field(self, field: str) -> np.ndarray:
        x = self.data[field]
        if not self.old_mat:
            x = x[()]
            # MATLAB v7.3 stores column-major; reverse all axes.
            x = np.transpose(x, axes=range(len(x.shape) - 1, -1, -1))
        x = np.asarray(x)
        if self.to_float:
            x = x.astype(np.float32)
        return x
