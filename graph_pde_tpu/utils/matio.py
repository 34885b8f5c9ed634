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

    def keys(self):
        return [k for k in self.data.keys() if not k.startswith("__")]

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


def write_mat(file_path: str, fields: dict, v73: bool = False) -> None:
    """Write a .mat file readable by MatReader (parity-harness tooling).

    The reference's datasets are MATLAB-produced (README.md:24); this
    writer exists so the .mat ingestion path can be exercised end-to-end
    without them. ``v73=True`` writes HDF5 with MATLAB's column-major
    axis order (each array stored axis-reversed, undoing
    ``read_field``'s transpose); ``v73=False`` writes the pre-v7.3
    format via scipy.io.savemat.
    """
    if v73:
        import h5py

        with h5py.File(file_path, "w") as f:
            for k, v in fields.items():
                v = np.asarray(v)
                f.create_dataset(
                    k, data=np.transpose(v, axes=range(v.ndim - 1, -1, -1)))
    else:
        import scipy.io

        scipy.io.savemat(file_path,
                         {k: np.asarray(v) for k, v in fields.items()})
