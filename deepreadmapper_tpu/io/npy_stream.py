"""Incremental .npy writer.

The reference's `inference` tool pre-writes an npy header sized for the full
output and appends embedding batches as they stream off the model
(write_npy_header + batch loop, src/inference/test_inference.cpp:6-36,
160-227).  Same contract here: fixed row count declared up front, float32
C-order rows appended.
"""

from __future__ import annotations

import struct


class NpyStreamWriter:
    def __init__(self, path: str, n_rows: int, n_cols: int, dtype: str = "<f4"):
        self.path = path
        self.n_rows = n_rows
        self.n_cols = n_cols
        self.dtype = dtype
        self.rows_written = 0
        self._f = open(path, "wb")
        header_dict = (
            "{'descr': '%s', 'fortran_order': False, 'shape': (%d, %d), }"
            % (dtype, n_rows, n_cols)
        )
        # Pad header to 64-byte alignment per the npy v1 spec.
        base = 10 + len(header_dict) + 1
        pad = (64 - base % 64) % 64
        header = header_dict + " " * pad + "\n"
        self._f.write(b"\x93NUMPY\x01\x00")
        self._f.write(struct.pack("<H", len(header)))
        self._f.write(header.encode("latin1"))

    def append(self, arr) -> None:
        import numpy as np

        # rows are cast to the DECLARED header dtype (f4 default; int
        # streams use the same writer)
        a = np.ascontiguousarray(arr, dtype=np.dtype(self.dtype))
        if a.ndim != 2 or a.shape[1] != self.n_cols:
            raise ValueError(f"expected [*, {self.n_cols}], got {a.shape}")
        if self.rows_written + a.shape[0] > self.n_rows:
            raise ValueError("writing past declared row count")
        self._f.write(a.tobytes())
        self.rows_written += a.shape[0]

    def close(self) -> None:
        if self.rows_written != self.n_rows:
            raise ValueError(
                f"declared {self.n_rows} rows but wrote {self.rows_written}"
            )
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            self.close()
        else:
            self._f.close()
