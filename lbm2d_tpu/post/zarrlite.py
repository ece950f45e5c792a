"""Minimal self-contained Zarr v2 directory-store writer/reader.

The environment has no ``zarr``/``numcodecs`` packages, so this module
implements the (simple, stable) Zarr v2 on-disk format directly: per-array
``.zarray`` JSON metadata, ``.zgroup``/``.zattrs`` files, and C-order chunk
files named ``i.j.k``. Compression uses the standard ``zlib`` codec (id
"zlib"), which any real Zarr reader decodes; ``None`` writes raw chunks.

Scope: what the dataset post-process needs -- groups, whole-array writes of
in-memory numpy data with arbitrary chunking, attribute dicts, and reads for
round-trip tests / the IO benchmark.
"""

from __future__ import annotations

import itertools
import json
import math
import os
import shutil
import zlib
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

_DTYPE_MAP = {
    np.dtype("float16"): "<f2",
    np.dtype("float32"): "<f4",
    np.dtype("float64"): "<f8",
    np.dtype("int32"): "<i4",
    np.dtype("int64"): "<i8",
    np.dtype("uint8"): "|u1",
    np.dtype("bool"): "|b1",
}


def _dtype_str(dtype: np.dtype) -> str:
    dtype = np.dtype(dtype)
    if dtype in _DTYPE_MAP:
        return _DTYPE_MAP[dtype]
    return dtype.str


class ZarrGroup:
    """A Zarr v2 group backed by a directory."""

    def __init__(self, path: str, overwrite: bool = False):
        self.path = path
        if overwrite and os.path.isdir(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        zgroup = os.path.join(path, ".zgroup")
        if not os.path.exists(zgroup):
            with open(zgroup, "w") as fh:
                json.dump({"zarr_format": 2}, fh)
        self._attrs: Dict[str, Any] = self._read_attrs()

    # -- attrs ---------------------------------------------------------------

    def _read_attrs(self) -> Dict[str, Any]:
        p = os.path.join(self.path, ".zattrs")
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)
        return {}

    @property
    def attrs(self) -> Dict[str, Any]:
        return self._attrs

    def update_attrs(self, d: Dict[str, Any]) -> None:
        self._attrs.update(d)
        with open(os.path.join(self.path, ".zattrs"), "w") as fh:
            json.dump(self._attrs, fh, indent=2, default=str)

    # -- children ------------------------------------------------------------

    def create_group(self, name: str) -> "ZarrGroup":
        return ZarrGroup(os.path.join(self.path, name))

    def create_array(
        self,
        name: str,
        data: np.ndarray,
        chunks: Sequence[int],
        dtype=None,
        compressor: Optional[str] = "zlib",
        level: int = 5,
    ) -> str:
        """Write a full in-memory array as a chunked Zarr v2 array."""
        data = np.asarray(data)
        if dtype is not None:
            data = data.astype(dtype)
        chunks = tuple(int(min(c, s)) for c, s in zip(chunks, data.shape))
        adir = os.path.join(self.path, name)
        os.makedirs(adir, exist_ok=True)

        comp_meta = {"id": "zlib", "level": level} if compressor == "zlib" else None
        meta = {
            "zarr_format": 2,
            "shape": list(data.shape),
            "chunks": list(chunks),
            "dtype": _dtype_str(data.dtype),
            "compressor": comp_meta,
            "fill_value": 0,
            "order": "C",
            "filters": None,
        }
        with open(os.path.join(adir, ".zarray"), "w") as fh:
            json.dump(meta, fh, indent=2)

        grid = [math.ceil(s / c) for s, c in zip(data.shape, chunks)]
        for idx in itertools.product(*(range(g) for g in grid)):
            sl = tuple(
                slice(i * c, min((i + 1) * c, s))
                for i, c, s in zip(idx, chunks, data.shape)
            )
            block = data[sl]
            # pad partial edge chunks to the full chunk shape (zarr v2 stores
            # full-size chunks with fill_value padding)
            if block.shape != chunks:
                full = np.zeros(chunks, data.dtype)
                full[tuple(slice(0, e) for e in block.shape)] = block
                block = full
            raw = np.ascontiguousarray(block).tobytes()
            if comp_meta is not None:
                raw = zlib.compress(raw, level)
            with open(os.path.join(adir, ".".join(map(str, idx))), "wb") as fh:
                fh.write(raw)
        return adir


def open_array(path: str) -> np.ndarray:
    """Read a full Zarr v2 array written by this module (or compatible)."""
    with open(os.path.join(path, ".zarray")) as fh:
        meta = json.load(fh)
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dtype = np.dtype(meta["dtype"])
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") != "zlib":
        raise ValueError(f"unsupported compressor {comp}")
    out = np.zeros(shape, dtype)
    grid = [math.ceil(s / c) for s, c in zip(shape, chunks)]
    for idx in itertools.product(*(range(g) for g in grid)):
        fname = os.path.join(path, ".".join(map(str, idx)))
        if not os.path.exists(fname):
            continue
        with open(fname, "rb") as fh:
            raw = fh.read()
        if comp is not None:
            raw = zlib.decompress(raw)
        block = np.frombuffer(raw, dtype).reshape(chunks)
        sl = tuple(
            slice(i * c, min((i + 1) * c, s)) for i, c, s in zip(idx, chunks, shape)
        )
        out[sl] = block[tuple(slice(0, s.stop - s.start) for s in sl)]
    return out


def read_attrs(path: str) -> Dict[str, Any]:
    p = os.path.join(path, ".zattrs")
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return {}
