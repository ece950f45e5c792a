"""Independent Zarr v2 reader written FROM THE SPEC, for interop testing.

Deliberately implemented from the Zarr v2 storage specification
(https://zarr-specs.readthedocs.io/en/latest/v2/v2.0.html) rather than from
``lbm2d_tpu.post.zarrlite``, so a round-trip through it is genuine evidence
that zarrlite's output is spec-valid and consumable by the real ``zarr``
package (2.x) the downstream 02-nca-cfd stack uses (reference
``src/post_process/h5_to_zarr_pipeline.py:13-19``).

Spec surface covered (everything the C28 contract emits):
  * ``.zarray`` metadata: zarr_format, shape, chunks, dtype (NumPy typestr),
    order 'C'/'F', fill_value, compressor, filters, dimension_separator
  * chunk keys "i.j.k" (or custom separator), every chunk stored FULL-size
    with edge chunks padded, C/F order within the chunk
  * missing chunks -> fill_value
  * compressor null (raw), the numcodecs "zlib" codec {"id","level"}, and
    the numcodecs "zstd" codec (raw zstd frames)
  * group ``.zgroup`` + ``.zattrs`` JSON documents
"""

from __future__ import annotations

import itertools
import json
import math
import os
import zlib

import numpy as np


def read_array(store_path: str) -> np.ndarray:
    """Assemble the full array from a Zarr v2 directory store."""
    with open(os.path.join(store_path, ".zarray")) as fh:
        meta = json.load(fh)
    if meta["zarr_format"] != 2:
        raise ValueError(f"not a Zarr v2 array: zarr_format={meta['zarr_format']}")
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dtype = np.dtype(meta["dtype"])
    order = meta.get("order", "C")
    if order not in ("C", "F"):
        raise ValueError(f"invalid order {order!r}")
    if meta.get("filters") not in (None, []):
        raise ValueError(f"filters unsupported: {meta['filters']}")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") not in ("zlib", "zstd"):
        raise ValueError(f"unsupported compressor: {comp}")
    sep = meta.get("dimension_separator", ".")
    fill = meta.get("fill_value")
    if fill is None:
        fill = 0

    out = np.full(shape, fill, dtype=dtype)
    grid = [math.ceil(s / c) for s, c in zip(shape, chunks)]
    for idx in itertools.product(*(range(g) for g in grid)):
        key = sep.join(str(i) for i in idx) if idx else "0"
        cpath = os.path.join(store_path, key)
        if not os.path.exists(cpath):
            continue  # missing chunk == fill_value
        with open(cpath, "rb") as fh:
            raw = fh.read()
        if comp is not None:
            if comp["id"] == "zstd":
                import zstandard

                raw = zstandard.ZstdDecompressor().decompress(raw)
            else:
                raw = zlib.decompress(raw)
        block = np.frombuffer(raw, dtype=dtype)
        if block.size != int(np.prod(chunks)):
            raise ValueError(
                f"chunk {key}: {block.size} elements, expected {np.prod(chunks)}"
            )
        block = block.reshape(chunks, order=order)
        # crop the padded edge-chunk region down to the in-bounds part
        sel_out, sel_blk = [], []
        for d, (i, c, s) in enumerate(zip(idx, chunks, shape)):
            start = i * c
            stop = min(start + c, s)
            sel_out.append(slice(start, stop))
            sel_blk.append(slice(0, stop - start))
        out[tuple(sel_out)] = block[tuple(sel_blk)]
    return out


def read_group_attrs(group_path: str) -> dict:
    zgroup = os.path.join(group_path, ".zgroup")
    with open(zgroup) as fh:
        if json.load(fh)["zarr_format"] != 2:
            raise ValueError("not a Zarr v2 group")
    zattrs = os.path.join(group_path, ".zattrs")
    if not os.path.exists(zattrs):
        return {}
    with open(zattrs) as fh:
        return json.load(fh)
