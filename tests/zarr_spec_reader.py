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
  * compressor null (raw), the numcodecs "zlib" codec {"id","level"}, the
    numcodecs "zstd" codec (raw zstd frames), and the numcodecs "blosc"
    codec -- the c-blosc1 chunk container decoded here straight from the
    published format (c-blosc README_HEADER / blosc.c), independently of
    ``lbm2d_tpu.post.bloscmini`` (different bit-unshuffle formulation)
  * group ``.zgroup`` + ``.zattrs`` JSON documents
"""

from __future__ import annotations

import itertools
import json
import math
import os
import struct
import zlib

import numpy as np


def _blosc_bit_unshuffle(buf: np.ndarray, t: int) -> np.ndarray:
    """Invert bitshuffle: rows (e*8+b) of n/8 bytes -> elements, per spec.

    Row e*8+b holds bit ``b`` of byte ``e`` of each element, LSB-first
    packed; elements past the multiple-of-8 cut are stored verbatim.
    """
    n = buf.size // t
    m = n - n % 8
    cut = m * t
    if m == 0:
        return buf
    rows = buf[:cut].reshape(t * 8, m // 8)
    bits = np.unpackbits(rows, axis=1, bitorder="little")  # [t*8, m]
    elems = np.zeros((m, t), np.uint8)
    for e in range(t):
        for b in range(8):
            elems[:, e] |= bits[e * 8 + b] << b
    return np.concatenate([elems.reshape(-1), buf[cut:]])


def _blosc_decode_chunk(raw: bytes) -> bytes:
    """Decode one c-blosc1 chunk (zstd inner codec, any shuffle mode)."""
    ver, _vlz, flags, tsize, nbytes, blocksize, cbytes = struct.unpack(
        "<BBBBiii", raw[:16]
    )
    if ver < 1 or cbytes > len(raw):
        raise ValueError("corrupt blosc header")
    if flags & 0x2:  # pure memcpy chunk
        return raw[16 : 16 + nbytes]
    if flags >> 5 != 4:  # compressor format code: 4 = zstd
        raise ValueError(f"unsupported blosc compressor code {flags >> 5}")
    import zstandard

    nblocks = -(-nbytes // blocksize)
    starts = struct.unpack_from(f"<{nblocks}i", raw, 16)
    out = bytearray()
    for i, st in enumerate(starts):
        neblock = min(blocksize, nbytes - i * blocksize)
        (csz,) = struct.unpack_from("<i", raw, st)
        payload = raw[st + 4 : st + 4 + csz]
        if csz != neblock:  # csz == neblock means a stored (verbatim) block
            payload = zstandard.ZstdDecompressor().decompress(
                payload, max_output_size=neblock
            )
        blk = np.frombuffer(payload, np.uint8)
        if flags & 0x4:  # bitshuffle
            blk = _blosc_bit_unshuffle(blk, tsize)
        elif flags & 0x1:  # byte shuffle
            ne = blk.size // tsize
            body = blk[: ne * tsize].reshape(tsize, ne).T.reshape(-1)
            blk = np.concatenate([body, blk[ne * tsize :]])
        out += blk.tobytes()
    return bytes(out)


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
    if comp is not None and comp.get("id") not in ("zlib", "zstd", "blosc"):
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
            if comp["id"] == "blosc":
                raw = _blosc_decode_chunk(raw)
            elif comp["id"] == "zstd":
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
