"""Post-process tests: zarrlite round-trip and the h5->zarr pipeline."""

import json
import os

import numpy as np
import h5py

from lbm2d_tpu.post.zarrlite import ZarrGroup, open_array, read_attrs
from lbm2d_tpu.post.h5_to_zarr import run as h5_to_zarr_run


def test_zarrlite_roundtrip(tmp_path):
    root = ZarrGroup(str(tmp_path / "case.zarr"), overwrite=True)
    root.update_attrs({"case_name": "t", "reynolds_number": 123.4})
    rng = np.random.default_rng(0)
    data = rng.standard_normal((7, 9, 16, 33)).astype(np.float16)
    path = root.create_array("turbulence", data, chunks=(3, 9, 16, 8))
    back = open_array(path)
    np.testing.assert_array_equal(back, data)
    assert read_attrs(str(tmp_path / "case.zarr"))["reynolds_number"] == 123.4
    # uncompressed variant
    p2 = root.create_array("raw", data[0], chunks=(9, 8, 8), compressor=None)
    np.testing.assert_array_equal(open_array(p2), data[0])
    # zarr-v2 metadata sanity
    meta = json.load(open(os.path.join(path, ".zarray")))
    assert meta["zarr_format"] == 2
    assert meta["dtype"] == "<f2"
    assert meta["compressor"]["id"] in ("blosc", "zstd", "zlib")


def make_fake_case(raw_dir, name, t=12, h=16, w=24):
    rng = np.random.default_rng(1)
    os.makedirs(raw_dir, exist_ok=True)
    path = os.path.join(raw_dir, f"{name}.h5")
    with h5py.File(path, "w") as f:
        turb = rng.normal(1.0, 0.05, (t, 9, h, w)).astype(np.float32)
        f.create_dataset("turbulence", data=turb)
        mask = np.zeros((h, w), np.float32)
        mask[5:9, 8:12] = 1.0
        from lbm2d_tpu.io.sdf import signed_distance_field

        f.create_dataset("static_mask", data=np.stack([mask, signed_distance_field(mask)]))
        f.create_dataset("mean_vel_field", data=turb.mean(axis=0))
        f.create_dataset("mean_vel_sq_field", data=(turb[:, 3] ** 2).mean(axis=0))
        f.create_dataset("sum_vor", data=np.abs(turb[:, 8]).sum(axis=0))
    return path


def test_h5_to_zarr_pipeline(tmp_path):
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "zarr")
    summary = [
        {
            "case_name": "case_a",
            "status": "Success",
            "run_summary": {"h5_file": "case_a.h5"},
            "parameters": {"physical_scaled": {"reynolds_number_calculated": 42.0}},
        },
        {"case_name": "bad", "status": "Failed"},
    ]
    make_fake_case(raw, "case_a")
    spath = str(tmp_path / "summary.json")
    with open(spath, "w") as fh:
        json.dump(summary, fh)

    stats = h5_to_zarr_run(spath, raw, out)
    assert stats["cases"] == ["case_a"]
    assert os.path.exists(os.path.join(out, "global_stats.json"))

    zdir = os.path.join(out, "case_a.zarr")
    turb = open_array(os.path.join(zdir, "turbulence"))
    assert turb.dtype == np.float16
    # z-scored: overall mean ~0, std ~1 per channel
    t32 = turb.astype(np.float64)
    assert abs(t32.mean()) < 0.1
    assert 0.5 < t32.std() < 1.5
    for name in ("vor", "sdf", "mix"):
        wmap = open_array(os.path.join(zdir, "sampling_weights", name))
        assert wmap.dtype == np.float32
        assert wmap.min() >= 0.0 and wmap.max() <= 1.0 + 1e-6
    sm = open_array(os.path.join(zdir, "static_mask"))
    assert sm.shape[0] == 2
    assert read_attrs(zdir)["reynolds_number"] == 42.0


def test_zarr_interop_independent_spec_reader(tmp_path):
    """The C28 contract: zarrlite output must be consumable by the real zarr
    2.x stack unchanged. zarr/numcodecs are not installed in this image, so
    the proof is a round-trip through tests/zarr_spec_reader.py -- a reader
    written independently FROM the Zarr v2 spec (not from zarrlite)."""
    from tests.zarr_spec_reader import read_array, read_group_attrs

    # full pipeline output, not a toy array
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "zarr")
    summary = [
        {
            "case_name": "case_a",
            "status": "Success",
            "run_summary": {"h5_file": "case_a.h5"},
            "parameters": {"physical_scaled": {"reynolds_number_calculated": 7.0}},
        }
    ]
    make_fake_case(raw, "case_a", t=11, h=16, w=24)  # 11: forces edge chunks
    spath = str(tmp_path / "summary.json")
    with open(spath, "w") as fh:
        json.dump(summary, fh)
    h5_to_zarr_run(spath, raw, out)

    zdir = os.path.join(out, "case_a.zarr")
    for name in (
        "turbulence",
        "static_mask",
        "mean_vel_field",
        "sampling_weights/vor",
        "sampling_weights/sdf",
        "sampling_weights/mix",
    ):
        path = os.path.join(zdir, name)
        spec_view = read_array(path)
        zarrlite_view = open_array(path)
        np.testing.assert_array_equal(
            spec_view, zarrlite_view,
            err_msg=f"{name}: independent spec reader disagrees with zarrlite",
        )
    assert read_group_attrs(zdir)["reynolds_number"] == 7.0

    # spot-check spec details the downstream loader relies on
    meta = json.load(open(os.path.join(zdir, "turbulence", ".zarray")))
    assert meta["dtype"] == "<f2" and meta["order"] == "C"
    # the reference contract compressor: numcodecs Blosc(zstd, 5, BITSHUFFLE)
    # (reference h5_to_zarr_pipeline.py:13-19); zstd/zlib are the fallbacks
    comp = meta["compressor"]
    assert comp["id"] in ("blosc", "zstd", "zlib")
    if comp["id"] == "blosc":
        assert comp["cname"] == "zstd" and comp["clevel"] == 5
        assert comp["shuffle"] == 2  # numcodecs Blosc.BITSHUFFLE


def test_bloscmini_roundtrip_matrix():
    """c-blosc1 chunk codec: roundtrip across shuffle modes, dtypes, sizes.

    Covers multi-block chunks (size > blocksize), non-multiple-of-8 element
    tails (bitshuffle raw-tail path), incompressible data (stored-block
    escape), the empty buffer, and the whole-chunk memcpy escape."""
    import pytest
    from lbm2d_tpu.post import bloscmini

    if not bloscmini.available():
        pytest.skip("zstandard module absent")
    rng = np.random.default_rng(3)
    cases = [
        np.zeros(100_000, np.float32),                       # compressible
        rng.standard_normal(70_001).astype(np.float64),      # odd count tail
        rng.integers(0, 2**16, 333, np.uint16).astype("<u2"),
        (rng.random(65536) * 255).astype(np.uint8),          # incompressible
        np.arange(13, dtype=np.int64),                       # < 8 elements/block tail
        np.empty(0, np.float32),                             # empty chunk
    ]
    for arr in cases:
        raw = arr.tobytes()
        t = arr.dtype.itemsize
        for shuffle in (bloscmini.NOSHUFFLE, bloscmini.SHUFFLE, bloscmini.BITSHUFFLE):
            for blocksize in (0, 4096):
                chunk = bloscmini.compress(raw, t, clevel=5, shuffle=shuffle,
                                           blocksize=blocksize)
                assert bloscmini.decompress(chunk) == raw
                # header sanity: nbytes field == payload length
                import struct as _s
                nbytes = _s.unpack_from("<i", chunk, 4)[0]
                assert nbytes == len(raw)


def test_bloscmini_vs_independent_spec_decoder():
    """bloscmini's encoder must be decodable by the independently written
    c-blosc1 decoder in tests/zarr_spec_reader.py (different bit-unshuffle
    formulation) -- format-level interop evidence, same role as the zarr
    spec-reader test."""
    import pytest
    from lbm2d_tpu.post import bloscmini
    from tests.zarr_spec_reader import _blosc_decode_chunk

    if not bloscmini.available():
        pytest.skip("zstandard module absent")
    rng = np.random.default_rng(4)
    arr = rng.normal(size=(9, 64, 64)).astype("<f2")
    raw = arr.tobytes()
    for shuffle in (bloscmini.NOSHUFFLE, bloscmini.SHUFFLE, bloscmini.BITSHUFFLE):
        chunk = bloscmini.compress(raw, 2, clevel=5, shuffle=shuffle,
                                   blocksize=8192)
        assert _blosc_decode_chunk(chunk) == raw


def test_spec_reader_handles_missing_chunks_and_orders(tmp_path):
    """Spec-reader edge cases zarrlite's writer never emits (fill_value for
    absent chunks, F order) -- guards the reader itself against accidentally
    encoding zarrlite-specific assumptions."""
    import zlib as _zlib
    from tests.zarr_spec_reader import read_array

    store = tmp_path / "arr"
    store.mkdir()
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    meta = {
        "zarr_format": 2,
        "shape": [3, 8],
        "chunks": [3, 4],
        "dtype": "<f4",
        "order": "F",
        "fill_value": -1.0,
        "compressor": {"id": "zlib", "level": 1},
        "filters": None,
    }
    (store / ".zarray").write_text(json.dumps(meta))
    (store / "0.0").write_bytes(_zlib.compress(data.tobytes(order="F")))
    # chunk (0, 1) deliberately missing -> fill_value
    out = read_array(str(store))
    np.testing.assert_array_equal(out[:, :4], data)
    assert (out[:, 4:] == -1.0).all()
