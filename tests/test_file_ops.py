"""File-housekeeping tool tests (rename / export / backup) + LHS sampler."""

import os

import numpy as np

from lbm2d_tpu.tools.file_ops import backup_project, export_codebase, rename_masks
from lbm2d_tpu.utils.physics import latin_hypercube, parabolic_inlet_velocity


def test_rename_masks(tmp_path):
    d = str(tmp_path)
    for name in ("zebra.png", "alpha.png", "mid.png", "notes.txt"):
        open(os.path.join(d, name), "w").close()
    changes = rename_masks(d, dry_run=False)
    files = sorted(os.listdir(d))
    assert "mask_00.png" in files and "mask_02.png" in files
    assert "notes.txt" in files  # non-png untouched
    assert len(changes) == 3


def test_export_codebase(tmp_path):
    root = tmp_path / "proj"
    (root / "pkg").mkdir(parents=True)
    (root / "pkg" / "a.py").write_text("print('hi')\n")
    (root / "README.md").write_text("# readme\n")
    (root / "skip.bin").write_bytes(b"\x00")
    out = str(tmp_path / "dump.txt")
    n = export_codebase(str(root), out)
    text = open(out).read()
    assert n == 2
    assert "FILE: README.md" in text and "print('hi')" in text
    assert "skip.bin" not in text


def test_backup_project(tmp_path):
    root = tmp_path / "ws"
    (root / "SimCases" / "P" / "configs").mkdir(parents=True)
    (root / "SimCases" / "P" / "masks").mkdir(parents=True)
    (root / "outputs" / "P" / "plots").mkdir(parents=True)
    (root / "outputs" / "P" / "raw").mkdir(parents=True)
    (root / "SimCases" / "P" / "configs" / "c.yaml").write_text("a: 1")
    (root / "SimCases" / "P" / "masks" / "m.png").write_bytes(b"x")
    (root / "SimCases" / "P" / "config_meta.json").write_text("[]")
    (root / "outputs" / "P" / "plots" / "sim_results.json").write_text("[]")
    (root / "outputs" / "P" / "raw" / "case.h5").write_bytes(b"h5")
    dest = str(tmp_path / "bak")
    copied = backup_project("P", dest, root=str(root))
    assert "config_meta.json" in copied
    assert os.path.exists(os.path.join(dest, "P", "raw", "case.h5"))
    copied2 = backup_project("P", str(tmp_path / "bak2"), root=str(root), include_h5=False)
    assert not any(c.startswith("raw") for c in copied2)


def test_parabolic_inlet():
    prof = parabolic_inlet_velocity(np.arange(11), u_max=0.1, ny=11)
    assert prof[0] == 0 and prof[-1] == 0
    assert abs(prof[5] - 0.1) < 1e-12  # peak at center


def test_latin_hypercube_stratified():
    rng = np.random.default_rng(0)
    x = latin_hypercube(10, [(0.0, 1.0), (5.0, 15.0)], rng)
    assert x.shape == (10, 2)
    # one sample per decile in each dimension
    assert sorted(np.floor((np.sort(x[:, 0])) * 10).astype(int).tolist()) == list(range(10))
    assert x[:, 1].min() >= 5 and x[:, 1].max() <= 15
