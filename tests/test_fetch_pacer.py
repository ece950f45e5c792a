"""Adaptive fetch pacing (VERDICT r4 item 3).

Two layers: (a) controller math against a throttled fake link -- the pacer
must lift compute utilization above a stated floor where the unpaced
scheduler sits below it; (b) artifact byte-parity -- a lockstep group run
with forced fetch batching produces HDF5/video-frame streams identical to
the unpaced run (frames are coalesced in transit, never dropped/reordered).
"""

import json
import os

import h5py
import numpy as np
import yaml

from lbm2d_tpu.pipeline.fetch_pacer import FetchPacer
from tests.test_multiworker import make_four_case_project


# --------------------------------------------------------------- controller


class FakeLink:
    """Throttled D2H link: transfer time = fixed + per_frame * n.

    Mimics the deferred-fetch loop's control flow: a transfer started after
    chunk t overlaps chunk t+1's device compute; the un-hidden remainder is
    the join stall the host eats before dispatching t+2 (the measured
    behavior of pipeline/batch_datagen's worker-thread fetch).
    """

    def __init__(self, fixed_s, per_frame_s, chunk_s):
        self.fixed = fixed_s
        self.per = per_frame_s
        self.chunk = chunk_s

    def run(self, pacer, n_chunks=400, saves_per_chunk=1):
        compute = stall = 0.0
        pending = 0
        in_flight = None  # transfer duration started last chunk
        frames_fetched = 0
        for _ in range(n_chunks):
            compute += self.chunk
            chunk_stall = 0.0
            if in_flight is not None:
                chunk_stall = max(0.0, in_flight - self.chunk)
                stall += chunk_stall
                in_flight = None
            if pacer is not None:
                pacer.record_chunk(self.chunk, chunk_stall)
            pending += saves_per_chunk
            if pacer is None or pacer.should_fetch(pending):
                in_flight = self.fixed + self.per * pending
                frames_fetched += pending
                pending = 0
        # final flush
        if pending:
            stall += self.fixed + self.per * pending
            frames_fetched += pending
        return compute / (compute + stall), frames_fetched


def test_pacer_lifts_utilization_above_floor():
    """Fixed-cost-dominated slow link: unpaced utilization sits under 60%;
    the pacer's grouped fetches must hold >= 75% (stated floor)."""
    link = lambda: FakeLink(fixed_s=0.15, per_frame_s=0.02, chunk_s=0.10)

    util_unpaced, n_unpaced = link().run(None)
    assert util_unpaced < 0.60, util_unpaced  # the problem exists

    pacer = FetchPacer(stall_hi=0.20, stall_lo=0.05, max_group=8, window=8)
    util_paced, n_paced = link().run(pacer)
    assert n_paced == n_unpaced  # every frame still fetched exactly once
    assert pacer.group_size > 1, "pacer never adapted on a stalling link"
    assert util_paced >= 0.75, (util_paced, pacer.group_size)


def test_pacer_stays_at_one_on_healthy_link():
    """Transfers fully hidden under compute: group stays 1 (identical
    scheduling to the pre-pacer loop)."""
    pacer = FetchPacer()
    link = FakeLink(fixed_s=0.01, per_frame_s=0.005, chunk_s=0.10)
    util, _ = link.run(pacer)
    assert util > 0.95
    assert pacer.group_size == 1
    assert pacer.adaptations == 0


def test_pacer_shrinks_back_when_link_recovers():
    pacer = FetchPacer(window=4)
    for _ in range(8):  # stalling: grow
        pacer.record_chunk(0.1, 0.1)
    assert pacer.group_size > 1
    for _ in range(40):  # healthy again: shrink to 1
        pacer.record_chunk(0.1, 0.0)
    assert pacer.group_size == 1


def test_pacer_lean_recommendation_only_at_max_group():
    pacer = FetchPacer(max_group=2, window=4)
    for _ in range(12):
        pacer.record_chunk(0.05, 0.2)
    assert pacer.group_size == 2
    assert pacer.lean_recommended
    s = pacer.stats()
    assert s["fetch_stall_s"] > 0 and 0 < s["fetch_stall_fraction"] < 1


# -------------------------------------------------------------- byte parity


def _run_group(root, pacer):
    from lbm2d_tpu.pipeline import paths
    from lbm2d_tpu.pipeline.batch_datagen import run_lockstep_group
    from lbm2d_tpu.utils.config import load_config

    names = make_four_case_project(root, name="FP")
    project_paths = paths.get_project_paths("FP", root=root)
    output_dirs = paths.setup_output_directories(project_paths["outputs"])
    members = [
        (n, load_config(os.path.join(project_paths["configs"], n)))
        for n in names[:2]
    ]
    entries = run_lockstep_group(
        members, project_paths, output_dirs, progress=False, video=False,
        pacer=pacer,
    )
    return entries, output_dirs


def test_grouped_fetch_byte_parity(tmp_path):
    """Forced group-4 batching vs unpaced: identical HDF5 datasets, and the
    structured transfer record is stamped into run_summary."""
    frozen = FetchPacer(stall_hi=0.99, stall_lo=0.0)  # never adapts...
    frozen.group_size = 4  # ...but batches every 4 save events

    runs = {}
    for tag, pacer in (("plain", None), ("grouped", frozen)):
        root = str(tmp_path / tag)
        os.makedirs(root)
        entries, output_dirs = _run_group(root, pacer)
        assert all(e["status"] == "Success" for e in entries), entries
        runs[tag] = (entries, output_dirs)

    cases = [
        e["case_name"] for e in runs["plain"][0]
    ]  # the two group members (sorted-nu order from make_four_case_project)
    assert len(cases) == 2
    for case in cases:
        data = {}
        for tag, (_e, dirs) in runs.items():
            with h5py.File(os.path.join(dirs["raw"], case + ".h5")) as f:
                data[tag] = {k: f[k][...].tobytes() for k in f.keys()}
        assert set(data["plain"]) == set(data["grouped"])
        for k in data["plain"]:
            assert data["plain"][k] == data["grouped"][k], (case, k)

    # structured link record present with real numbers
    for tag, (entries, _d) in runs.items():
        tr = entries[0]["run_summary"]["transfer"]
        assert tr["link_d2h_mbps_pre"] > 0
        assert tr["link_d2h_mbps_post"] > 0
        assert tr["bytes_fetched"] > 0
    # the grouped run reports its forced group size
    tr = runs["grouped"][0][0]["run_summary"]["transfer"]
    assert tr["fetch_group_size_final"] == 4
