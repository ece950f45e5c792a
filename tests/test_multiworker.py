"""Multi-worker batch coordination (VERDICT r3 missing #1).

SURVEY §2.2's case-level distributed axis: N independent worker processes
sharing one project over a filesystem split the pending cases via atomic
claim files, and the status store merges updates under a file lock. These
tests cover the claim primitive, the store's lost-update safety, and a real
two-process concurrent run with disjoint case ownership.
"""

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

import numpy as np
import yaml

from lbm2d_tpu.pipeline.coordination import ClaimStore
from tests.test_pipeline_e2e import make_project


# ---------------------------------------------------------------- ClaimStore

def test_claim_excludes_other_workers(tmp_path):
    plots = str(tmp_path)
    a = ClaimStore(plots, worker_id="A")
    b = ClaimStore(plots, worker_id="B")
    assert a.claim("case1.yaml")
    assert a.claim("case1.yaml")  # idempotent for the owner
    assert not b.claim("case1.yaml")
    assert b.claim("case2.yaml")
    assert a.owned() == ["case1.yaml"] and b.owned() == ["case2.yaml"]
    a.release("case1.yaml")
    assert b.claim("case1.yaml")  # released claims are available again


def test_claim_release_all_empties_dir(tmp_path):
    s = ClaimStore(str(tmp_path), worker_id="W")
    for i in range(3):
        assert s.claim(f"c{i}.yaml")
    s.release_all()
    assert s.owned() == []
    assert os.listdir(os.path.join(str(tmp_path), ".claims")) == []


def test_dead_same_host_claim_is_stolen(tmp_path):
    """A claim held by a dead pid on this host is reclaimable."""
    import socket

    plots = str(tmp_path)
    dead_pid = _reap_pid()  # a real pid that existed and is now free
    os.makedirs(os.path.join(plots, ".claims"), exist_ok=True)
    with open(os.path.join(plots, ".claims", "x.yaml.claim"), "w") as fh:
        json.dump({"worker": "dead", "host": socket.gethostname(),
                   "pid": dead_pid, "claimed_at": time.time()}, fh)
    alive = ClaimStore(plots, worker_id="alive")
    assert alive.claim("x.yaml"), "dead same-host claim must be stealable"


def _reap_pid():
    """A pid that existed and is now free: spawn + reap a trivial child."""
    p = subprocess.Popen([sys.executable, "-c", "pass"])
    p.wait()
    return p.pid


def test_live_claim_is_not_stolen_without_timeout(tmp_path):
    """A claim owned by a LIVE pid is never stolen by default."""
    plots = str(tmp_path)
    mine = ClaimStore(plots, worker_id="mine")
    assert mine.claim("x.yaml")
    other = ClaimStore(plots, worker_id="other")
    assert not other.claim("x.yaml")


def test_stale_heartbeat_claim_is_stolen_with_timeout(tmp_path):
    """With reclaim_stale set, a silent claim is stolen after the timeout;
    a fresh heartbeat protects it."""
    plots = str(tmp_path)
    owner = ClaimStore(plots, worker_id="owner")
    assert owner.claim("x.yaml")
    # simulate a foreign host (bypasses the same-host pid liveness path)
    path = os.path.join(plots, ".claims", "x.yaml.claim")
    with open(path, "w") as fh:
        json.dump({"worker": "owner", "host": "elsewhere", "pid": 1,
                   "claimed_at": time.time()}, fh)
    old = time.time() - 100.0
    os.utime(path, (old, old))
    thief = ClaimStore(plots, worker_id="thief", stale_s=3600.0)
    assert not thief.claim("x.yaml")  # not stale yet at 1 h
    thief2 = ClaimStore(plots, worker_id="thief2", stale_s=50.0)
    assert thief2.claim("x.yaml")  # 100 s silent > 50 s timeout

    # heartbeat refresh protects an owned claim from the timeout policy
    owner2 = ClaimStore(plots, worker_id="o2")
    assert owner2.claim("y.yaml")
    ypath = os.path.join(plots, ".claims", "y.yaml.claim")
    os.utime(ypath, (old, old))
    owner2.heartbeat()
    thief3 = ClaimStore(plots, worker_id="thief3", stale_s=50.0)
    assert not thief3.claim("y.yaml")


# ------------------------------------------------------------ store merging

def test_concurrent_status_writes_lose_nothing(tmp_path):
    """N processes hammering set_status on disjoint cases: every update
    survives (the reference's lock-free read-modify-write loses ~half)."""
    from lbm2d_tpu.io import results_store

    path = str(tmp_path / "sim_results.json")
    results_store.init_sim_results(
        {f"c{i}.yaml": {"config_filename": f"c{i}.yaml", "status": "Pending"}
         for i in range(24)},
        path,
    )

    # spawn, not fork: this pytest parent runs a multithreaded JAX runtime,
    # and fork-under-threads is the classic intermittent-deadlock pattern
    # (CPython warns for exactly this). The target lives in tests/_mw_worker
    # so the fresh interpreters import only the JSON store, not JAX.
    from tests._mw_worker import hammer

    ctx = mp.get_context("spawn")
    procs = [ctx.Process(target=hammer, args=(path, lo, lo + 8))
             for lo in (0, 8, 16)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
        assert p.exitcode == 0
    entries = {e["config_filename"]: e for e in json.load(open(path))}
    assert len(entries) == 24
    for i in range(24):
        e = entries[f"c{i}.yaml"]
        assert e["status"] == "Success" and e["wall_time_s"] == i, e


# ------------------------------------------------------- two-process datagen

def make_cases_project(root, name="MW", nus=(0.05, 0.04, 0.03, 0.02)):
    """N same-shape cases (different nu) sharing one mask."""
    cfg_name = make_project(root, name=name)
    cfg_dir = os.path.join(root, "SimCases", name, "configs")
    with open(os.path.join(cfg_dir, cfg_name)) as fh:
        base = yaml.safe_load(fh)
    base["outputs"]["video"]["enable"] = False
    names = []
    for nu in nus:
        cfg = json.loads(json.dumps(base))
        tag = f"Nu0-{int(nu * 1e4):04d}"
        cfg["simulation"]["nu"] = nu
        cfg["simulation"]["name"] = f"mask_00_{tag}"
        fname = f"mask_00_cfg_{tag}.yaml"
        with open(os.path.join(cfg_dir, fname), "w") as fh:
            yaml.safe_dump(cfg, fh, sort_keys=False)
        names.append(fname)
    # nu=0.05 regenerates cfg_name itself (video disabled), so exactly the
    # loop-written configs exist
    assert cfg_name in names
    return sorted(names)


def make_four_case_project(root, name="MW"):
    """Four same-shape cases (different nu) sharing one mask."""
    return make_cases_project(root, name=name)


_WATCHDOG = """
import faulthandler, sys
# hang tripwire: dump ALL thread stacks and die instead of wedging the
# suite until the communicate() timeout (caught the axon-backend hang below)
faulthandler.dump_traceback_later(240, exit=True, file=sys.stderr)
# force the CPU backend the way the root conftest does: the ambient axon
# sitecustomize re-pins JAX_PLATFORMS to the single tunneled TPU regardless
# of the env var we pass, and TWO workers sharing that tunnel deadlock in
# the transfer path (reproduced: both parked in jax.Array._value with the
# 'Platform axon is experimental' banner in the captured output)
import jax
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
"""

_WORKER_SNIPPET = _WATCHDOG + """
import json, sys
from lbm2d_tpu.pipeline.batch_datagen import run_batched
stats = run_batched(
    "MW", max_batch=1, root=sys.argv[1], progress=False, video=False,
    coordinate=True, worker_id=sys.argv[2],
)
print("STATS " + json.dumps(stats))
"""


def test_two_workers_split_one_project(tmp_path):
    """Two concurrent run_batched processes on one project: disjoint case
    sets, no double-runs, no lost updates, complete final artifacts
    (VERDICT r3 'Next round' item 2 done-criterion)."""
    root = str(tmp_path)
    names = make_four_case_project(root)

    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER_SNIPPET, root, wid],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        for wid in ("workerA", "workerB")
    ]
    outs = [p.communicate(timeout=330)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    stats = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("STATS ")]
        assert line, out[-3000:]
        stats.append(json.loads(line[-1][6:]))

    # every case ran exactly once across the two workers
    total_success = sum(s["success"] for s in stats)
    assert total_success == 4, (stats, outs[0][-2000:])

    plots = os.path.join(root, "outputs", "MW", "plots")
    with open(os.path.join(plots, "sim_results.json")) as fh:
        entries = {e["config_filename"]: e for e in json.load(fh)}
    owners = {}
    for n in names:
        assert entries[n]["status"] == "Success", entries[n]
        owners.setdefault(entries[n]["worker"], []).append(n)
    assert set(owners) <= {"workerA", "workerB"}
    # with 4 cases and simultaneous start both workers should win some; if
    # scheduling starved one entirely the disjointness still holds
    assert sum(len(v) for v in owners.values()) == 4

    # per-case artifacts all present
    raw = os.path.join(root, "outputs", "MW", "raw")
    import h5py

    for n in names:
        case = n.replace("_cfg", "").replace(".yaml", "")
        with h5py.File(os.path.join(raw, f"{case}.h5")) as f:
            assert f["turbulence"].shape[0] >= 1
            assert np.isfinite(f["turbulence"][:]).all()

    # the last worker out built the complete NPZ
    vec = np.load(os.path.join(plots, "all_cases_vectors.npz"),
                  allow_pickle=True)
    assert len(vec["case_names"]) == 4

    # claims all released
    claims_dir = os.path.join(plots, ".claims")
    assert os.listdir(claims_dir) == []


# ------------------------------------- multi-worker x multi-chip composition

_WORKER_SHARDED_SNIPPET = _WATCHDOG + """
import json, sys
from lbm2d_tpu.pipeline.batch_datagen import run_batched
stats = run_batched(
    "MWC", max_batch=4, root=sys.argv[1], progress=False, video=False,
    coordinate=True, worker_id=sys.argv[2], runner="sharded", n_devices=4,
)
print("STATS " + json.dumps(stats))
"""


def test_two_workers_with_four_devices_each(tmp_path):
    """The full SURVEY §2.2 deployment shape (VERDICT r4 item 8): N
    independent worker processes over the DCN/filesystem axis, EACH driving
    a multi-chip ('cases',) device mesh. Two workers x 4 CPU devices split
    an 8-case project: disjoint ownership, complete artifacts, and the
    case-sharded engine tolerating whatever group sizes the claim race
    leaves (mesh auto-fit)."""
    root = str(tmp_path)
    names = make_cases_project(
        root, name="MWC",
        nus=(0.05, 0.045, 0.04, 0.035, 0.03, 0.025, 0.02, 0.015),
    )
    assert len(names) == 8

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER_SHARDED_SNIPPET, root, wid],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        for wid in ("workerA", "workerB")
    ]
    outs = [p.communicate(timeout=330)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    stats = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("STATS ")]
        assert line, out[-3000:]
        stats.append(json.loads(line[-1][6:]))
    assert sum(s["success"] for s in stats) == 8, (stats, outs[0][-2000:])

    plots = os.path.join(root, "outputs", "MWC", "plots")
    with open(os.path.join(plots, "sim_results.json")) as fh:
        entries = {e["config_filename"]: e for e in json.load(fh)}
    owners = {}
    for n in names:
        assert entries[n]["status"] == "Success", entries[n]
        owners.setdefault(entries[n]["worker"], []).append(n)
    assert set(owners) <= {"workerA", "workerB"}
    assert sum(len(v) for v in owners.values()) == 8

    raw = os.path.join(root, "outputs", "MWC", "raw")
    import h5py

    for n in names:
        case = n.replace("_cfg", "").replace(".yaml", "")
        with h5py.File(os.path.join(raw, f"{case}.h5")) as f:
            assert f["turbulence"].shape[0] >= 1
            assert np.isfinite(f["turbulence"][:]).all()

    vec = np.load(os.path.join(plots, "all_cases_vectors.npz"),
                  allow_pickle=True)
    assert len(vec["case_names"]) == 8
    assert os.listdir(os.path.join(plots, ".claims")) == []
