"""Crash-safe run-state store: config_meta.json -> sim_results.json bridge.

Parity target: reference io/sim_results_io.py. Status machine per case
(keyed by config_filename): Pending -> Running -> Success | Failed; "Running"
entries are retried after a crash, Success/Failed are skipped. All writes are
atomic (tmp + os.replace).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

from .json_utils import read_json, write_json_atomic

STATUS_PENDING = "Pending"
STATUS_RUNNING = "Running"
STATUS_SUCCESS = "Success"
STATUS_FAILED = "Failed"


def load_config_meta(config_meta_path: str) -> Dict[str, dict]:
    """Return {config_filename: entry} from config_meta.json (read-only source)."""
    entries = read_json(config_meta_path, default=[]) or []
    result: Dict[str, dict] = {}
    for entry in entries:
        key = entry.get("config_filename")
        if key:
            result[key] = entry
    return result


def init_sim_results(config_meta: Dict[str, dict], sim_results_path: str) -> None:
    """Seed sim_results.json from config_meta if absent; never overwrite."""
    if os.path.exists(sim_results_path):
        return
    write_json_atomic(list(config_meta.values()), sim_results_path)


def get_status_map(sim_results_path: str) -> Dict[str, str]:
    entries = read_json(sim_results_path, default=[]) or []
    return {
        e["config_filename"]: e.get("status", "Unknown")
        for e in entries
        if "config_filename" in e
    }


def set_status(
    config_filename: str,
    status: str,
    sim_results_path: str,
    extra_fields: Optional[Dict[str, Any]] = None,
) -> None:
    """Update one entry's status in place; create a minimal entry if missing."""
    entries = read_json(sim_results_path, default=[]) or []
    for entry in entries:
        if entry.get("config_filename") == config_filename:
            entry["status"] = status
            if extra_fields:
                entry.update(extra_fields)
            break
    else:
        new_entry: Dict[str, Any] = {"config_filename": config_filename, "status": status}
        if extra_fields:
            new_entry.update(extra_fields)
        entries.append(new_entry)
    write_json_atomic(entries, sim_results_path)


def fill_simulation_outputs(
    config_filename: str,
    simulation_outputs: Dict[str, Any],
    run_summary: Dict[str, Any],
    wall_time_s: float,
    sim_results_path: str,
) -> bool:
    """Record a successful run's measured outputs; Tier 1/2/3 physics stay as
    precomputed in config_meta. Returns False if the entry is missing."""
    entries = read_json(sim_results_path, default=[]) or []
    for entry in entries:
        if entry.get("config_filename") != config_filename:
            continue
        entry["status"] = STATUS_SUCCESS
        entry["wall_time_s"] = round(wall_time_s, 2)
        sim_out = entry.get("parameters", {}).get("simulation_outputs", {})
        sim_out.update(
            {
                "actual_reynolds_number": simulation_outputs.get("actual_reynolds_number"),
                "total_steps_executed": simulation_outputs.get("total_steps_executed"),
                "tensor_shapes": simulation_outputs.get("tensor_shapes"),
            }
        )
        sim_out.pop("_note", None)
        entry.setdefault("parameters", {})["simulation_outputs"] = sim_out
        entry["run_summary"] = run_summary
        write_json_atomic(entries, sim_results_path)
        return True
    return False
