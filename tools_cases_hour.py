"""Record a cases/hour measurement from a finished batch_run work root.

Usage:
  python tools_cases_hour.py --root /tmp/prod_r3 --label lockstep_video \
      [--note "..."] [--out docs/benchmarks/cases_hour_r3.json]

Reads {root}/start_ts (epoch seconds written just before launch) and
{root}/end_ts if present (else the newest mtime under outputs/), counts
Success cases and their artifacts from outputs/<project>/plots/
sim_results.json, and appends one record to the output JSON. The artifact
audit mirrors the reference's per-case output contract
(reference pipeline/batch_run.py:292-299: raw/*.h5 + vis/*.mp4 +
sim_results/all_cases_summary/all_cases_vectors.npz).
"""

from __future__ import annotations

import argparse
import json
import os


def newest_mtime(path: str) -> float:
    newest = 0.0
    for dirpath, _dirs, files in os.walk(path):
        for fn in files:
            newest = max(newest, os.path.getmtime(os.path.join(dirpath, fn)))
    return newest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--label", required=True)
    ap.add_argument("--note", default="")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "docs", "benchmarks", "cases_hour_r3.json",
        ),
    )
    args = ap.parse_args()

    start = float(open(os.path.join(args.root, "start_ts")).read().strip())
    end_file = os.path.join(args.root, "end_ts")
    outputs = os.path.join(args.root, "outputs")
    if os.path.exists(end_file):
        end = float(open(end_file).read().strip())
    else:
        end = newest_mtime(outputs)
    elapsed = end - start

    projects = sorted(os.listdir(outputs))
    assert len(projects) == 1, projects
    proj = os.path.join(outputs, projects[0])
    sim_results = json.load(open(os.path.join(proj, "plots", "sim_results.json")))

    n_success = n_failed = 0
    steps_total = 0
    missing = []
    videos = 0
    transfer_groups = {}  # group_uid -> transfer record (dedup group members)
    for rec in sim_results:
        cfg_name = rec.get("config_filename", "?")
        status = rec.get("status")
        if status == "Success":
            n_success += 1
            steps_total += int(
                rec.get("parameters", {})
                .get("simulation_outputs", {})
                .get("total_steps_executed", 0)
            )
            rs = rec.get("run_summary", {})
            tr = rs.get("transfer")
            if tr and tr.get("group_uid"):
                transfer_groups[tr["group_uid"]] = tr
            h5 = rs.get("h5_file")
            vid = rs.get("video_file")
            if h5 in (None, "", "N/A") or not os.path.exists(
                os.path.join(proj, "raw", h5)
            ):
                missing.append((cfg_name, "h5", h5))
            if vid not in (None, "", "N/A"):
                if os.path.exists(os.path.join(proj, "vis", vid)):
                    videos += 1
                else:
                    missing.append((cfg_name, "video", vid))
        elif status == "Failed":
            n_failed += 1

    for fn in ("all_cases_summary.json", "all_cases_vectors.npz"):
        if not os.path.exists(os.path.join(proj, "plots", fn)):
            missing.append(("<batch>", "plots", fn))

    # Structured link health (VERDICT r4 item 2): probes measured by the
    # lockstep runner before/after each group, stamped per-case into
    # run_summary.transfer. A record is only comparable to the headline if
    # every probe cleared the BASELINE.md gate (>= 20 MB/s sustained D2H).
    link = None
    if transfer_groups:
        trs = list(transfer_groups.values())
        probes = [t["link_d2h_mbps_pre"] for t in trs] + [
            t["link_d2h_mbps_post"] for t in trs
        ]
        link = {
            "n_groups": len(trs),
            "link_d2h_mbps_min": min(probes),
            "link_d2h_mbps_max": max(probes),
            "bytes_fetched_total": sum(t.get("bytes_fetched", 0) for t in trs),
            "fetch_stall_s_total": round(
                sum(t.get("fetch_stall_s", 0.0) for t in trs), 1
            ),
            "fetch_group_sizes": sorted(
                t.get("fetch_group_size_final", 1) for t in trs
            ),
            "link_healthy": min(probes) >= 20.0,  # BASELINE.md gate
        }

    rec = {
        "label": args.label,
        "root": args.root,
        "n_success": n_success,
        "n_failed": n_failed,
        "steps_total": steps_total,
        "videos": videos,
        "elapsed_s": round(elapsed, 1),
        "cases_per_hour": round(n_success / (elapsed / 3600.0), 2),
        "link": link,
        "missing_artifacts": missing,
        "note": args.note,
    }
    print(json.dumps(rec, indent=2))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    existing = []
    if os.path.exists(args.out):
        existing = json.load(open(args.out))
    existing.append(rec)
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=2)
    print(f"appended -> {args.out}")


if __name__ == "__main__":
    main()
