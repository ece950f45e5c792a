"""Environment doctor: `python -m lbm2d_tpu.native`.

Reports what the current host supports — the native C++ encode worker (and
its compiler error when it can't build), the JAX backend/devices, and the
pinned-package versions — so a bring-up failure is diagnosable without
reading tracebacks. Exit code 0 even when optional pieces are missing: only
the Python stack in requirements.txt is mandatory.
"""

from __future__ import annotations

import importlib.metadata as _md

from . import build_error, load_videoenc


def main() -> None:
    print("== lbm2d_tpu environment check ==")

    print("\n[python packages]")
    for pkg in ("jax", "jaxlib", "flax", "numpy", "scipy", "h5py", "PyYAML",
                "opencv-python", "matplotlib", "zstandard", "tqdm", "pytest"):
        try:
            print(f"  {pkg:<16} {_md.version(pkg)}")
        except _md.PackageNotFoundError:
            print(f"  {pkg:<16} MISSING (pip install -r requirements.txt)")

    print("\n[jax backend]")
    try:
        import jax

        devices = jax.devices()
        print(f"  platform={devices[0].platform} devices={len(devices)}")
    except Exception as exc:  # noqa: BLE001 - doctor reports, never raises
        print(f"  UNAVAILABLE: {exc}")

    print("\n[native video encoder]")
    lib = load_videoenc()
    if lib is not None:
        print(f"  OK: backend={lib.venc_backend().decode()}")
    else:
        err = build_error() or "disabled (LBM2D_NO_NATIVE set?)"
        print("  unavailable -> cv2/imageio fallback will be used")
        print(f"  reason: {err.strip().splitlines()[-1] if err else err}")
        print("  (Debian: apt install g++ libavcodec-dev libavformat-dev "
              "libswscale-dev)")


if __name__ == "__main__":
    main()
