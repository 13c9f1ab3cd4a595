"""Explicit build entry point for the native C++ components.

The runtime bindings (data/native_loader.py, data/native_video.py) only
``CDLL`` a pre-existing ``.so`` and fall back to python/cv2 with a one-time
warning — they never shell out to the compiler as a side effect of a decode
call (a slow or broken toolchain would otherwise make the first call
unpredictable, and the failure used to be silently swallowed).

Build explicitly instead:

    python -m pose3d_tpu.data.native_build

or from code / test fixtures via :func:`ensure_built`.
"""

from __future__ import annotations

import pathlib
import subprocess

NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
LIBRARIES = ("libposeloader.so", "libposevideo.so")


def ensure_built(force: bool = False) -> bool:
    """Run the native build (g++ via native/build.sh) unless both shared
    libraries already exist. Returns True when the loader library is
    present afterwards (the video library additionally needs OpenCV C++
    headers and is allowed to be absent)."""
    have = [(NATIVE_DIR / name).exists() for name in LIBRARIES]
    if all(have) and not force:
        return True
    proc = subprocess.run(
        ["sh", str(NATIVE_DIR / "build.sh")], capture_output=True, text=True
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"native build failed (rc={proc.returncode}):\n{proc.stderr}"
        )
    return (NATIVE_DIR / LIBRARIES[0]).exists()


if __name__ == "__main__":
    ok = ensure_built(force=True)
    for name in LIBRARIES:
        path = NATIVE_DIR / name
        print(f"{name}: {'built' if path.exists() else 'MISSING'}")
    raise SystemExit(0 if ok else 1)
