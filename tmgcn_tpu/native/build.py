"""Build the native host runtime: python -m tmgcn_tpu.native.build."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
SOURCE = HERE / "tmgcn_native.cpp"
OUTPUT = HERE / "_tmgcn_native.so"


def build(verbose: bool = True) -> Path:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        str(SOURCE),
        "-o",
        str(OUTPUT),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUTPUT


if __name__ == "__main__":
    build()
    print(f"built {OUTPUT}")
    sys.exit(0)
