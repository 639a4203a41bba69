"""Build the native helper library with g++ (no pybind11 needed:
plain C ABI consumed through ctypes)."""

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).parent
SRC = HERE / "zkcnn_native.cpp"
OUT = HERE / "libzkcnn_native.so"


def build(force=False) -> pathlib.Path:
    if OUT.exists() and not force \
            and OUT.stat().st_mtime >= SRC.stat().st_mtime:
        return OUT
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", str(OUT), str(SRC)]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
