"""ASan/UBSan build + exercise of the native cores (SURVEY.md §5:
the reference has no sanitizer coverage at all; the threaded cores here
— traverse.cpp's walk/travel threads, poacns.cpp's window threads,
ingest.cpp's read-striped ingest threads — get one instrumented run per
suite).

Each .cpp builds with -fsanitize=address,undefined into a temp dir; the
existing native parity tests then run in a subprocess with
LD_PRELOAD=libasan and ALIGNGRAPH2_TPU_NATIVE_DIR pointing at the
instrumented builds.  Any sanitizer report fails the subprocess (exit
code + stderr captured here).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "aligngraph2_tpu", "native")
SOURCES = {
    "libseedhits.so": ("seedhits.cpp", []),
    "libfastio.so": ("fastio.cpp", []),
    "libpoacns.so": ("poacns.cpp", ["-pthread"]),
    "libtraverse.so": ("traverse.cpp", ["-std=c++17", "-pthread"]),
    "libingest.so": ("ingest.cpp", ["-pthread"]),
}
SAN_FLAGS = ["-fsanitize=address,undefined", "-fno-sanitize-recover=all",
             "-g", "-O1"]


def _libasan():
    try:
        out = subprocess.run(["g++", "-print-file-name=libasan.so"],
                             capture_output=True, text=True, timeout=30)
        path = out.stdout.strip()
        return path if os.path.isabs(path) and os.path.exists(path) \
            else None
    except (OSError, subprocess.TimeoutExpired):
        return None


LIBASAN = _libasan()
pytestmark = pytest.mark.skipif(
    LIBASAN is None, reason="g++/libasan unavailable")


@pytest.fixture(scope="module")
def san_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("san"))
    for so, (src, extra) in SOURCES.items():
        res = subprocess.run(
            ["g++", "-shared", "-fPIC", *SAN_FLAGS, *extra,
             os.path.join(NATIVE, src), "-o", os.path.join(d, so)],
            capture_output=True, text=True, timeout=600)
        assert res.returncode == 0, f"{src}: {res.stderr[-2000:]}"
    return d


def test_native_cores_clean_under_asan_ubsan(san_dir):
    """Drive all instrumented cores via tests/_san_exercise.py —
    a jax-compile-free workload (XLA:CPU itself aborts under ASan, which
    would mask findings in OUR code): FASTA/FASTQ parse, native seed
    hits, graph build + threaded-vs-serial traversal parity, threaded
    window consensus."""
    env = dict(os.environ)
    env["ALIGNGRAPH2_TPU_NATIVE_DIR"] = san_dir
    env["LD_PRELOAD"] = LIBASAN
    # the cores leak nothing by design, but Python itself "leaks" plenty
    # of interned state at exit — leak checking off, everything else on
    env["ASAN_OPTIONS"] = "detect_leaks=0:abort_on_error=1"
    env["UBSAN_OPTIONS"] = "print_stacktrace=1:halt_on_error=1"
    res = subprocess.run(
        [sys.executable, os.path.join("tests", "_san_exercise.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    tail = (res.stdout + res.stderr)[-4000:]
    assert res.returncode == 0, f"sanitized exercise failed:\n{tail}"
    assert "san exercise ok" in res.stdout, tail
    assert "ERROR: AddressSanitizer" not in res.stderr, tail
    assert "runtime error:" not in res.stderr, tail
