"""C++-level concurrency hardening (VERDICT r3 #7): the multi-threaded
stress binary hammers Store/Batcher through the public C ABI — thread-
pooled mt_prepare_wire_multi racing evict/drain/lookup/save threads —
plain and under ThreadSanitizer. Ref: the 60 colocated *_test.cc,
embedding_hash_table_test.h concurrency harness."""

import os
import shutil
import subprocess

import pytest

CPP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "cpp")


def _make(target, timeout):
    return subprocess.run(["make", "-s", target], cwd=CPP, timeout=timeout,
                          capture_output=True, text=True)


def test_stress_plain():
    r = _make("stress", timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "0 failures" in r.stdout, r.stdout


def _tsan_available() -> bool:
    if shutil.which("g++") is None:
        return False
    probe = subprocess.run(
        ["g++", "-fsanitize=thread", "-x", "c++", "-", "-o", "/dev/null"],
        input="int main(){return 0;}", capture_output=True, text=True)
    return probe.returncode == 0


@pytest.mark.slow
def test_stress_tsan():
    if not _tsan_available():
        pytest.skip("g++ -fsanitize=thread unavailable")
    r = _make("tsan", timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ThreadSanitizer" not in r.stderr, r.stderr
    assert "0 failures" in r.stdout, r.stdout
