"""MQ coder tests: batched roundtrip under biased/masked decision streams."""

import numpy as np

from grok_tpu.t1.mq_np import MQDecoder, MQEncoder


def test_mq_roundtrip_fuzz(rng):
    N, STEPS = 16, 2000
    bits = rng.integers(0, 2, size=(STEPS, N)).astype(np.uint8)
    bits[:, :8] = (rng.random((STEPS, 8)) < 0.9).astype(np.uint8)
    ctxs = rng.integers(0, 19, size=(STEPS, N)).astype(np.int64)
    masks = rng.random((STEPS, N)) < 0.85

    enc = MQEncoder(N, max_bytes=STEPS)
    for t in range(STEPS):
        enc.encode(bits[t], ctxs[t], masks[t])
    enc.flush()
    lens = enc.lengths()

    dec = MQDecoder(np.ascontiguousarray(enc.buf[:, 1:]), lens)
    for t in range(STEPS):
        d = dec.decode(ctxs[t], masks[t])
        assert np.array_equal(d[masks[t]], bits[t][masks[t]]), f"step {t}"


def test_mq_empty_lane():
    enc = MQEncoder(2, 64)
    enc.encode(
        np.array([1, 0], np.uint8),
        np.array([0, 0], np.int64),
        np.array([True, False]),
    )
    enc.flush()
    lens = enc.lengths()
    assert lens[0] >= 1


def test_mq_reservoir_vs_byte_machine(tmp_path):
    """Native bit-reservoir MQ decoder lockstep against the T.88 byte
    machine (tools/mq_dual_check.cpp) on random buffers + ctx scripts,
    including 0xFF stuffing, 0x80-0x8F carry bytes and marker stops."""
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        import pytest

        pytest.skip("no g++")
    import os

    src = os.path.join(os.path.dirname(__file__), "..", "tools",
                       "mq_dual_check.cpp")
    exe = tmp_path / "mqdual"
    subprocess.run(["g++", "-O2", "-o", str(exe), src], check=True,
                   timeout=120)
    for seed in ("1", "7", "42"):
        r = subprocess.run([str(exe), seed], capture_output=True, text=True,
                           timeout=120)
        assert r.returncode == 0, r.stdout
