"""Multi-host (DCN) path: real 2-process distributed training test.

The reference's multi-machine story was TF_CONFIG parameter servers
(reference: luminoth/train.py:282-326). Ours is `jax.distributed` over
DCN. This test proves the wiring end to end WITHOUT multi-host hardware:
it spawns two local processes, each with 4 virtual CPU devices, that join
one coordination service through the exact `initialize_from_env` path
`lumi train` uses, build a global 8-device mesh, and run synchronous DP
steps with cross-process (gloo) gradient collectives. A third,
single-process run of the same worker must produce the identical loss
trajectory — synchronous DP is topology-invariant math.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from luminoth_tpu.parallel.distributed import (
    ENV_AUTO,
    worker_env,
    worker_env_auto,
)
from luminoth_tpu.tools.cloud.tpu import build_launch_spec

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env(extra):
    env = {
        k: v for k, v in os.environ.items()
        # The image's sitecustomize keys the TPU tunnel plugin off
        # PALLAS_AXON_*; it must not grab the backend in workers.
        if not k.startswith(("PALLAS_AXON", "LUMI_"))
    }
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    env.update(extra)
    return env


def _launch(extra_env):
    return subprocess.Popen(
        [sys.executable, WORKER],
        env=_clean_env(extra_env),
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


def test_launch_spec_env_matches_trainer_protocol():
    """The cloud launcher must emit exactly the env vars the trainer
    reads — the contract that makes the DCN path non-dead-code. On
    Cloud TPU pods the launcher emits LUMI_DISTRIBUTED_AUTO=1 (JAX
    resolves the coordinator from the TPU metadata server; a hostname
    fabricated on the submitter would not resolve on the workers)."""
    spec = build_launch_spec(
        "job", "us-central1-a", "v5e-16", "tpu-ubuntu2204", "cfg.yml",
        num_hosts=4,
    )
    assert len(spec["train"]) == 4
    for cmd in spec["train"]:
        launch = cmd[-1]
        for key, value in worker_env_auto().items():
            assert f"{key}={value}" in launch
        # No stale/unknown LUMI_ vars beyond the protocol.
        assert launch.count("LUMI_") == 1
    assert ENV_AUTO == "LUMI_DISTRIBUTED_AUTO"


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    port = _free_port()
    workers = [
        _launch(worker_env("localhost", port, 2, pid))
        for pid in range(2)
    ]
    single = _launch({})  # no LUMI_*: single-process control run

    results = []
    for proc in workers + [single]:
        out, err = proc.communicate(timeout=300)
        assert proc.returncode == 0, err[-2000:]
        results.append(json.loads(out.strip().splitlines()[-1]))

    w0, w1, ctrl = results
    assert w0["joined"] and w1["joined"] and not ctrl["joined"]
    for w in (w0, w1):
        assert w["process_count"] == 2
        assert w["global_devices"] == 8
        assert w["local_devices"] == 4
    assert {w0["process_id"], w1["process_id"]} == {0, 1}
    # Chief semantics: exactly one chief (process 0).
    assert w0["is_chief"] != w1["is_chief"]
    assert ctrl["is_chief"]

    # Both processes observe the identical replicated loss...
    np.testing.assert_allclose(w0["losses"], w1["losses"], rtol=1e-6)
    # ...which matches single-process synchronous DP exactly (same global
    # batch, same mean-loss math; only the device topology differs).
    np.testing.assert_allclose(w0["losses"], ctrl["losses"], rtol=1e-4)
    # And training is actually learning.
    assert w0["losses"][-1] < w0["losses"][0]

    # Resume broadcast: every process ends with the chief's restored
    # state (step AND values); single-process control is a no-op.
    for res in results:
        assert res["resume_step"] == 7
        assert res["resume_w"] == pytest.approx(1.5)


def test_initialize_from_env_auto_mode(monkeypatch):
    """LUMI_DISTRIBUTED_AUTO=1 must call jax.distributed.initialize()
    with NO arguments — on Cloud TPU the coordinator address comes from
    the TPU metadata server, not from env wiring."""
    import jax

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda *a, **kw: calls.append((a, kw)),
    )
    from luminoth_tpu.parallel.distributed import initialize_from_env

    assert not initialize_from_env(environ={})
    assert calls == []
    assert initialize_from_env(environ=worker_env_auto())
    assert calls == [((), {})]
