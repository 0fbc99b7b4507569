"""True multi-process jax.distributed smoke test (2 processes x 2 CPU
devices): the init path in parallel/distributed.py handshakes a real
coordinator, forms a 4-device global mesh, and reduces across processes —
the role of the reference's torch.distributed env init + DDP all_reduce
(train_utils.py:39-51).  Single-process suites can't exercise this;
NEXT_STEPS round-3 gap closed here."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_init_and_collectives():
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    # 2 virtual CPU devices per worker (the suite's own XLA_FLAGS would
    # give 8); JAX_PLATFORMS guards against the sitecustomize axon preset
    # for the window before the worker's own config.update runs
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(here, "_mp_worker.py"),
             coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=root, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=540)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} rc={rc}\nstdout:{out}\nstderr:{err}"
        assert f"MP_OK pid={pid}" in out, (out, err)
