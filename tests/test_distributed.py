"""parallel.distributed.initialize: single-process no-op + a REAL
2-process jax.distributed run (shared coordinator, global device count,
one cross-process psum) — the multi-host evidence the round-1 wrapper
lacked."""

import os
import socket
import subprocess
import sys


def test_initialize_single_process():
    from bayesian_torch_tpu.parallel import initialize
    n = initialize()
    assert n >= 1


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_workers():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    # each process gets exactly one CPU device (don't inherit the
    # conftest's 8-device virtual mesh flags)
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            # generous: two fresh jax processes compile from cold and
            # CI runs this alongside the rest of the suite
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


def test_two_process_distributed_psum():
    # the probed free port can be re-taken before the coordinator binds
    # it (TOCTOU); retry the whole spawn on a bind failure
    for attempt in range(3):
        procs, outs = _spawn_workers()
        bind_race = any(p.returncode != 0 and ("bind" in out.lower()
                                               or "address already in use"
                                               in out.lower())
                        for p, out in zip(procs, outs))
        if not bind_race or attempt == 2:
            break

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "WORKER_OK" in out, f"proc {i} no marker:\n{out}"
        # both processes see the GLOBAL device count (2 x 1 CPU)
        assert "DEVICES=2" in out, f"proc {i} device count:\n{out}"
        # the cross-process reduction saw both contributions (1 + 2)
        assert "PSUM=3.0" in out, f"proc {i} psum:\n{out}"


def test_explicit_bad_coordinator_raises():
    """Explicit multi-process args must propagate failures (round 1
    swallowed every initialize() exception)."""
    import pytest

    from bayesian_torch_tpu.parallel.distributed import initialize
    with pytest.raises(Exception):
        initialize(coordinator_address="127.0.0.1:1",
                   num_processes=2, process_id=1,
                   initialization_timeout=5)
