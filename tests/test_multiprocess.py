"""Launch REAL multi-process jax.distributed workers and verify the
distributed surface end to end (mp_worker.py runs the checks).

The reference's distributed layer (NCCL init, meter all_reduce, eval merge —
/root/reference/torch_models/references/utils.py:260-283, coco_eval.py:157-186)
is latent code its first-party CLIs never run; here the JAX-native
equivalents execute with process_count == 2 for real: Gloo-backed CPU
collectives, a global mesh spanning both processes, and a gradient-psum
train step.
"""

import os
import socket
import subprocess
import sys

import pytest

NPROC = 2


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_surface():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "mp_worker.py")
    coord = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=2")
    env["XLA_FLAGS"] = " ".join(flags)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(r), str(NPROC), coord],
            env=env,
            cwd=os.path.dirname(here),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for r in range(NPROC)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"
        assert f"MP_WORKER_OK rank={r}" in out, out[-2000:]
