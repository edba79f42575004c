"""Real multi-process ``jax.distributed`` test (SURVEY §5.8).

Everything else in the suite exercises the multi-chip paths on a virtual
single-process mesh; this spawns TWO actual processes with a localhost
coordinator and runs psum/all_gather through ``parallel.init_distributed``
— the pod code path beyond its single-process no-op branch.  CPU backend
with gloo collectives, fully hermetic.
"""

import os
import pathlib
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

_WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from onset_fingerprinting_tpu.parallel import init_distributed

    multi = init_distributed(f"localhost:{{port}}", nproc, pid)
    assert multi, "init_distributed returned False for a 2-process run"
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(jax.devices(), ("data",))
    n_dev = len(jax.devices())

    def body(x):
        s = jax.lax.psum(x, "data")
        g = jax.lax.all_gather(x, "data")
        return s, g

    f = jax.jit(
        shard_map(body, mesh=mesh, in_specs=P("data"),
                  out_specs=(P(), P()), check_vma=False)
    )
    # each process contributes its process_id+1 on its local device(s)
    vals = jnp.full((jax.local_device_count(),), float(pid + 1), jnp.float32)
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), vals, (n_dev,)
    )
    s, g = f(x)
    s = float(jax.device_get(s.addressable_data(0)))
    g = jax.device_get(g.addressable_data(0))
    # 2 processes x 1 device each, values 1 and 2 -> psum 3
    expect = sum(range(1, nproc + 1)) * (n_dev // nproc)
    assert abs(s - expect) < 1e-6, (s, expect)
    assert sorted(float(v) for v in g.ravel()) == sorted(
        float(p + 1) for p in range(nproc)
        for _ in range(n_dev // nproc)
    ), g
    print(f"WORKER_OK pid={{pid}} psum={{s}} devices={{n_dev}}")
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_psum_all_gather(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=str(REPO)))
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2000:]}"
        assert "WORKER_OK" in out, out[-2000:]
