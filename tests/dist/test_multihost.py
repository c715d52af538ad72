"""Multi-host runtime tests via spawned jax.distributed CPU processes
(SURVEY.md §4b: "multi-host logic tested via jax.distributed spawned
subprocesses on CPU") — the zero-test gap VERDICT r1 flagged on
dist/runtime.py (#23).

Two localhost processes, 2 virtual CPU devices each -> a 4-device global
mesh; checks init_distributed wiring, a cross-process psum, and gather_film
returning the full film on process 0 / None elsewhere.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = r"""
import os, sys
sys.path.insert(0, os.path.join(r"%(repo)s", "src"))
import jax
jax.config.update("jax_platforms", "cpu")

from tpurt.dist.runtime import gather_film, init_distributed, is_coordinator

pid = int(os.environ["PROC_ID"])
init_distributed(
    coordinator=os.environ["COORD"], num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

mesh = Mesh(np.array(jax.devices()), ("rays",))

# cross-process collective: psum over the full mesh
@jax.jit
@jax.shard_map(mesh=mesh, in_specs=P("rays"), out_specs=P())
def total(x):
    return jax.lax.psum(jnp.sum(x), "rays")

xs = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("rays")),
    np.full((2,), 1.0 + pid, np.float32), (4,),
)
t = float(jax.device_get(total(xs))[()])
assert t == 6.0, t  # (1+1) + (2+2)

# film gather: global (4, 3) array sharded over processes
film = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("rays")),
    np.arange(6, dtype=np.float32).reshape(2, 3) + 100 * pid, (4, 3),
)
full = gather_film(film)
if is_coordinator():
    assert full is not None and full.shape == (4, 3), full
    expect = np.concatenate([
        np.arange(6, dtype=np.float32).reshape(2, 3),
        np.arange(6, dtype=np.float32).reshape(2, 3) + 100,
    ])
    assert np.array_equal(full, expect), full
else:
    assert full is None
print(f"proc {pid} OK", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_init_psum_gather(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO})
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PROC_ID"] = str(pid)
        env["COORD"] = f"127.0.0.1:{port}"
        # keep the axon TPU plugin (PYTHONPATH sitecustomize) out of the
        # workers: its registration can poke the XLA backend before
        # jax.distributed.initialize runs, which initialize() rejects
        env["PYTHONPATH"] = ""
        env.pop("JAX_PLATFORMS", None)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        procs.append(subprocess.Popen(
            [sys.executable, str(script)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        ))
    outs = [p.communicate(timeout=300) for p in procs]
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}\n{err[-3000:]}"
        assert f"proc {i} OK" in out
