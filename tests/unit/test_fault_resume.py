"""Fault-injection resume smoke (SURVEY.md §5 failure detection; VERDICT r1
missing #7): a fit process killed mid-run must resume from its latest
checkpoint on relaunch and land where an uninterrupted run lands."""

import os
import signal
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = r"""
import os, sys
sys.path.insert(0, os.path.join(r"%(repo)s", "src"))
os.environ.setdefault("XLA_FLAGS", "")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from tpurt.api.config import FitConfig, RenderConfig
from tpurt.api.inverse import InverseRenderer
from tpurt.core.scene import make_cornell_box
from tpurt.render.pipeline import render

ckpt = sys.argv[1]
kill_after = int(sys.argv[2])  # kill self after K steps (0 = run to the end)
steps = 6

scene, cam = make_cornell_box()
cam = cam.replace(width=12, height=12)
rkw = dict(method="brute", soft=True, k_layers=2, sharpness=40.0, band=0.15)
target = render(scene, cam, **rkw)
perturbed = scene.replace(tris=scene.tris.replace(verts=scene.tris.verts * 1.03))

inv = InverseRenderer(
    perturbed, cam,
    fit=FitConfig(steps=steps, lr=5e-3, grad_chunks=1, ckpt_path=ckpt,
                  ckpt_every=1),
    render=RenderConfig(**rkw),
)

def cb(i, loss):
    print(f"step {i} loss {loss:.6f}", flush=True)
    if kill_after and i + 1 >= kill_after:
        os.kill(os.getpid(), 9)  # simulate host failure AFTER the ckpt lands

# note: a ckpt is written after every step (ckpt_every=1), BEFORE the kill
res = inv.fit(target, callback=cb)
np.save(os.path.join(ckpt, "final_verts.npy"), np.asarray(res.params["verts"]))
print(f"done steps_run={res.steps_run}", flush=True)
"""


def _run(ckpt, kill_after):
    script = os.path.join(ckpt, "worker.py")
    with open(script, "w") as f:
        f.write(WORKER % {"repo": REPO})
    return subprocess.run(
        [sys.executable, script, ckpt, str(kill_after)],
        capture_output=True, text=True, timeout=560,
    )


def test_kill_and_resume_matches_uninterrupted(tmp_path):
    # uninterrupted reference run
    ref_dir = str(tmp_path / "ref")
    os.makedirs(ref_dir)
    r = _run(ref_dir, 0)
    assert r.returncode == 0, r.stderr[-2000:]
    ref = np.load(os.path.join(ref_dir, "final_verts.npy"))

    # killed-then-resumed run
    kill_dir = str(tmp_path / "kill")
    os.makedirs(kill_dir)
    r1 = _run(kill_dir, 3)
    assert r1.returncode == -signal.SIGKILL, (r1.returncode, r1.stderr[-1500:])
    assert "step 2" in r1.stdout and "done" not in r1.stdout
    r2 = _run(kill_dir, 0)
    assert r2.returncode == 0, r2.stderr[-2000:]
    # the callback (and kill) fires BEFORE the step's checkpoint lands, so the
    # latest ckpt after killing at i=2 is step 2 -> resume starts at step 2
    first_line = r2.stdout.strip().splitlines()[0]
    assert first_line.startswith("step 2"), r2.stdout
    got = np.load(os.path.join(kill_dir, "final_verts.npy"))
    np.testing.assert_allclose(got, ref, atol=1e-6)
