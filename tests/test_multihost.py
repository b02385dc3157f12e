"""REAL multi-process (multi-host/DCN-style) training validation.

Spawns TWO OS processes, each owning 4 CPU devices, joined into one JAX
cluster over localhost (jax.distributed — the same coordinator/collective
path a TPU pod's hosts use, with Gloo in place of ICI/DCN transports), and
runs the full `train.fit` dp path over the 8-device GLOBAL mesh through
`parallel.distributed.{initialize_distributed,global_mesh}`.  Both
processes must agree with each other and with the single-process 8-device
run — upgrading round 2's "single-process degenerate forms tested" to an
executed multi-process result (SURVEY.md §5.8).

Marked slow: two subprocess compiles (~1-2 min total).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
pytestmark = pytest.mark.heavy  # subprocess multi-host runs: the heavy lane (CLAUDE.md test tiers)


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_training_matches_single_process(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("single-process reference comparison needs 8 virtual "
                    "devices (see conftest)")
    env = dict(os.environ)
    # each worker process owns 4 virtual CPU devices (the test process's
    # own 8-device flag must not leak through)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "--xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags
                                + ["--xla_force_host_platform_device_count=4"])
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    port = _free_port()
    ckpt = tmp_path / "shared_ckpt"   # SHARED: orbax's save barrier is
    ckpt.mkdir()                      # keyed by path (worker docstring)
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"p{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--process_id", str(pid),
             "--num_processes", "2", "--port", str(port),
             "--ckpt_dir", str(ckpt), "--out", str(out), "--detect"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    try:
        logs = [p.communicate(timeout=600)[0].decode(errors="replace")
                for p in procs]
    finally:
        # a worker that crashed before joining the cluster leaves its peer
        # blocked in a collective forever — never leak it past the test
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    r0, r1 = (json.loads(open(o).read()) for o in outs)
    assert r0["process_count"] == r1["process_count"] == 2
    assert r0["global_devices"] == 8 and r0["local_devices"] == 4
    assert r0["mesh"] == {"data": 8, "model": 1}
    # the two processes computed ONE training run: identical results
    np.testing.assert_allclose(r0["val_history"], r1["val_history"],
                               rtol=0, atol=0)
    assert r0["param_l1"] == r1["param_l1"]
    assert r0["best_epoch"] == r1["best_epoch"]

    # ...and it matches the single-process 8-device run (cross-topology
    # reduction order differs → tiny float tolerance)
    import jax

    from headpose_tpu.data import Dataset
    from headpose_tpu.parallel import create_mesh
    from headpose_tpu.train import config_96, fit

    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 16)).astype(np.float32)
    y = (x @ rng.normal(size=(16, 3))).astype(np.float32)
    cfg = config_96(in_features=16, num_filters=8, total_epochs=6,
                    batch_size=64, checkpoint_dir=str(tmp_path / "ref"),
                    run_name="ref")
    res = fit(cfg, Dataset(x, y), mesh=create_mesh(8, model_parallel=1))
    want_hist = [float(h["val_loss"]) for h in res.history]
    np.testing.assert_allclose(r0["val_history"], want_hist,
                               rtol=0, atol=1e-3)
    want_l1 = float(sum(float(np.abs(np.asarray(l)).sum())
                        for l in jax.tree_util.tree_leaves(res.params)))
    np.testing.assert_allclose(r0["param_l1"], want_l1, rtol=1e-5)
    assert r0["best_epoch"] == res.best_epoch

    # --- tp/dp training step over the multi-process 4x2 mesh ------------
    # the general per-family TP rules (parallel.head_param_specs) executed
    # across processes; both processes compute the same replicated loss
    assert r0["tp_mesh"] == {"data": 4, "model": 2}
    assert r0["tp_step_loss"] == r1["tp_step_loss"]
    assert np.isfinite(r0["tp_step_loss"])

    # --- dp detection SERVING over the same 2-process global mesh -------
    # each process recorded its local 4-row shard; together they must cover
    # all 8 frames and match the single-process detector on real content
    rows = {**r0["detection_local_rows"], **r1["detection_local_rows"]}
    assert len(r0["detection_local_rows"]) == 4
    assert len(r1["detection_local_rows"]) == 4
    assert sorted(map(int, rows)) == list(range(8))

    from headpose_tpu.pretrained import flagship_detector

    g = np.load(os.path.join(REPO, "tests", "golden", "e2e_production.npz"))
    img = np.asarray(jax.image.resize(
        np.asarray(g["img"], np.float32), (128, 128, 3),
        "linear")).astype(np.uint8)
    frames = np.stack([np.roll(img, i, axis=1) for i in range(8)])
    want = flagship_detector().detect(frames)
    valid = np.asarray(want.valid)
    assert valid.sum() > 0
    for i in range(8):
        got = rows[str(i)]
        np.testing.assert_array_equal(np.asarray(got["valid"], bool),
                                      valid[i], err_msg=f"frame {i}")
        m = valid[i]
        np.testing.assert_allclose(
            np.asarray(got["poses"])[m], np.asarray(want.poses)[i][m],
            rtol=1e-5, atol=1e-5, err_msg=f"frame {i}")
        np.testing.assert_allclose(
            np.asarray(got["boxes"])[m], np.asarray(want.boxes)[i][m],
            rtol=1e-5, atol=1e-5, err_msg=f"frame {i}")
