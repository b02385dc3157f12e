"""Training-stack tests: data, loop semantics, early stopping, checkpointing,
sweeps, evaluator parity."""
import jax
import json
import os
import sys

import numpy as np
import pytest

from headpose_tpu.data import (Dataset, difficulty_weights, load_dataset,
                               train_val_split)
from headpose_tpu.train import (TrainConfig, config_96, fit, evaluate,
                                JsonlLogger, SweepConfig, run_sweep,
                                restore_checkpoint, load_sweep_file)
from headpose_tpu.tools import evaluate_head_pose_model, pose_metrics

from conftest import REFERENCE_ROOT, has_reference

needs_reference = pytest.mark.skipif(
    not has_reference(), reason="reference artifacts not mounted")


def synthetic_dataset(n=512, c=16, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, c)).astype(np.float32)
    w = rng.normal(size=(c, 3)).astype(np.float32)
    y = x @ w + 0.01 * rng.normal(size=(n, 3)).astype(np.float32)
    return Dataset(x, y)


class TestData:
    def test_split_matches_sklearn(self):
        """Exact reproduction of train_test_split(random_state=42) so our
        train/val partitions equal the reference's (train_96.py:142-146)."""
        sklearn = pytest.importorskip("sklearn.model_selection")
        ds = synthetic_dataset(321)
        tr, va = train_val_split(ds, 0.2, seed=42)
        xtr, xva, ytr, yva = sklearn.train_test_split(
            ds.features, ds.poses, test_size=0.2, random_state=42)
        np.testing.assert_array_equal(tr.features, xtr)
        np.testing.assert_array_equal(va.features, xva)
        np.testing.assert_array_equal(va.poses, yva)

    def test_difficulty_weights(self):
        """Eq. 12-13 (Model-96/utilities.py:43-77): w=1 below 60° off-axis,
        halving every 5° beyond."""
        poses = np.array([[0, 0, 0], [45, 0, 12], [65, 0, 0], [0, 70, 5]],
                         np.float32)
        w = difficulty_weights(poses)
        assert w[0] == 1.0 and w[1] == 1.0
        np.testing.assert_allclose(w[2], 0.5 ** 1.0, rtol=1e-5)
        np.testing.assert_allclose(w[3], 0.5 ** 2.0, rtol=1e-5)

    def test_concat(self):
        a, b = synthetic_dataset(10), synthetic_dataset(20, seed=1)
        assert len(a.concat(b)) == 30


class TestFit:
    def _cfg(self, tmp_path, **kw):
        base = dict(in_features=16, num_filters=8, total_epochs=60,
                    early_stopping_patience=15, learning_rate=3e-3,
                    batch_size=64, checkpoint_dir=str(tmp_path), run_name="t")
        base.update(kw)
        return config_96(**base)

    def test_converges_on_linear_problem(self, tmp_path):
        ds = synthetic_dataset()
        res = fit(self._cfg(tmp_path), ds)
        assert res.history[-1]["val_loss"] < res.history[0]["val_loss"] * 0.5

    def test_early_stopping_and_restore_best(self, tmp_path):
        ds = synthetic_dataset()
        cfg = self._cfg(tmp_path, total_epochs=10_000, early_stopping_patience=3,
                        learning_rate=0.0)  # frozen → no improvement → stop fast
        res = fit(cfg, ds)
        assert len(res.history) <= 5  # 1 initial + patience
        # best params must reproduce best recorded val_loss
        _, val = train_val_split(ds, cfg.val_fraction, cfg.split_seed)
        m = evaluate(res.spec, res.params, val)
        best = min(h["val_loss"] for h in res.history)
        np.testing.assert_allclose(m["loss"], best, rtol=1e-4)

    @pytest.mark.parametrize("extra", [
        dict(),                                          # plain early stop
        dict(reduce_lr_on_plateau=True, reduce_lr_patience=3),
    ])
    def test_epochs_per_sync_matches_per_epoch_loop(self, tmp_path, extra):
        """Block mode (k epochs per device program, one host sync) must
        reproduce the per-epoch host loop: same history, same best epoch,
        same restored weights — incl. when total_epochs % k != 0 and when
        early stopping fires mid-block."""
        ds = synthetic_dataset()
        cfg1 = self._cfg(tmp_path, total_epochs=23,
                         early_stopping_patience=6, run_name="sync1", **extra)
        cfgk = cfg1.replace(epochs_per_sync=4, run_name="synck")
        r1 = fit(cfg1, ds)
        rk = fit(cfgk, ds)
        assert len(r1.history) == len(rk.history)
        assert r1.best_epoch == rk.best_epoch
        for h1, hk in zip(r1.history, rk.history):
            assert h1["epoch"] == hk["epoch"]
            for key in ("train_loss", "val_loss", "train_mae", "val_mae"):
                np.testing.assert_allclose(hk[key], h1[key], rtol=1e-5,
                                           atol=1e-7, err_msg=f"{key}@{h1['epoch']}")
        for a, b in zip(jax.tree_util.tree_leaves(r1.params),
                        jax.tree_util.tree_leaves(rk.params)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-6, atol=1e-7)

    def test_checkpoint_resume(self, tmp_path):
        ds = synthetic_dataset()
        cfg = self._cfg(tmp_path, total_epochs=5, early_stopping_patience=100)
        res1 = fit(cfg, ds)
        ckpt = restore_checkpoint(os.path.join(str(tmp_path), "t"))
        assert ckpt is not None
        step, params, opt_state, meta, _ = ckpt
        assert step <= 4 and meta["run_id"] == "t"
        # resume continues past the first run's epochs
        cfg2 = cfg.replace(total_epochs=8)
        res2 = fit(cfg2, ds, resume=True)
        assert res2.history[0]["epoch"] > 0

    def test_resume_is_exact_continuation(self, tmp_path):
        """Interrupt-and-resume must reproduce the uninterrupted run — same
        per-epoch history tail and same final weights.  Guards the
        off-by-one where resuming re-ran the checkpointed epoch (applying
        its update twice with the same fold_in randomness)."""
        ds = synthetic_dataset()
        full = fit(self._cfg(tmp_path, run_name="full", total_epochs=6,
                             early_stopping_patience=100), ds)
        cfg_r = self._cfg(tmp_path, run_name="resumed", total_epochs=3,
                          early_stopping_patience=100)
        first = fit(cfg_r, ds)
        # the interrupted run's last epoch improved (steady descent early
        # on this problem), so its checkpoint is AT the interruption point
        assert first.best_epoch == 2
        res = fit(cfg_r.replace(total_epochs=6), ds, resume=True)
        assert [r["epoch"] for r in res.history] == [3, 4, 5]
        for got, want in zip(res.history, full.history[3:]):
            assert got == want, (got, want)
        for a, b in zip(jax.tree_util.tree_leaves(res.params),
                        jax.tree_util.tree_leaves(full.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_block_mode_resume_is_exact_continuation(self, tmp_path):
        """Block-mode checkpoints carry the LIVE params/opt_state pair at
        the sync epoch PLUS the distinct best weights — resume must replay
        the remaining blocks exactly (guards the inconsistent-triple bug
        where best_params@best_epoch was saved with opt_state@sync)."""
        ds = synthetic_dataset()
        base = dict(early_stopping_patience=100, epochs_per_sync=2)
        full = fit(self._cfg(tmp_path, run_name="bfull", total_epochs=6,
                             **base), ds)
        cfg_r = self._cfg(tmp_path, run_name="bres", total_epochs=4, **base)
        fit(cfg_r, ds)
        res = fit(cfg_r.replace(total_epochs=6), ds, resume=True)
        assert [r["epoch"] for r in res.history] == [4, 5]
        for got, want in zip(res.history, full.history[4:]):
            assert got == want, (got, want)
        for a, b in zip(jax.tree_util.tree_leaves(res.params),
                        jax.tree_util.tree_leaves(full.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert res.best_epoch == full.best_epoch

    def test_nan_giveup_returns_best_not_poisoned(self, tmp_path):
        """After the 4th NaN recovery the run gives up — it must return the
        rolled-back best weights, not the diverged ones, even with
        restore_best_weights=False (parity with block mode's on_nan)."""
        ds = synthetic_dataset(n=128)
        # SGD at an absurd LR overflows f32 within an epoch (Adam would not:
        # its normalized updates are bounded by the LR at any gradient)
        cfg = self._cfg(tmp_path, total_epochs=200, optimizer="sgd",
                        learning_rate=1e20, early_stopping_patience=1000,
                        restore_best_weights=False)
        res = fit(cfg, ds)
        # the giveup path must actually have fired (every epoch diverges)
        assert len(res.history) < 10
        for leaf in jax.tree_util.tree_leaves(res.params):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_resume_without_run_name_raises(self, tmp_path):
        ds = synthetic_dataset()
        cfg = self._cfg(tmp_path, total_epochs=2, run_name=None)
        with pytest.raises(ValueError, match="run_name"):
            fit(cfg, ds, resume=True)

    def test_build_head_ensemble_needs_explicit_spec(self, tmp_path):
        from headpose_tpu.train.loop import build_head
        cfg = self._cfg(tmp_path, head="ensemble")
        with pytest.raises(ValueError, match="EnsembleHead"):
            build_head(cfg)

    def test_sample_weights(self, tmp_path):
        ds = synthetic_dataset()
        ds.weights = np.full((len(ds),), 0.5, np.float32)
        res = fit(self._cfg(tmp_path, total_epochs=3), ds)
        assert np.isfinite(res.history[-1]["train_loss"])

    def test_weighted_loss_is_sum_over_batch_size(self):
        """Keras loss reduction is SUM_OVER_BATCH_SIZE: sum(w*l)/B, NOT
        /sum(w) (tf.keras MSE doc example: per-sample losses [0.5, 0.5]
        with sample_weight [0.7, 0.3] -> 0.25)."""
        import jax
        import jax.numpy as jnp
        from headpose_tpu.train.loop import _loss_and_metrics
        from headpose_tpu.models.heads import MLPHead
        spec = MLPHead(2, ((3, "linear"),))
        # identity-free check: make pred - y known by zero params -> pred=0
        params = jax.tree_util.tree_map(jnp.zeros_like,
                                        spec.init(jax.random.PRNGKey(0)))
        batch = {"x": jnp.zeros((2, 2)),
                 "y": jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
                 "w": jnp.array([0.7, 0.3]),
                 "mask": jnp.ones((2,))}
        # per-sample mse = mean([1,0,0]^2) = 1/3 for both rows
        loss, m = _loss_and_metrics(spec, params, batch, None, 0.0, False)
        np.testing.assert_allclose(float(m["loss"]),
                                   (0.7 + 0.3) / 3 / 2, rtol=1e-6)

    def test_l2_regularization_increases_loss(self, tmp_path):
        ds = synthetic_dataset()
        r0 = fit(self._cfg(tmp_path, total_epochs=3), ds)
        r1 = fit(self._cfg(tmp_path, total_epochs=3, regularizer_rate=1.0), ds)
        # the L2 term enters the training loss (Keras regularizer semantics):
        # with rate 1.0 and nonzero weights the first epoch must cost more
        assert r1.history[0]["train_loss"] > r0.history[0]["train_loss"]
        # the penalty itself must be positive
        pen = float(r1.spec.l2_penalty(r1.params, 1.0))
        assert pen > 0.0

    def test_logger_writes_jsonl(self, tmp_path):
        ds = synthetic_dataset()
        run_dir = str(tmp_path / "run")
        logger = JsonlLogger(run_dir, config={"a": 1})
        fit(self._cfg(tmp_path, total_epochs=2), ds, logger=logger)
        logger.finish()
        lines = open(os.path.join(run_dir, "metrics.jsonl")).read().splitlines()
        assert len(lines) == 2
        assert "val_loss" in json.loads(lines[0])
        summary = json.load(open(os.path.join(run_dir, "summary.json")))
        assert "best_epoch" in summary and "total_parameters" in summary


class TestSweep:
    def test_random_and_bayes(self):
        grids = {"a": [0, 1, 2, 3], "b": [10, 20]}
        calls = []

        def obj(p):
            calls.append(p)
            return {"m": (p["a"] - 2) ** 2 + (p["b"] - 10) * 0.01}

        sw = SweepConfig(parameters=grids, metric="m", num_runs=12, warmup=4)
        res = run_sweep(sw, obj)
        # 4x2 grid: duplicates are never re-trained, so the sweep covers the
        # whole space exactly once and stops
        assert len(res.runs) == 8
        assert len({tuple(sorted(r["params"].items())) for r in res.runs}) == 8
        assert res.best["params"]["a"] == 2

    def test_bayes_beats_random_on_reference_grids(self):
        """The GP surrogate must reach the optimum of a deterministic
        objective over the reference sweep grids (8x8x5 = 320 configs,
        Model-96/sweep.yaml) in measurably fewer evaluations than random
        search — VERDICT round-1, item 5."""
        grids = {
            "dropout_rate": [0, 1e-6, 1e-4, 1e-3, 1e-2, 5e-2, 1e-1, 0.7],
            "regularizer_rate": [0, 1e-7, 1e-5, 1e-3, 1e-2, 5e-2, 1e-1, 0.7],
            "num_filters": [16, 64, 128, 256, 360],
        }

        def obj(p):
            # smooth deterministic bowl in grid-index space, optimum at
            # (dropout=1e-3, reg=1e-5, filters=256)
            di = grids["dropout_rate"].index(p["dropout_rate"])
            ri = grids["regularizer_rate"].index(p["regularizer_rate"])
            fi = grids["num_filters"].index(p["num_filters"])
            return {"m": (di - 3) ** 2 + 1.5 * (ri - 2) ** 2 + (fi - 3) ** 2}

        def evals_to_optimum(method, seed):
            sw = SweepConfig(parameters=grids, metric="m", method=method,
                             num_runs=60, warmup=8, seed=seed)
            res = run_sweep(sw, obj)
            for i, r in enumerate(res.runs):
                if r["objective"] == 0.0:
                    return i + 1
            return len(res.runs) + 1

        seeds = range(5)
        bayes = [evals_to_optimum("bayes", s) for s in seeds]
        rand = [evals_to_optimum("random", s) for s in seeds]
        assert sum(bayes) < sum(rand), (bayes, rand)
        # the GP should land the optimum well within the 60-run budget
        assert max(bayes) <= 40, bayes

    def test_grid(self):
        grids = {"a": [1, 2], "b": [3, 4]}
        sw = SweepConfig(parameters=grids, metric="m", method="grid", num_runs=10)
        res = run_sweep(sw, lambda p: {"m": p["a"] * p["b"]})
        assert len(res.runs) == 4
        assert res.best["params"] == {"a": 1, "b": 3}

    @needs_reference
    def test_load_reference_sweep_yaml(self):
        pytest.importorskip("yaml")
        sw = load_sweep_file(os.path.join(REFERENCE_ROOT, "Model-96", "sweep.yaml"))
        assert sw.metric == "test_AFLW2000_mae"
        assert sw.goal == "minimize"
        assert set(sw.parameters) == {"dropout_rate", "regularizer_rate", "num_filters"}
        assert 360 in sw.parameters["num_filters"]


class TestEvaluator:
    def test_pose_metrics_schema(self):
        pred = np.zeros((10, 3), np.float32)
        gt = np.ones((10, 3), np.float32)
        m = pose_metrics(pred, gt)
        assert m["MAE"]["average"] == 1.0 and m["MSE"]["average"] == 1.0

    @needs_reference
    def test_reference_head_baseline_parity(self):
        """Reproduces the measured BASELINE.md numbers for the production
        reg2 head on AFLW2000 (avg MAE 8.031°) within float tolerance."""
        m = evaluate_head_pose_model(
            os.path.join(REFERENCE_ROOT,
                         "Model-96/Trained-Models-96-ReshapedInput-NoFlatten/hrchr82r.h5"),
            os.path.join(REFERENCE_ROOT,
                         "FeatureMaps-Datasets/AFLW2000_features_96_0.7_1.npz"),
            verbose=False)
        np.testing.assert_allclose(m["MAE"]["average"], 8.031, atol=0.01)
        np.testing.assert_allclose(
            [m["MAE"]["yaw"], m["MAE"]["pitch"], m["MAE"]["roll"]],
            [7.216, 9.920, 6.956], atol=0.01)

    @needs_reference
    def test_reference_head88_baseline_parity(self):
        m = evaluate_head_pose_model(
            os.path.join(REFERENCE_ROOT, "Model-88/Trained-Models-88/stoqa9pt.h5"),
            os.path.join(REFERENCE_ROOT,
                         "FeatureMaps-Datasets/BIWI_Test_Enlarged_features_88_0.7_1.npz"),
            verbose=False)
        np.testing.assert_allclose(m["MAE"]["average"], 3.446, atol=0.01)


@needs_reference
def test_finetune_any_h5_artifact(tmp_path):
    """Any reference H5 head fine-tunes directly with fit() via
    TrainableGraphHead — incl. architectures with no native equivalent."""
    from headpose_tpu.core import load_graph_model, TrainableGraphHead

    gm = load_graph_model(os.path.join(
        REFERENCE_ROOT, "Model-88/Trained-Models-88/ker7z9mv.h5"))  # SE-transformer
    spec = TrainableGraphHead(gm, in_features=88)
    ds = synthetic_dataset(128, 88)
    cfg = config_96(in_features=88, total_epochs=6, batch_size=64,
                    learning_rate=1e-3, checkpoint_dir=str(tmp_path),
                    early_stopping_patience=50)
    res = fit(cfg, ds, spec=spec, params=gm.params)
    assert res.history[-1]["train_loss"] < res.history[0]["train_loss"]
    assert float(spec.l2_penalty(res.params, 1e-3)) > 0.0


def test_reduce_lr_on_plateau(tmp_path):
    """The ReduceLROnPlateau schedule (reference carried it commented out)
    lowers the injected lr when val_loss stops improving."""
    ds = synthetic_dataset()
    cfg = config_96(in_features=16, num_filters=8, total_epochs=30,
                    learning_rate=1e-8,  # negligible → plateaus immediately
                    early_stopping_patience=25,
                    reduce_lr_on_plateau=True, reduce_lr_patience=3,
                    reduce_lr_factor=0.5, min_lr=1e-9,
                    checkpoint_dir=str(tmp_path), run_name="lr")
    logger = JsonlLogger(str(tmp_path / "run"))
    fit(cfg, ds, logger=logger)
    logger.finish()
    recs = [json.loads(l) for l in
            open(os.path.join(str(tmp_path / "run"), "metrics.jsonl"))]
    lrs = [r["learning_rate"] for r in recs if "learning_rate" in r]
    assert len(lrs) >= 2 and lrs[1] < lrs[0]


class TestWandbLoggerProtocol:
    """Protocol-level exercise of the wandb backend with a mock module —
    this container has no wandb package/egress, so the call sequence the
    reference relies on (init with project/config/tags -> per-epoch log ->
    run.summary[...] -> finish; Model-88/utilities.py:11-33,
    Model-96/train_96.py:115-120,191-196) is verified against a fake."""

    def _install_mock(self, monkeypatch):
        import sys as _sys
        import types

        calls = {"init": [], "log": [], "summary": {}, "finished": []}

        class _Run:
            def __init__(self):
                self.summary = calls["summary"]
                self.id = "mockrun1"

            def finish(self):
                calls["finished"].append(True)

        mock = types.ModuleType("wandb")
        run = _Run()

        def init(project=None, config=None, tags=None, notes=""):
            calls["init"].append({"project": project, "config": config,
                                  "tags": tags, "notes": notes})
            return run

        mock.init = init
        mock.log = lambda metrics, step=None: calls["log"].append(
            {"metrics": metrics, "step": step})
        monkeypatch.setitem(sys.modules, "wandb", mock)
        return calls

    def test_call_sequence(self, monkeypatch):
        from headpose_tpu.train.logging import WandbLogger

        calls = self._install_mock(monkeypatch)
        lg = WandbLogger("HeadPoseRegressor-BIWI-96features",
                         config={"learning_rate": 2.8e-4},
                         tags=["BIWI_Train"])
        lg.log({"train_loss": 1.0, "val_loss": 2.0}, step=1)
        lg.log({"train_loss": 0.5, "val_loss": 1.5}, step=2)
        lg.summary({"test_AFLW2000_mae": 8.03, "total_parameters": 3683})
        lg.finish()
        assert calls["init"][0]["project"] == "HeadPoseRegressor-BIWI-96features"
        assert calls["init"][0]["config"]["learning_rate"] == 2.8e-4
        assert [c["step"] for c in calls["log"]] == [1, 2]
        assert calls["summary"]["test_AFLW2000_mae"] == 8.03
        assert calls["finished"] == [True]

    def test_fit_with_wandb_backend(self, monkeypatch, tmp_path):
        """End-to-end: the trainer drives the wandb backend through
        make_logger exactly as the JSONL path."""
        from headpose_tpu.data.datasets import Dataset
        from headpose_tpu.train import config_96, fit
        from headpose_tpu.train.logging import make_logger

        calls = self._install_mock(monkeypatch)
        rng = np.random.default_rng(0)
        ds = Dataset(rng.normal(size=(96, 96)).astype(np.float32),
                     rng.normal(size=(96, 3)).astype(np.float32))
        cfg = config_96(total_epochs=3, early_stopping_patience=10,
                        checkpoint_dir=str(tmp_path), run_name="wb")
        logger = make_logger(str(tmp_path / "wb"), cfg.to_dict(),
                             wandb_project="mock-project")
        fit(cfg, ds, logger=logger)
        assert calls["init"][0]["project"] == "mock-project"
        assert len(calls["log"]) >= 3           # one per epoch
        assert any("val_loss" in c["metrics"] for c in calls["log"])
        assert calls["finished"] == [True]


class TestRound3ReviewFixes:
    """Behaviors locked in by the late-round-3 train/parallel review pass."""

    def test_reported_loss_includes_l2(self):
        """Keras's history['loss']/val_loss include the regularization term
        (the trajectory parity oracle pins this); the reported metric must
        be the SAME quantity early stopping monitors."""
        from headpose_tpu.train.loop import _loss_and_metrics
        from headpose_tpu.train.loop import build_head
        from headpose_tpu.train import config_96
        import jax.numpy as jnp
        cfg = config_96(in_features=8, num_filters=4, regularizer_rate=1.0)
        spec = build_head(cfg)
        params = spec.init(jax.random.PRNGKey(0))
        batch = {"x": np.ones((2, 8), np.float32),
                 "y": np.zeros((2, 3), np.float32),
                 "w": jnp.ones((2,)), "mask": jnp.ones((2,))}
        loss, m = _loss_and_metrics(spec, params, batch, None, 1.0, False)
        np.testing.assert_allclose(float(m["loss"]), float(loss), rtol=1e-7)
        pen = float(spec.l2_penalty(params, 1.0))
        assert pen > 0 and float(m["loss"]) > pen * 0.99

    def test_grid_sweep_covers_full_grid_by_default(self):
        grids = {"a": [1, 2, 3, 4], "b": [10, 20, 30]}
        sw = SweepConfig(parameters=grids, metric="m", method="grid")
        res = run_sweep(sw, lambda p: {"m": p["a"] * p["b"]})
        assert len(res.runs) == 12  # wandb grid method: ALL combos
        assert res.best["params"] == {"a": 1, "b": 10}

    def test_monitor_metric_val_mae(self, tmp_path):
        ds = synthetic_dataset(n=128)
        cfg = config_96(in_features=16, num_filters=4, total_epochs=3,
                        batch_size=64, checkpoint_dir=str(tmp_path),
                        run_name="mm", monitor_metric="val_mae")
        r = fit(cfg, ds)
        maes = [h["val_mae"] for h in r.history]
        np.testing.assert_allclose(r.best_val_loss, min(maes), rtol=1e-6)

    def test_monitor_metric_invalid_fails_fast(self, tmp_path):
        ds = synthetic_dataset(n=64)
        cfg = config_96(in_features=16, num_filters=4, total_epochs=2,
                        batch_size=64, checkpoint_dir=str(tmp_path),
                        run_name="bad", monitor_metric="val_banana")
        with pytest.raises(ValueError, match="monitor_metric"):
            fit(cfg, ds)

    def test_use_sample_weights_flag_computes_weights(self, tmp_path):
        """The config flag alone must weight training (Eq. 12-13), even when
        the caller loaded an unweighted Dataset."""
        rng = np.random.default_rng(0)
        x = rng.normal(size=(96, 16)).astype(np.float32)
        y = np.zeros((96, 3), np.float32)
        y[:, 0] = 85.0  # extreme yaw: difficulty weight << 1
        ds = Dataset(x, y)
        kw = dict(in_features=16, num_filters=4, total_epochs=2,
                  batch_size=32, checkpoint_dir=str(tmp_path), seed=7)
        r_flag = fit(config_96(run_name="w1", use_sample_weights=True, **kw),
                     Dataset(x.copy(), y.copy()))
        from headpose_tpu.data.datasets import difficulty_weights
        wds = Dataset(x.copy(), y.copy(), difficulty_weights(y))
        r_explicit = fit(config_96(run_name="w2", **kw), wds)
        r_plain = fit(config_96(run_name="w3", **kw),
                      Dataset(x.copy(), y.copy()))
        # flag == explicit weights, both != unweighted
        np.testing.assert_allclose(r_flag.history[0]["train_loss"],
                                   r_explicit.history[0]["train_loss"],
                                   rtol=1e-6)
        assert not np.isclose(r_flag.history[0]["train_loss"],
                              r_plain.history[0]["train_loss"], rtol=1e-4)

    def test_jsonl_logger_accepts_arrays(self, tmp_path):
        lg = JsonlLogger(str(tmp_path / "run"))
        lg.log({"per_angle": np.array([1.5, 2.5, 3.5]), "s": np.float32(4)})
        lg.finish()
        import json as _json
        line = open(str(tmp_path / "run" / "metrics.jsonl")).readline()
        rec = _json.loads(line)
        assert rec["per_angle"] == [1.5, 2.5, 3.5] and rec["s"] == 4.0

    def test_plot_learning_curves_empty_history(self, tmp_path):
        from headpose_tpu.train.logging import plot_learning_curves
        assert plot_learning_curves([], str(tmp_path / "x.png")) is None
