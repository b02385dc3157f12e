"""Training loop: whole epochs as single XLA programs.

The reference trains with Keras model.fit — per-step Python dispatch, host
batching (train_88.py:355-363, train_96.py:175-183).  Here an epoch is ONE
jitted program: device-side shuffle (jax.random.permutation), lax.scan over
batches, fused loss/grad/optimizer updates.  Early stopping, checkpointing,
and logging run between epochs on host.

Loss semantics match Keras exactly:
  * MSE reduced over all element axes, then averaged over (optionally
    sample-weighted) batch rows;
  * L2 regularization added to the loss (Keras kernel/bias regularizers are
    loss terms, NOT decoupled weight decay — matters for Adam);
  * optimizer defaults match Keras (Adam/Adamax eps 1e-7).
Early stopping mirrors keras.callbacks.EarlyStopping(patience, min_delta,
restore_best_weights) on val_loss (train_96.py:159-164), and the best-epoch
checkpoint mirrors ModelCheckpoint(save_best_only=True).

Multi-chip: pass a jax.sharding.Mesh and the batch dimension is sharded over
its 'data' axis (params replicated) — XLA inserts the gradient psum.  On one
device this degrades to plain jit.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.datasets import Dataset
from ..models.heads import HEAD_REGISTRY, MLPHead
from .checkpoints import restore_checkpoint, save_checkpoint, save_pytree
from .config import TrainConfig
from .logging import MetricLogger, new_run_id

__all__ = ["build_head", "make_optimizer", "fit", "TrainResult", "evaluate"]


def build_head(cfg: TrainConfig):
    """Instantiate a head spec from config (the model zoo switch of
    train_88.py:309-322 / train_96.py:65-110, as data not commented-out code)."""
    if cfg.head == "mlp":
        return MLPHead(cfg.in_features,
                       ((cfg.num_filters, cfg.activation), (3, "linear")),
                       dropout_rate=cfg.dropout_rate)
    if cfg.head == "ensemble":
        # an ensemble's members cannot be described by the scalar config
        # fields — construct EnsembleHead yourself and pass it as
        # fit(..., spec=ensemble)
        raise ValueError(
            "head='ensemble' is not buildable from TrainConfig alone "
            "(members are full head specs); construct models.EnsembleHead "
            "directly and pass it via fit(cfg, ds, spec=...)")
    cls = HEAD_REGISTRY[cfg.head]
    kwargs: dict[str, Any] = {"in_features": cfg.in_features}
    if cfg.head in ("residual_mlp", "skip_mlp"):
        kwargs.update(activation=cfg.activation, dropout_rate=cfg.dropout_rate)
    return cls(**kwargs)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Keras-matching optimizers (train_96.py:99-103, train_88.py:323).
    With reduce_lr_on_plateau the learning rate becomes an injected
    hyperparameter so fit() can lower it between epochs."""
    factories = {
        "sgd": optax.sgd,
        "adamax": lambda lr: optax.adamax(lr, eps=1e-7),
        "adam": lambda lr: optax.adam(lr, eps=1e-7),
    }
    if cfg.optimizer not in factories:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    factory = factories[cfg.optimizer]
    if cfg.reduce_lr_on_plateau:
        return optax.inject_hyperparams(
            lambda learning_rate: factory(learning_rate))(
            learning_rate=cfg.learning_rate)
    return factory(cfg.learning_rate)


def _pad_dataset(ds: Dataset, multiple: int):
    """Pad rows to a multiple of the batch size; mask marks real rows."""
    n = len(ds)
    n_pad = (-n) % multiple
    mask = np.concatenate([np.ones(n, np.float32), np.zeros(n_pad, np.float32)])
    x = np.concatenate([ds.features, np.zeros((n_pad, ds.num_features), np.float32)])
    y = np.concatenate([ds.poses, np.zeros((n_pad, 3), np.float32)])
    w = mask.copy()
    if ds.weights is not None:
        w[:n] = ds.weights
    return {"x": jnp.asarray(x), "y": jnp.asarray(y),
            "w": jnp.asarray(w), "mask": jnp.asarray(mask)}


def _loss_and_metrics(spec, params, batch, rng, reg_rate, train):
    pred = spec.apply(params, batch["x"], train=train, rng=rng)
    err = pred - batch["y"]
    per_sample_mse = jnp.mean(jnp.square(err), axis=-1)
    per_sample_mae = jnp.mean(jnp.abs(err), axis=-1)
    w = batch["w"]
    mask = batch["mask"]
    denom_m = jnp.maximum(mask.sum(), 1e-9)
    # Keras loss reduction is SUM_OVER_BATCH_SIZE: sum(w_i * l_i) / B, NOT
    # / sum(w) — with difficulty weights <= 1 the latter would inflate the
    # loss (and effective lr) by B/sum(w).  B here = real (unpadded) rows.
    mse = (per_sample_mse * w).sum() / denom_m       # keras weighted loss
    mae = (per_sample_mae * mask).sum() / denom_m    # keras metrics are unweighted
    loss = mse + spec.l2_penalty(params, reg_rate)
    # the REPORTED loss includes the regularization term, like Keras's
    # history['loss'] / val_loss (the golden trajectory oracle pins this:
    # tests/test_train_parity.py compares our total loss to tf-keras's
    # history) — early stopping monitors the same quantity the reference
    # monitors.  Callers wanting the bare MSE pass reg_rate=0 (evaluate()).
    return loss, {"loss": loss, "mae": mae}


def _make_epoch_fn(spec, cfg: TrainConfig, optimizer, batch_size: int):
    reg = cfg.regularizer_rate

    def epoch_fn(params, opt_state, data, rng):
        n = data["x"].shape[0]
        n_batches = n // batch_size
        perm_rng, drop_rng = jax.random.split(rng)
        perm = jax.random.permutation(perm_rng, n)

        def shuffled(a):
            return a[perm].reshape((n_batches, batch_size) + a.shape[1:])

        batches = {k: shuffled(v) for k, v in data.items()}
        batches["_step"] = jnp.arange(n_batches)

        def step(carry, batch):
            params, opt_state = carry
            rng_step = jax.random.fold_in(drop_rng, batch.pop("_step"))
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: _loss_and_metrics(spec, p, batch, rng_step, reg, True),
                has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            del loss
            return (params, opt_state), metrics

        (params, opt_state), ms = jax.lax.scan(step, (params, opt_state), batches)
        mean_metrics = jax.tree_util.tree_map(jnp.mean, ms)
        return params, opt_state, mean_metrics

    return epoch_fn


def _make_block_fn(spec, cfg: TrainConfig, optimizer, batch_size: int,
                   k: int):
    """k training epochs + early-stop/NaN/plateau bookkeeping as ONE device
    program (TrainConfig.epochs_per_sync).

    The reference syncs with the host every epoch (Keras callbacks); so does
    fit()'s default loop — through this container's TPU tunnel that costs a
    ~0.2 s round trip per epoch, dominating small-head training.  This block
    form keeps the SAME semantics (EarlyStopping patience/min_delta on
    val_loss, restore-best, NaN rollback to best weights with fresh
    optimizer, ReduceLROnPlateau) but carries the bookkeeping state on
    device and syncs once per k epochs.

    Carry: (params, opt_state, estate) where estate = {best_val, best_params,
    best_epoch, wait, stop, nan_recoveries}.  Per-epoch stacked outputs let
    the host reconstruct the exact per-epoch history/log stream."""
    epoch_core = _make_epoch_fn(spec, cfg, optimizer, batch_size)
    eval_core = _make_eval_fn(spec, cfg)
    plateau = cfg.reduce_lr_on_plateau

    def one_epoch(params, opt_state, estate, data, val_data, root_rng, epoch):
        erng = jax.random.fold_in(root_rng, epoch)
        new_params, new_opt, train_m = epoch_core(params, opt_state, data, erng)
        val_m = eval_core(new_params, val_data)
        finite = (jnp.isfinite(train_m["loss"]) & jnp.isfinite(val_m["loss"]))

        def on_nan(_):
            # roll back to the best weights with a fresh optimizer; keep a
            # plateau-reduced LR (resuming at the full initial LR would
            # likely diverge again); 4th recovery stops the run
            nan_rec = estate["nan_recoveries"] + 1
            p = estate["best_params"]
            o = optimizer.init(p)
            if plateau:
                o = o._replace(hyperparams=dict(
                    o.hyperparams,
                    learning_rate=opt_state.hyperparams["learning_rate"]))
            est = dict(estate, nan_recoveries=nan_rec,
                       stop=estate["stop"] | (nan_rec > 3))
            return p, o, est

        def on_finite(_):
            mon = _monitored(cfg, val_m)
            improved = mon < estate["best_val"] - cfg.early_stopping_min_delta
            best_val = jnp.where(improved, mon, estate["best_val"])
            best_epoch = jnp.where(improved, epoch, estate["best_epoch"])
            best_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(improved, new, old),
                new_params, estate["best_params"])
            wait = jnp.where(improved, 0, estate["wait"] + 1)
            stop = estate["stop"] | (wait >= cfg.early_stopping_patience)
            o = new_opt
            if plateau:
                cur = o.hyperparams["learning_rate"]
                reduce = (~improved) & (wait > 0) & \
                    (wait % cfg.reduce_lr_patience == 0) & ~stop
                new_lr = jnp.where(
                    reduce, jnp.maximum(cur * cfg.reduce_lr_factor,
                                        cfg.min_lr), cur)
                o = o._replace(hyperparams=dict(o.hyperparams,
                                                learning_rate=new_lr))
            est = dict(estate, best_val=best_val, best_epoch=best_epoch,
                       best_params=best_params, wait=wait, stop=stop)
            return new_params, o, est

        params2, opt2, est2 = jax.lax.cond(finite, on_finite, on_nan, None)
        rec = {"train_loss": train_m["loss"], "train_mae": train_m["mae"],
               "val_loss": val_m["loss"], "val_mae": val_m["mae"],
               "nan": ~finite,
               "lr": (opt2.hyperparams["learning_rate"] if plateau
                      else jnp.float32(cfg.learning_rate))}
        return params2, opt2, est2, rec

    def block_fn(params, opt_state, estate, data, val_data, root_rng, epoch0):
        def step(carry, i):
            params, opt_state, estate = carry
            epoch = epoch0 + i
            # a block may extend past total_epochs (total % k != 0) — those
            # trailing epochs must be no-ops, exactly like the host loop
            active = ~estate["stop"] & (epoch < cfg.total_epochs)

            def run(_):
                return one_epoch(params, opt_state, estate, data, val_data,
                                 root_rng, epoch)

            def skip(_):
                rec = {"train_loss": jnp.float32(0), "train_mae": jnp.float32(0),
                       "val_loss": jnp.float32(0), "val_mae": jnp.float32(0),
                       "nan": jnp.bool_(False),
                       "lr": (opt_state.hyperparams["learning_rate"]
                              if plateau else jnp.float32(cfg.learning_rate))}
                return params, opt_state, estate, rec

            p, o, e, rec = jax.lax.cond(active, run, skip, None)
            rec["active"] = active
            return (p, o, e), rec

        (params, opt_state, estate), recs = jax.lax.scan(
            step, (params, opt_state, estate), jnp.arange(k))
        return params, opt_state, estate, recs

    return block_fn


def _monitored(cfg: TrainConfig, val_m):
    """The early-stopping/plateau-monitored scalar (cfg.monitor_metric)."""
    key = {"val_loss": "loss", "val_mae": "mae"}.get(cfg.monitor_metric)
    if key is None:
        raise ValueError(
            f"monitor_metric must be 'val_loss' or 'val_mae', "
            f"got {cfg.monitor_metric!r}")
    return val_m[key]


def _make_eval_fn(spec, cfg: TrainConfig):
    def eval_fn(params, data):
        _, metrics = _loss_and_metrics(spec, params, data, None,
                                       cfg.regularizer_rate, False)
        return metrics

    return eval_fn


def evaluate(spec, params, ds: Dataset) -> dict[str, float]:
    """Unweighted loss (MSE) + MAE on a dataset, one jitted call.

    Sample weights are intentionally ignored here: test metrics must stay
    comparable across weighted/unweighted training runs and match the
    reference evaluator (Model-96/test.py:41-54)."""
    data = _pad_dataset(Dataset(ds.features, ds.poses), 1)
    m = _eval_jit(spec)(params, data)
    return {k: float(v) for k, v in m.items()}


@functools.lru_cache(maxsize=128)
def _eval_jit(spec):
    """Cached jitted evaluator per (hashable, frozen) head spec — a fresh
    jit(lambda) per evaluate() call would recompile every time, and through
    this container's TPU tunnel a compile costs ~30-90 s.

    Matmuls pin 'highest': reported test metrics are PARITY numbers compared
    against the reference evaluator at 0.01-degree resolution, so they must
    not drift with the backend's ambient MXU precision (CLAUDE.md)."""
    def _metrics(p, d):
        with jax.default_matmul_precision("highest"):
            return _loss_and_metrics(spec, p, d, None, 0.0, False)[1]

    return jax.jit(_metrics)


@dataclasses.dataclass
class TrainResult:
    spec: Any
    params: Any            # best (restored) parameters
    history: list[dict[str, float]]
    best_epoch: int
    best_val_loss: float
    test_metrics: dict[str, dict[str, float]]
    run_dir: str | None = None


def fit(cfg: TrainConfig, train_ds: Dataset, val_ds: Dataset | None = None,
        test_sets: dict[str, Dataset] | None = None,
        logger: MetricLogger | None = None, spec=None, params=None,
        mesh: jax.sharding.Mesh | None = None,
        resume: bool = False,
        progress_every: int = 0) -> TrainResult:
    """Train a pose head.  Mirrors the reference train() flow
    (train_96.py:113-209): split → callbacks → fit → test evals → summary."""
    from ..data.datasets import difficulty_weights, train_val_split

    _monitored(cfg, {"loss": 0.0, "mae": 0.0})  # fail fast on a bad metric
    if cfg.use_sample_weights and train_ds.weights is None:
        # honor the config flag even when the caller loaded an unweighted
        # Dataset — Eq. 12-13 difficulty weighting (Model-96/utilities.py)
        train_ds = Dataset(train_ds.features, train_ds.poses,
                           difficulty_weights(train_ds.poses))
    if val_ds is None:
        train_ds, val_ds = train_val_split(train_ds, cfg.val_fraction, cfg.split_seed)

    rng = jax.random.PRNGKey(cfg.seed)
    if spec is None:
        spec = build_head(cfg)
    if params is None:
        params = spec.init(rng)

    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)

    batch_size = min(cfg.batch_size, len(train_ds))
    data_devices = 1 if mesh is None else mesh.shape[cfg.data_dim]
    # rows must divide evenly across the mesh data axis; with batch_size a
    # multiple of it, padding to whole batches covers the training data too
    batch_size = max(data_devices, batch_size - batch_size % data_devices)
    data = _pad_dataset(train_ds, batch_size)
    val_data = _pad_dataset(val_ds, data_devices)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        row_sharded = NamedSharding(mesh, P(cfg.data_dim))
        data = {k: jax.device_put(v, row_sharded) for k, v in data.items()}
        val_data = {k: jax.device_put(v, row_sharded) for k, v in val_data.items()}
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)

    epoch_fn = jax.jit(_make_epoch_fn(spec, cfg, optimizer, batch_size),
                       donate_argnums=(0, 1))
    eval_fn = jax.jit(_make_eval_fn(spec, cfg))

    def _copy(tree):
        # epoch_fn donates its param/opt buffers — anything retained across
        # epochs (best weights, rollback state) must be an owning copy
        return jax.tree_util.tree_map(lambda a: jnp.asarray(a).copy(), tree)

    run_id = cfg.run_name or new_run_id()
    ckpt_dir = os.path.join(cfg.checkpoint_dir, run_id)
    start_epoch = 0
    best_val = float("inf")
    best_epoch = -1
    wait = 0
    best_params = _copy(params)
    history: list[dict[str, float]] = []

    if resume:
        if cfg.run_name is None:
            # a fresh random run_id can never name an existing checkpoint
            # directory — silently starting over would betray the request
            raise ValueError(
                "fit(resume=True) needs cfg.run_name to locate the prior "
                "run's checkpoints (a fresh run gets a random id)")
        restored = restore_checkpoint(
            ckpt_dir, like={"params": params, "opt_state": opt_state})
        if restored is not None:
            step, params, opt_state, meta, ckpt_best = restored
            # checkpoints are written AFTER epoch `step` completes, so the
            # resumed loop continues at step+1 — re-running `step` would
            # apply its update twice (same fold_in(rng, step) randomness)
            start_epoch = step + 1
            best_val = meta.get("best_val", best_val)
            best_epoch = meta.get("best_epoch", best_epoch)
            wait = meta.get("wait", 0)
            # per-epoch checkpoints are written at improvement (params ARE
            # the best); block-mode ones carry the distinct best weights
            best_params = _copy(ckpt_best if ckpt_best is not None
                                else params)

    t0 = time.time()
    epoch = start_epoch
    nan_recoveries = 0
    k = max(1, int(cfg.epochs_per_sync))
    if k > 1:
        # -------- block mode: k epochs per device program, one host sync --
        block_fn = jax.jit(_make_block_fn(spec, cfg, optimizer, batch_size, k),
                           donate_argnums=(0, 1, 2))
        estate = {"best_val": jnp.float32(best_val),
                  "best_params": _copy(best_params),
                  "best_epoch": jnp.int32(best_epoch),
                  "wait": jnp.int32(wait),
                  "stop": jnp.bool_(False),
                  "nan_recoveries": jnp.int32(0)}
        prev_lr = cfg.learning_rate
        prev_best_epoch = best_epoch
        for block_start in range(start_epoch, cfg.total_epochs, k):
            params, opt_state, estate, recs = block_fn(
                params, opt_state, estate, data, val_data, rng,
                jnp.int32(block_start))
            recs = {kk: np.asarray(v) for kk, v in recs.items()}  # ONE sync
            for i in range(k):
                epoch_i = block_start + i
                if epoch_i >= cfg.total_epochs or not recs["active"][i]:
                    continue
                epoch = epoch_i        # last epoch actually executed
                if recs["nan"][i]:
                    nan_recoveries += 1
                    if logger is not None:
                        logger.log({"epoch": epoch,
                                    "nan_recovery": nan_recoveries},
                                   step=epoch)
                    continue
                rec = {"epoch": epoch,
                       "train_loss": float(recs["train_loss"][i]),
                       "train_mae": float(recs["train_mae"][i]),
                       "val_loss": float(recs["val_loss"][i]),
                       "val_mae": float(recs["val_mae"][i])}
                history.append(rec)
                if logger is not None:
                    logger.log(rec, step=epoch)
                if progress_every and epoch % progress_every == 0:
                    print(f"[{run_id}] epoch {epoch} "
                          f"loss {rec['train_loss']:.4f} "
                          f"val {rec['val_loss']:.4f} "
                          f"({time.time() - t0:.1f}s)")
                lr_i = float(recs["lr"][i])
                if cfg.reduce_lr_on_plateau and lr_i != prev_lr:
                    if logger is not None:
                        logger.log({"epoch": epoch, "learning_rate": lr_i},
                                   step=epoch)
                    prev_lr = lr_i
            best_val = float(estate["best_val"])
            best_epoch = int(estate["best_epoch"])
            wait = int(estate["wait"])
            if best_epoch > prev_best_epoch:
                # on-disk checkpoint at sync granularity: the LIVE
                # params/opt_state pair at the sync epoch (so resume replays
                # the remaining epochs exactly) plus the distinct best
                # weights for the early-stopping bookkeeping
                save_checkpoint(ckpt_dir, epoch, params, opt_state,
                                best_params=estate["best_params"],
                                extra={"best_val": best_val,
                                       "best_epoch": best_epoch,
                                       "wait": wait, "run_id": run_id})
                prev_best_epoch = best_epoch
            if bool(estate["stop"]):
                break
        best_params = _copy(estate["best_params"])
        nan_recoveries = int(estate["nan_recoveries"])
    for epoch in range(start_epoch if k == 1 else cfg.total_epochs,
                       cfg.total_epochs):
        # keyed by epoch index (not a running split chain) so a resumed run
        # continues the SAME shuffle/dropout stream instead of replaying
        # epochs 0..N's randomness from the start
        erng = jax.random.fold_in(rng, epoch)
        params, opt_state, train_m = epoch_fn(params, opt_state, data, erng)
        val_m = eval_fn(params, val_data)
        rec = {"epoch": epoch,
               "train_loss": float(train_m["loss"]), "train_mae": float(train_m["mae"]),
               "val_loss": float(val_m["loss"]), "val_mae": float(val_m["mae"])}

        # failure detection: a non-finite loss (divergence/overflow) rolls the
        # run back to the best weights with a fresh optimizer — the reference
        # had no such guard (SURVEY.md §5.3); a NaN there poisons the run
        if not (np.isfinite(rec["train_loss"]) and np.isfinite(rec["val_loss"])):
            nan_recoveries += 1
            if nan_recoveries > 3:
                # give up — but never RETURN the NaN-poisoned weights: roll
                # back to best first, exactly like the block-mode on_nan
                # path (matters when restore_best_weights=False)
                params = _copy(best_params)
                break
            params = _copy(best_params)
            cur_lr = (float(opt_state.hyperparams["learning_rate"])
                      if cfg.reduce_lr_on_plateau else None)
            opt_state = optimizer.init(params)
            if cur_lr is not None:
                # keep any plateau-reduced LR: resuming divergence recovery
                # at the full initial LR would likely diverge again
                opt_state.hyperparams["learning_rate"] = jnp.asarray(
                    cur_lr, jnp.float32)
            if logger is not None:
                logger.log({"epoch": epoch, "nan_recovery": nan_recoveries},
                           step=epoch)
            continue
        history.append(rec)
        if logger is not None:
            logger.log(rec, step=epoch)
        if progress_every and epoch % progress_every == 0:
            print(f"[{run_id}] epoch {epoch} "
                  f"loss {rec['train_loss']:.4f} val {rec['val_loss']:.4f} "
                  f"({time.time() - t0:.1f}s)")

        # EarlyStopping + best-checkpoint semantics (cfg.monitor_metric)
        if rec[cfg.monitor_metric] < best_val - cfg.early_stopping_min_delta:
            best_val = rec[cfg.monitor_metric]
            best_epoch = epoch
            best_params = _copy(params)
            wait = 0
            save_checkpoint(ckpt_dir, epoch, params, opt_state,
                            extra={"best_val": best_val, "best_epoch": best_epoch,
                                   "wait": wait, "run_id": run_id})
        else:
            wait += 1
            if wait >= cfg.early_stopping_patience:
                break
            # ReduceLROnPlateau (train_88.py:346-351 semantics)
            if (cfg.reduce_lr_on_plateau
                    and wait > 0 and wait % cfg.reduce_lr_patience == 0):
                cur = float(opt_state.hyperparams["learning_rate"])
                new_lr = max(cur * cfg.reduce_lr_factor, cfg.min_lr)
                if new_lr < cur:
                    opt_state.hyperparams["learning_rate"] = jnp.asarray(
                        new_lr, jnp.float32)
                    if logger is not None:
                        logger.log({"epoch": epoch, "learning_rate": new_lr},
                                   step=epoch)

    final_params = best_params if cfg.restore_best_weights else params
    save_pytree(os.path.join(ckpt_dir, "best"), final_params)

    test_metrics: dict[str, dict[str, float]] = {}
    for name, ds in (test_sets or {}).items():
        test_metrics[name] = evaluate(spec, final_params, ds)

    if logger is not None:
        summary = {"best_epoch": best_epoch + 1, "best_val_loss": best_val,
                   "total_parameters": sum(
                       int(np.prod(a.shape))
                       for a in jax.tree_util.tree_leaves(final_params)),
                   "epochs_run": epoch + 1}
        for name, m in test_metrics.items():
            summary[f"test_{name}_loss"] = m["loss"]
            summary[f"test_{name}_mae"] = m["mae"]
        logger.summary(summary)
        logger.finish()   # close backends that hold a run open (wandb)

    return TrainResult(spec=spec, params=final_params, history=history,
                       best_epoch=best_epoch, best_val_loss=best_val,
                       test_metrics=test_metrics, run_dir=ckpt_dir)
