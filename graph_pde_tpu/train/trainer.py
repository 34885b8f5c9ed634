"""One configurable trainer replacing the reference's 15 script-level
train loops (SURVEY.md section 2.4).

Design: a *task* adapts a model family to the trainer —

    forward(params, batch)  -> [B, N, out] predictions
    targets(batch)          -> [B, N, out]
    mask(batch)             -> [B, N] validity (padding excluded)
    decode(values, batch)   -> physical-units fields [B, N] for metrics

The trainer jits one (params, opt_state, batch) -> (params, opt_state,
metrics) step with donated state, supports the three backward losses that
appear in the reference (L1: UAI1_full_resolution.py:265; MSE:
UAI3_resolution.py:223; decoded rel-L2: MGKN_general_darcy2d.py:277-280),
and reports the reference's per-epoch metrics (train_mse, decoded
train/test rel-L2).
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .optim import adam_steplr
from ..utils.losses import LpLoss


# Stacked-train-set size above which fit() refuses multi-epoch scanning
# (epochs_per_jit > 1) and silently runs one epoch per jit instead — see
# the guard in fit(). Calibrated between the proven-good configs (bench
# ~15 MB, uai2 ~40 MB, mgkn_orthogonal ~100 MB) and the reproducible
# round-4 TPU worker crash (uai1 full-grid, ~1.3 GB stacked).
MULTI_EPOCH_MAX_BYTES = 512 * 2**20

# Stacked-train-set size above which the per-epoch path gathers each
# batch from the device-resident dataset inside the epoch scan (indexed
# by a small [n_steps, B] permutation argument) instead of materializing
# a full shuffled copy on device. stack_epoch's copy transiently doubles
# the dataset's HBM footprint (old epoch's copy + new one can overlap →
# ~3x), which OOMs the v5e at neurips4_gcn scale (1024 x 421^2-node
# lattice samples ~ 5.1 GB stacked). The gather costs one [B, ...] take
# per step — noise next to a train step.
GATHER_EPOCH_MIN_BYTES = 2 * 2**30

# Max scan length per gather-epoch dispatch. A single 1024-step gather
# scan over the 5.1 GB resident set reproducibly crashes the TPU worker
# (round 5, neurips4_gcn — same failure class as the round-4 uai1
# multi-epoch crash, where a 500-step scanned program died while the
# 100-step one was proven). Chunking the permutation keeps each program
# in the proven scan-length band at a few dispatches per epoch; the
# host still syncs only once per epoch.
GATHER_CHUNK_STEPS = 128


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 200
    batch_size: int = 2
    learning_rate: float = 1e-4
    weight_decay: float = 5e-4
    scheduler_step: int = 50
    scheduler_gamma: float = 0.5
    loss: str = "l1"          # 'l1' | 'mse' | 'rel2'
    seed: int = 0
    # >1: scan this many epochs inside ONE jit (make_multi_epoch_fn) —
    # shuffling moves on-device and the host syncs once per chunk.
    # Test eval then runs at chunk boundaries only.
    epochs_per_jit: int = 1


class Task:
    """Adapter base; see GKNTask etc. in graph_pde_tpu/train/tasks.py."""

    def forward(self, params, batch):  # pragma: no cover - interface
        raise NotImplementedError

    def targets(self, batch):
        return batch.y

    def mask(self, batch):
        raise NotImplementedError

    def decode(self, values, batch):
        """values: [B, N] encoded -> physical units."""
        return values


def make_loss_fn(task: Task, loss_type: str):
    lp = LpLoss(size_average=False)

    def loss_fn(params, batch):
        pred = task.forward(params, batch)        # [B, N, out]
        y = task.targets(batch)                   # [B, N, out]
        mask = task.mask(batch).astype(pred.dtype)  # [B, N]
        pm = pred[..., 0] * mask
        ym = y[..., 0] * mask
        diff = pm - ym
        mse = jnp.sum(diff ** 2) / jnp.maximum(jnp.sum(mask), 1.0)
        if loss_type == "l1":
            loss = jnp.sum(jnp.abs(diff))
        elif loss_type == "mse":
            loss = mse
        elif loss_type == "rel2":
            dec_p = task.decode(pred[..., 0], batch) * mask
            dec_y = task.decode(y[..., 0], batch) * mask
            loss = lp.rel(dec_p, dec_y)
        else:
            raise ValueError(loss_type)
        # decoded rel-L2 metric (the universal reference eval metric)
        dec_p = task.decode(pred[..., 0], batch) * mask
        dec_y = task.decode(y[..., 0], batch) * mask
        l2 = lp.rel(dec_p, dec_y)
        return loss, {"mse": mse, "l2_sum": l2,
                      "batch": jnp.asarray(pred.shape[0], jnp.float32)}

    return loss_fn


def make_train_step(task: Task, tx):
    loss_fn = make_loss_fn(task, task.loss_type)

    @jax.jit
    def train_step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        return params, opt_state, metrics

    return train_step


def make_epoch_fn(task: Task, tx):
    """Whole-epoch train function: scans the train step over a stacked
    epoch of batches [n_steps, B, ...] inside ONE jit — removes per-step
    dispatch overhead and lets XLA schedule across steps (TPU-first
    replacement for the reference's Python batch loop)."""
    loss_fn = make_loss_fn(task, task.loss_type)

    @jax.jit
    def epoch_fn(params, opt_state, batches):
        def body(carry, batch):
            params, opt_state = carry
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, metrics["l2_sum"])

        (params, opt_state), (losses, l2s) = jax.lax.scan(
            body, (params, opt_state), batches)
        return params, opt_state, jnp.sum(losses), jnp.sum(l2s)

    return epoch_fn


def make_epoch_fn_gather(task: Task, tx):
    """Whole-epoch train function for datasets too large to re-stack
    per epoch (GATHER_EPOCH_MIN_BYTES): the scan carries the
    device-resident dataset as an argument and each step gathers its
    batch by index from a [n_steps, B] permutation — same math as
    make_epoch_fn on stack_epoch output, without the full shuffled
    device copy."""
    loss_fn = make_loss_fn(task, task.loss_type)

    @jax.jit
    def epoch_fn(params, opt_state, data, perm):
        def body(carry, idx_b):
            params, opt_state = carry
            batch = jax.tree_util.tree_map(lambda a: a[idx_b], data)
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, metrics["l2_sum"])

        (params, opt_state), (losses, l2s) = jax.lax.scan(
            body, (params, opt_state), perm)
        return params, opt_state, jnp.sum(losses), jnp.sum(l2s)

    return epoch_fn


def make_multi_epoch_fn(task: Task, tx, batch_size: int,
                        epochs_per_call: int):
    """K epochs in ONE jit: an outer scan over epochs (each with an
    on-device ``jax.random.permutation`` shuffle and batch regrouping)
    around the inner step scan. Amortizes the per-epoch fixed cost —
    host re-stacking, dispatch, and the forced readback (~25-30 ms
    round-trip on tunneled backends) — across K epochs. Statistically
    identical training to make_epoch_fn (shuffle RNG moves from numpy
    to jax.random).

    Returns fn(params, opt_state, data, key) -> (params, opt_state,
    loss_sums[K], l2_sums[K]); ``data`` is the full stacked dataset
    (leading sample axis), device-resident."""
    loss_fn = make_loss_fn(task, task.loss_type)

    @jax.jit
    def multi_epoch_fn(params, opt_state, data, key):
        n = jax.tree_util.tree_leaves(data)[0].shape[0]
        n_steps = n // batch_size
        n_used = n_steps * batch_size

        def step_body(carry, batch):
            params, opt_state = carry
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, metrics["l2_sum"])

        def epoch_body(carry, key_e):
            params, opt_state = carry
            sel = jax.random.permutation(key_e, n)[:n_used]
            batches = jax.tree_util.tree_map(
                lambda a: a[sel].reshape(
                    (n_steps, batch_size) + a.shape[1:]), data)
            (params, opt_state), (losses, l2s) = jax.lax.scan(
                step_body, (params, opt_state), batches)
            return (params, opt_state), (jnp.sum(losses), jnp.sum(l2s))

        keys = jax.random.split(key, epochs_per_call)
        (params, opt_state), (loss_e, l2_e) = jax.lax.scan(
            epoch_body, (params, opt_state), keys)
        return params, opt_state, loss_e, l2_e

    return multi_epoch_fn


def stack_epoch(data, batch_size: int, rng=None):
    """Host-side: reshapes a stacked dataset into [n_steps, B, ...] for
    make_epoch_fn, with optional shuffling."""
    import numpy as np

    leaves = jax.tree_util.tree_leaves(data)
    n = leaves[0].shape[0]
    order = np.arange(n)
    if rng is not None:
        rng.shuffle(order)
    n_steps = n // batch_size
    sel = order[: n_steps * batch_size]
    return jax.tree_util.tree_map(
        lambda a: a[sel].reshape((n_steps, batch_size) + a.shape[1:]),
        data)


def make_eval_step(task: Task):
    lp = LpLoss(size_average=False)

    @jax.jit
    def eval_step(params, batch):
        pred = task.forward(params, batch)
        y = task.targets(batch)
        mask = task.mask(batch).astype(pred.dtype)
        dec_p = task.decode(pred[..., 0], batch) * mask
        dec_y = task.decode(y[..., 0], batch) * mask
        return lp.rel(dec_p, dec_y)

    return eval_step


@dataclasses.dataclass
class FitResult:
    params: object
    opt_state: object
    train_l2: list
    test_l2: list
    epoch_times: list
    # epoch index (1-based, = epochs completed) of each test_l2 entry.
    # With epochs_per_jit > 1 the test eval runs at chunk boundaries
    # only, so len(test_l2) == epochs/K while len(train_l2) == epochs —
    # zipping the two histories blindly mis-aligns; consumers must pair
    # test_l2[i] with epoch test_epochs[i].
    test_epochs: list = dataclasses.field(default_factory=list)

    def curves(self):
        """Aligned error curves for reference-style np.savetxt export:
        (train [epochs, 2] of (epoch, rel-L2), test [n_evals, 2]).
        Epoch columns make the multi-epoch-chunk eval cadence explicit
        (UAI1_full_resolution.py:312-315 saves bare arrays and relies on
        equal lengths — which epochs_per_jit>1 breaks)."""
        train = np.stack([np.arange(1, len(self.train_l2) + 1,
                                    dtype=np.float64),
                          np.asarray(self.train_l2, np.float64)], axis=1)
        test = np.stack([np.asarray(self.test_epochs, np.float64),
                         np.asarray(self.test_l2, np.float64)],
                        axis=1) if self.test_l2 else np.zeros((0, 2))
        return train, test

    def save_curves(self, out_dir: str, name: str = "run"):
        """Writes {name}_train_l2.txt / {name}_test_l2.txt with epoch
        columns."""
        import os

        os.makedirs(out_dir, exist_ok=True)
        train, test = self.curves()
        paths = []
        for arr, key in ((train, "train_l2"), (test, "test_l2")):
            p = os.path.join(out_dir, f"{name}_{key}.txt")
            np.savetxt(p, arr, header="epoch rel_l2")
            paths.append(p)
        return paths


def fit(task: Task, params, train_data, cfg: TrainConfig,
        test_data=None, log_every: int = 1,
        callback: Optional[Callable] = None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 0,
        resume: bool = False,
        scan_epochs: bool = True) -> FitResult:
    """Host-side epoch loop over ONE-JIT scanned epochs.

    Each epoch is a single dispatched computation (make_epoch_fn: lax.scan
    of the train step over a device-resident stacked [n_steps, B, ...]
    epoch) with one host sync for the metric — the TPU-first replacement
    for the reference's per-batch Python loop
    (UAI1_full_resolution.py:254-283), and essential over a tunneled
    backend where every forced dispatch costs ~25-30 ms. Set
    ``scan_epochs=False`` for the per-step dispatch path (needed only
    when batches cannot share one static shape).

    With ``checkpoint_dir`` set, saves params+opt_state every
    ``checkpoint_every`` epochs (and at the end) and can ``resume``
    mid-training — the reference only pickles the final model
    (UAI1_full_resolution.py:317)."""
    from ..data.datasets import batch_iterator

    n_train = jax.tree_util.tree_leaves(train_data)[0].shape[0]
    steps_per_epoch = max(n_train // cfg.batch_size, 1)
    tx = adam_steplr(cfg.learning_rate, weight_decay=cfg.weight_decay,
                     steps_per_epoch=steps_per_epoch,
                     step_size_epochs=cfg.scheduler_step,
                     gamma=cfg.scheduler_gamma)
    opt_state = tx.init(params)
    start_epoch = 0
    if resume and checkpoint_dir:
        from .checkpoint import restore_checkpoint

        restored = restore_checkpoint(
            checkpoint_dir,
            template={"params": params, "opt_state": opt_state})
        if restored is not None:
            params = restored["params"]
            opt_state = restored["opt_state"]
            start_epoch = restored["step"]
    rng = np.random.default_rng(cfg.seed + start_epoch)

    # keep the whole dataset device-resident: one transfer, not one per
    # batch per epoch (host->device through the tunnel is ~135 ms for a
    # 15 MB epoch, PERF_NOTES.md)
    train_data = jax.device_put(train_data)
    eval_step = make_eval_step(task)
    eval_scan = None
    test_full = test_rem = None
    if test_data is not None:
        test_data = jax.device_put(test_data)
        n_test = jax.tree_util.tree_leaves(test_data)[0].shape[0]
        n_full = (n_test // cfg.batch_size) * cfg.batch_size
        if n_full:
            test_full = jax.tree_util.tree_map(
                lambda a: a[:n_full].reshape(
                    (-1, cfg.batch_size) + a.shape[1:]), test_data)
        if n_test - n_full:
            test_rem = jax.tree_util.tree_map(
                lambda a: a[n_full:], test_data)

        @jax.jit
        def eval_scan(params, batches):
            lp = LpLoss(size_average=False)

            def body(carry, batch):
                pred = task.forward(params, batch)
                y = task.targets(batch)
                mask = task.mask(batch).astype(pred.dtype)
                dec_p = task.decode(pred[..., 0], batch) * mask
                dec_y = task.decode(y[..., 0], batch) * mask
                return carry + lp.rel(dec_p, dec_y), None

            total, _ = jax.lax.scan(body, jnp.zeros(()), batches)
            return total

    if scan_epochs and cfg.epochs_per_jit > 1:
        # Worker-crash guard (round-4 finding, NEXT_STEPS.md): the
        # K-epoch scanned program at full-grid scale (uai1: stacked
        # dataset ~1.3 GB, E=383k/graph, kw=1024, depth 6) reproducibly
        # crashes the TPU worker at K=5, while the per-epoch program is
        # proven at the same scale. Large datasets also amortize their
        # epoch dispatch overhead (~25-30 ms) over seconds-scale
        # epochs, so multi-epoch scanning buys nothing there — fall
        # back to epochs_per_jit=1 instead of risking the worker.
        data_bytes = sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for l in jax.tree_util.tree_leaves(train_data))
        if data_bytes > MULTI_EPOCH_MAX_BYTES:
            import warnings

            warnings.warn(
                f"epochs_per_jit={cfg.epochs_per_jit} requested but the "
                f"stacked train set is {data_bytes / 2**20:.0f} MiB > "
                f"{MULTI_EPOCH_MAX_BYTES / 2**20:.0f} MiB — falling "
                "back to one epoch per jit (multi-epoch scanned "
                "programs at this scale can crash the TPU worker; "
                "trainer.MULTI_EPOCH_MAX_BYTES)")
            cfg = dataclasses.replace(cfg, epochs_per_jit=1)
    if scan_epochs and cfg.epochs_per_jit > 1:
        return _fit_multi_epoch(task, params, train_data, cfg, tx,
                                opt_state, start_epoch, test_full,
                                test_rem, eval_scan, eval_step,
                                n_test=(0 if test_data is None else n_test),
                                callback=callback,
                                checkpoint_dir=checkpoint_dir,
                                checkpoint_every=checkpoint_every)
    gather_epochs = False
    if scan_epochs:
        data_bytes = sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for l in jax.tree_util.tree_leaves(train_data))
        gather_epochs = data_bytes > GATHER_EPOCH_MIN_BYTES
        epoch_fn = (make_epoch_fn_gather(task, tx) if gather_epochs
                    else make_epoch_fn(task, tx))
    else:
        train_step = make_train_step(task, tx)

    train_l2_hist, test_l2_hist, test_epochs, times = [], [], [], []
    for ep in range(start_epoch, cfg.epochs):
        t0 = time.perf_counter()
        if scan_epochs:
            count = (n_train // cfg.batch_size) * cfg.batch_size
            if gather_epochs:
                order = np.arange(n_train)
                rng.shuffle(order)
                perm_full = order[:count].reshape(-1, cfg.batch_size)
                l2_sum = jnp.zeros(())
                for c0 in range(0, perm_full.shape[0],
                                GATHER_CHUNK_STEPS):
                    perm = jnp.asarray(
                        perm_full[c0:c0 + GATHER_CHUNK_STEPS], jnp.int32)
                    params, opt_state, _, l2_c = epoch_fn(
                        params, opt_state, train_data, perm)
                    l2_sum = l2_sum + l2_c
            else:
                batches = stack_epoch(train_data, cfg.batch_size, rng)
                params, opt_state, _, l2_sum = epoch_fn(
                    params, opt_state, batches)
        else:
            l2_sum = jnp.zeros(())
            count = 0
            for batch in batch_iterator(train_data, cfg.batch_size, rng):
                params, opt_state, metrics = train_step(
                    params, opt_state, batch)
                l2_sum = l2_sum + metrics["l2_sum"]
                count += jax.tree_util.tree_leaves(batch)[0].shape[0]
        train_l2 = float(l2_sum) / max(count, 1)  # the one host sync
        times.append(time.perf_counter() - t0)
        train_l2_hist.append(train_l2)

        test_l2 = None
        if test_data is not None:
            tl = jnp.zeros(())
            if test_full is not None:
                tl = tl + eval_scan(params, test_full)
            if test_rem is not None:
                tl = tl + eval_step(params, test_rem)
            test_l2 = float(tl) / max(n_test, 1)
            test_l2_hist.append(test_l2)
            test_epochs.append(ep + 1)
        if callback is not None:
            callback(ep, params, train_l2, test_l2)
        if (checkpoint_dir and checkpoint_every
                and (ep + 1) % checkpoint_every == 0):
            from .checkpoint import save_checkpoint

            save_checkpoint(checkpoint_dir, ep + 1, params, opt_state)
    if checkpoint_dir:
        from .checkpoint import save_checkpoint

        save_checkpoint(checkpoint_dir, cfg.epochs, params, opt_state)
    return FitResult(params, opt_state, train_l2_hist, test_l2_hist,
                     times, test_epochs)


def _fit_multi_epoch(task, params, train_data, cfg, tx, opt_state,
                     start_epoch, test_full, test_rem, eval_scan,
                     eval_step, n_test, callback, checkpoint_dir,
                     checkpoint_every):
    """fit() body for epochs_per_jit > 1: chunks of K epochs per
    dispatch, one host sync per chunk; test eval at chunk boundaries."""
    n_train = jax.tree_util.tree_leaves(train_data)[0].shape[0]
    count = (n_train // cfg.batch_size) * cfg.batch_size
    # fold start_epoch in so a checkpoint-resumed run does NOT replay the
    # shuffle sequence from epoch 0 (the single-epoch path likewise seeds
    # with seed + start_epoch)
    key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), start_epoch)
    fns = {}
    train_l2_hist, test_l2_hist, test_epochs, times = [], [], [], []
    ep = start_epoch
    while ep < cfg.epochs:
        k = min(cfg.epochs_per_jit, cfg.epochs - ep)
        if k not in fns:
            fns[k] = make_multi_epoch_fn(task, tx, cfg.batch_size, k)
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, _, l2_e = fns[k](params, opt_state,
                                            train_data, sub)
        l2_e = np.asarray(l2_e) / max(count, 1)  # one sync per chunk
        dt = (time.perf_counter() - t0) / k
        times.extend([dt] * k)
        train_l2_hist.extend(l2_e.tolist())

        test_l2 = None
        if n_test:
            tl = jnp.zeros(())
            if test_full is not None:
                tl = tl + eval_scan(params, test_full)
            if test_rem is not None:
                tl = tl + eval_step(params, test_rem)
            test_l2 = float(tl) / n_test
            test_l2_hist.append(test_l2)
        ep_prev, ep = ep, ep + k
        if test_l2 is not None:
            test_epochs.append(ep)
        if callback is not None:
            callback(ep - 1, params, float(l2_e[-1]), test_l2)
        # checkpoint whenever the chunk CROSSED a checkpoint_every
        # boundary — not only when it lands exactly on a multiple (a
        # checkpoint_every not divisible by epochs_per_jit would
        # otherwise silently skip every intermediate checkpoint)
        if (checkpoint_dir and checkpoint_every
                and ep // checkpoint_every > ep_prev // checkpoint_every):
            from .checkpoint import save_checkpoint

            save_checkpoint(checkpoint_dir, ep, params, opt_state)
    if checkpoint_dir:
        from .checkpoint import save_checkpoint

        save_checkpoint(checkpoint_dir, cfg.epochs, params, opt_state)
    return FitResult(params, opt_state, train_l2_hist, test_l2_hist,
                     times, test_epochs)


def evaluate(task: Task, params, data, batch_size: int = 4) -> float:
    """Mean decoded rel-L2 over a stacked dataset."""
    from ..data.datasets import batch_iterator

    eval_step = make_eval_step(task)
    total, count = 0.0, 0
    for batch in batch_iterator(data, batch_size, drop_remainder=False):
        total += float(eval_step(params, batch))
        count += jax.tree_util.tree_leaves(batch)[0].shape[0]
    return total / max(count, 1)


__all__ = [
    "TrainConfig", "Task", "make_loss_fn", "make_train_step",
    "make_epoch_fn", "make_multi_epoch_fn", "make_eval_step",
    "fit", "evaluate", "FitResult",
]
