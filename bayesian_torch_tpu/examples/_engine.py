"""Shared train/eval engine for the example trainers.

TPU-native redesign of the reference's per-example train/test loops
(e.g. main_bayesian_mnist.py:20-99): one jitted train step (MC-vmapped
ELBO), one jitted MC-predictive eval step, AverageMeter-style throughput
reporting, and orbax checkpointing. The reference's Python
``for mc_run in range(num_mc)`` loops become the vmapped MC axis
(parallel.mc_forward).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from bayesian_torch_tpu.parallel import mc_forward
from bayesian_torch_tpu.utils.util import (mutual_information,
                                           predictive_entropy)


class AverageMeter:
    """Running average tracker (same role as the reference's
    AverageMeter, main_bayesian_cifar.py:533-548)."""

    def __init__(self, name, fmt=":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)

    def __str__(self):
        return f"{self.name} {self.val:.4f} ({self.avg:.4f})"


def make_train_step(num_mc: int, batch_size: int, mesh=None):
    """Jitted ELBO step: loss = mean-over-MC CE + KL/batch_size.

    Matches the reference objective (main_bayesian_mnist.py:27-35).
    With ``mesh``, the MC axis is sharded over the mesh's 'mc' slots
    and the batch over 'data' (num_mc must divide the 'mc' axis).
    """

    @nnx.jit(static_argnames=())
    def train_step(model, optimizer, x, y):
        def loss_fn(model):
            outs, kl = mc_forward(model, x, num_mc, mesh=mesh)
            log_probs = jax.nn.log_softmax(outs, axis=-1)
            mean_out = jnp.mean(log_probs, axis=0)
            nll = -jnp.take_along_axis(mean_out, y[:, None],
                                       axis=1).mean()
            loss = nll + kl / batch_size
            return loss, (nll, kl)

        # BatchNorm running stats update inside mc_forward itself
        # (bn_stats="ema": per-draw batch stats are collected under the
        # vmap and averaged into one EMA write) — no extra refresh
        # forward is needed for num_mc > 1.
        (loss, (nll, kl)), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(model)
        optimizer.update(model, grads)
        return loss, nll, kl

    return train_step


def make_eval_step(num_mc: int, mesh=None, structured: bool = False,
                   emission: str = "auto"):
    """Jitted MC predictive step -> per-sample class probabilities of
    shape (num_mc, batch, classes).

    ``structured=True`` routes through the vmap-free channel-tiled MC
    path (parallel.mc) — the fast form for Flipout inference
    (doc/PROFILE_r03.md); falls back automatically if the model's
    layers don't support it.

    ``emission="auto"`` (resolved inside ``mc_forward`` since round 5)
    picks the scan-over-draws emission for large-workload single-chip
    eval (the round-4 flagship form, doc/PROFILE_r04.md: each draw runs
    the det-form HLO) and the vmapped emission whenever a mesh or the
    structured path is requested (scan serializes draws, so an 'mc'
    mesh axis gains nothing under it) or the per-draw work is too small
    to amortize a sequential loop (the MC-20 LSTM measured 6.7x slower
    scanned)."""

    @nnx.jit
    def eval_step(model, x):
        outs = mc_forward(model, x, num_mc, return_kl=False, mesh=mesh,
                          structured=structured, emission=emission)
        return jax.nn.softmax(outs, axis=-1)

    return eval_step


def make_writer(log_dir):
    """Optional TensorBoard writer (reference gates this behind
    --tensorboard, main_bayesian_mnist.py:181-189); returns None when
    tensorboard isn't importable."""
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(log_dir)
    except Exception:
        print("tensorboard unavailable; skipping scalar logging")
        return None


def train(model, optimizer, data, *, epochs, batch_size, num_mc=1,
          log_every=50, logits_are_log_probs=False, writer=None,
          mesh=None, checkpoint_dir=None, resume=False, eval_fn=None):
    """Generic training loop over (x, y) host arrays.

    With ``checkpoint_dir``, a full training checkpoint (model +
    optimizer + epoch + best_acc + RNG counters) is written after every
    epoch; ``resume=True`` restores it and continues from the next
    epoch — the reference's --resume contract
    (main_bayesian_imagenet.py:316-336). ``eval_fn(model, epoch) -> acc``
    optionally tracks best_acc between epochs.
    """
    from bayesian_torch_tpu.utils.checkpoint import (
        load_training_checkpoint,
        save_training_checkpoint,
    )

    x_all, y_all = data
    step_fn = make_train_step(num_mc, batch_size, mesh)
    start_epoch, best_acc = 0, 0.0
    last_path = (os.path.join(checkpoint_dir, "last")
                 if checkpoint_dir else None)
    if resume and last_path and os.path.isdir(last_path):
        meta = load_training_checkpoint(last_path, model, optimizer)
        start_epoch, best_acc = meta["epoch"], meta["best_acc"]
        print(f"resumed from '{last_path}': epoch {start_epoch}, "
              f"best_acc {best_acc:.4f}")
    # native threaded prefetch loader (bayesian_torch_tpu.data): host
    # batch gather/shuffle overlaps device compute
    from bayesian_torch_tpu.data import DataLoader
    loader = DataLoader(x_all, y_all, batch_size=batch_size)
    history = []
    for epoch in range(start_epoch, epochs):
        losses = AverageMeter("loss")
        t0 = time.time()
        seen = 0
        for i, (xb, yb) in enumerate(loader.epoch(epoch)):
            xb, yb = jnp.asarray(xb), jnp.asarray(yb)
            if mesh is not None:
                from bayesian_torch_tpu.parallel import shard_batch
                xb, yb = shard_batch(xb, mesh), shard_batch(yb, mesh)
            loss, nll, kl = step_fn(model, optimizer, xb, yb)
            seen += xb.shape[0]
            if i % log_every == 0:
                loss_f = float(loss)
                losses.update(loss_f, xb.shape[0])
                print(f"epoch {epoch} step {i}: loss {loss_f:.4f} "
                      f"nll {float(nll):.4f} kl {float(kl):.4f}")
        dt = time.time() - t0
        print(f"epoch {epoch}: {losses} | {seen / dt:.1f} imgs/s")
        if writer is not None:
            # reference scalar names (main_bayesian_cifar.py:404-410)
            writer.add_scalar("train/elbo_loss", losses.avg, epoch)
            writer.add_scalar("train/imgs_per_sec", seen / dt, epoch)
        history.append({"epoch": epoch, "loss": losses.avg,
                        "imgs_per_sec": seen / dt})
        if eval_fn is not None:
            acc = eval_fn(model, epoch)
            best_acc = max(best_acc, float(acc))
        if last_path:
            save_training_checkpoint(last_path, model, optimizer,
                                     epoch=epoch + 1, best_acc=best_acc)
    return history


def evaluate(model, data, *, batch_size, num_monte_carlo=20,
             save_probs_to=None, writer=None, epoch=0, mesh=None,
             structured=False):
    """MC-predictive evaluation: accuracy + UQ metrics, optional .npy
    dump of the MC probability stack (reference
    main_bayesian_mnist.py:79-99)."""
    x_all, y_all = data
    eval_fn = make_eval_step(num_monte_carlo, mesh, structured)
    correct = 0
    total = 0
    all_probs = []
    all_labels = []
    from bayesian_torch_tpu.data import DataLoader
    loader = DataLoader(x_all, y_all, batch_size=batch_size,
                        shuffle=False)
    t0 = time.time()
    for xb, yb in loader.epoch(0):
        xb_d = jnp.asarray(xb)
        if mesh is not None:
            from bayesian_torch_tpu.parallel import shard_batch
            xb_d = shard_batch(xb_d, mesh)
        probs = eval_fn(model, xb_d)  # (MC, B, C)
        mean_probs = np.asarray(probs.mean(axis=0))
        correct += int((mean_probs.argmax(1) == yb).sum())
        total += xb.shape[0]
        all_probs.append(np.asarray(probs))
        all_labels.append(yb)
    dt = time.time() - t0
    probs = np.concatenate(all_probs, axis=1)
    labels = np.concatenate(all_labels)
    acc = correct / max(total, 1)
    pe = predictive_entropy(probs)
    mi = mutual_information(probs)
    print(f"test: accuracy {acc * 100:.2f}% | {total / dt:.1f} imgs/s | "
          f"predictive entropy {pe.mean():.4f} | "
          f"mutual information {mi.mean():.4f}")
    if writer is not None:
        writer.add_scalar("val/accuracy", acc, epoch)
        writer.add_scalar("val/predictive_entropy", float(pe.mean()), epoch)
        writer.add_scalar("val/mutual_information", float(mi.mean()), epoch)
    if save_probs_to:
        os.makedirs(os.path.dirname(save_probs_to) or ".", exist_ok=True)
        np.save(save_probs_to, probs)
        print(f"saved MC probabilities to {save_probs_to}")
    return {"accuracy": acc, "predictive_entropy": float(pe.mean()),
            "mutual_information": float(mi.mean()),
            "imgs_per_sec": total / dt}


def save_metrics(metrics, path):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(metrics, f, indent=2)


def make_optimizer(model, lr, kind="adam", momentum=0.9):
    tx = optax.adam(lr) if kind == "adam" else optax.sgd(lr, momentum)
    return nnx.Optimizer(model, tx, wrt=nnx.Param)
