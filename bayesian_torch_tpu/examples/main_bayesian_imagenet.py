"""Bayesian ResNet-50 on ImageNet (reparameterization).

Counterpart of reference examples/main_bayesian_imagenet.py. The
reference's torch.distributed/mp.spawn + DataParallel scaffolding
(:255-294) is replaced by the TPU-native (data, mc) mesh: pass
--mesh-mc N to shard MC samples over N mesh slots and the batch over
the rest; on multi-host slices the same mesh spans hosts after
jax.distributed.initialize, with no trainer changes.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from bayesian_torch_tpu.examples import _engine as engine
from bayesian_torch_tpu.examples._data import batches, load_imagenet_val
from bayesian_torch_tpu.parallel import make_mesh, mc_forward, shard_batch
from bayesian_torch_tpu.utils.checkpoint import (load_checkpoint,
                                                 save_checkpoint)
from bayesian_torch_tpu.utils.util import MOPED
from bayesian_torch_tpu.layers.base_variational_layer import make_rngs


def build_parser(desc="Bayesian ImageNet"):
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--arch", type=str, default="resnet50",
                   choices=["resnet18", "resnet34", "resnet50",
                            "resnet101", "resnet152"])
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=90)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "test"])
    p.add_argument("--num_monte_carlo", type=int, default=10)
    p.add_argument("--structured-mc", action="store_true",
                   help="vmap-free channel-tiled MC eval path "
                        "(fastest for Flipout inference; falls "
                        "back per layer)")
    p.add_argument("--num_mc", type=int, default=1)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--save_dir", type=str, default="./checkpoint/imagenet")
    p.add_argument("--resume", action="store_true",
                   help="resume from <save_dir>/last (epoch + optimizer + "
                        "best_acc, reference main_bayesian_imagenet.py:316)")
    p.add_argument("--moped", action="store_true")
    p.add_argument("--moped-ckpt", type=str, default=None)
    p.add_argument("--delta", type=float, default=0.5)
    p.add_argument("--mesh-mc", type=int, default=1,
                   help="mesh slots for the MC axis (rest go to data)")
    p.add_argument("--remat", action="store_true",
                   help="checkpoint each residual block (saves only "
                        "block inputs for backward): ~2x the trainable "
                        "batch envelope at equal per-image cost, see "
                        "doc/performance.md")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    return p


def get_model(arch, seed, num_classes, estimator="Reparameterization",
              remat=False):
    if estimator == "Flipout":
        from bayesian_torch_tpu.models.bayesian import (
            resnet_flipout_large as zoo)
    else:
        from bayesian_torch_tpu.models.bayesian import (
            resnet_variational_large as zoo)
    return getattr(zoo, arch)(num_classes=num_classes,
                              rngs=make_rngs(seed, noise_seed=seed + 1),
                              remat_blocks=remat)


def run(args, estimator="Reparameterization"):
    x, y = load_imagenet_val(args.data_dir, args.synthetic,
                             num_classes=args.num_classes)
    n_val = max(1, len(x) // 5)
    train_data = (x[n_val:], y[n_val:])
    test_data = (x[:n_val], y[:n_val])

    mesh = None
    if args.mesh_mc > 1 or len(jax.devices()) > 1:
        mesh = make_mesh(mc=args.mesh_mc)
        print(f"mesh: {dict(mesh.shape)}")

    model = get_model(args.arch, args.seed, args.num_classes, estimator,
                      remat=getattr(args, "remat", False))
    tag = "flipout" if estimator == "Flipout" else "bayesian"
    ckpt_path = os.path.join(args.save_dir, f"imagenet_{tag}_{args.arch}")

    if args.moped:
        from bayesian_torch_tpu.models.deterministic import (
            resnet_large as det_zoo)
        det = getattr(det_zoo, args.arch)(
            num_classes=args.num_classes,
            rngs=make_rngs(args.seed + 7, noise_seed=args.seed + 8))
        MOPED(model, det, args.moped_ckpt, args.delta)
        print(f"applied MOPED init (delta={args.delta})")

    num_mc, batch_size = args.num_mc, args.batch_size

    @nnx.jit
    def train_step(model, optimizer, xb, yb):
        def loss_fn(model):
            outs, kl = mc_forward(model, xb, num_mc, mesh=mesh)
            logits = outs.mean(axis=0)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
            return ce + kl / batch_size, (ce, kl)

        (loss, (ce, kl)), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(model)
        optimizer.update(model, grads)
        return loss, ce, kl

    if args.mode == "train":
        model.train()
        optimizer = nnx.Optimizer(model, optax.sgd(args.lr, 0.9),
                                  wrt=nnx.Param)
        from bayesian_torch_tpu.utils.checkpoint import (
            load_training_checkpoint, save_training_checkpoint)
        last_path = os.path.join(args.save_dir, "last")
        start_epoch = 0
        if args.resume and os.path.isdir(last_path):
            meta = load_training_checkpoint(last_path, model, optimizer)
            start_epoch = meta["epoch"]
            print(f"resumed from epoch {start_epoch} "
                  f"(best_acc {meta['best_acc']:.4f})")
        import time
        for epoch in range(start_epoch, args.epochs):
            t0, seen = time.time(), 0
            for i, (xb, yb) in enumerate(batches(*train_data, batch_size,
                                                 seed=epoch)):
                xb, yb = jnp.asarray(xb), jnp.asarray(yb)
                if mesh is not None:
                    xb, yb = shard_batch(xb, mesh), shard_batch(yb, mesh)
                loss, ce, kl = train_step(model, optimizer, xb, yb)
                seen += xb.shape[0]
                if i % 10 == 0:
                    print(f"epoch {epoch} step {i}: loss {float(loss):.4f}"
                          f" ce {float(ce):.4f} kl {float(kl):.4f}")
            print(f"epoch {epoch}: {seen / (time.time() - t0):.1f} imgs/s")
            save_training_checkpoint(last_path, model, optimizer,
                                     epoch=epoch + 1)
        model.eval()
        metrics = engine.evaluate(model, test_data,
                                  batch_size=batch_size,
                                  num_monte_carlo=args.num_monte_carlo,
                        structured=args.structured_mc)
        save_checkpoint(model, ckpt_path)
        engine.save_metrics(metrics, os.path.join(
            args.save_dir, f"imagenet_{tag}_metrics.json"))
    else:
        load_checkpoint(model, ckpt_path)
        model.eval()
        engine.evaluate(model, test_data, batch_size=batch_size,
                        num_monte_carlo=args.num_monte_carlo,
                        structured=args.structured_mc)


def main(argv=None):
    run(build_parser().parse_args(argv), "Reparameterization")


if __name__ == "__main__":
    main()
