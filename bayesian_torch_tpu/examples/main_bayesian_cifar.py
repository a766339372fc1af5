"""Bayesian ResNet-20 on CIFAR-10 (reparameterization) with optional
MOPED empirical-Bayes initialization from a deterministic checkpoint.

Counterpart of reference examples/main_bayesian_cifar.py: staged LR
schedule, MC train loop (vmapped here), MC predictive eval with
throughput print and .npy probability dump. DataParallel is replaced by
the (data, mc) mesh — pass --mesh-mc to shard MC samples across chips.
"""

from __future__ import annotations

import argparse
import os

import optax
from flax import nnx

from bayesian_torch_tpu.examples import _engine as engine
from bayesian_torch_tpu.examples._data import load_cifar10
from bayesian_torch_tpu.utils.checkpoint import (load_checkpoint,
                                                 save_checkpoint)
from bayesian_torch_tpu.utils.util import MOPED
from bayesian_torch_tpu.layers.base_variational_layer import make_rngs


def build_parser(desc="Bayesian CIFAR10"):
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--arch", type=str, default="resnet20",
                   choices=["resnet20", "resnet32", "resnet44", "resnet56",
                            "resnet110"])
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--test-batch-size", type=int, default=1000)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "test"])
    p.add_argument("--num_monte_carlo", type=int, default=50)
    p.add_argument("--structured-mc", action="store_true",
                   help="vmap-free channel-tiled MC eval path "
                        "(fastest for Flipout inference; falls "
                        "back per layer)")
    p.add_argument("--num_mc", type=int, default=1)
    p.add_argument("--save_dir", type=str, default="./checkpoint/bayesian")
    p.add_argument("--resume", action="store_true",
                   help="resume from <save_dir>/last (epoch + optimizer "
                        "+ best_acc, reference main_bayesian_cifar.py:204)")
    p.add_argument("--moped", action="store_true",
                   help="initialize posteriors from a deterministic ckpt")
    p.add_argument("--moped-ckpt", type=str, default=None)
    p.add_argument("--delta", type=float, default=0.2)
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--mesh-mc", type=int, default=1,
                   help="mesh slots for the MC axis (rest go to data); "
                        "the canonical eval config (bs=1000, mc=50) "
                        "benefits from sharding MC draws across chips")
    return p


def lr_schedule(base_lr, epochs):
    """Staged decay like the reference (main_bayesian_cifar.py:280-290)."""
    return optax.piecewise_constant_schedule(
        base_lr, {int(epochs * 0.5): 0.1, int(epochs * 0.75): 0.1})


def get_model(arch, seed, estimator="Reparameterization"):
    if estimator == "Flipout":
        from bayesian_torch_tpu.models.bayesian import resnet_flipout as zoo
    else:
        from bayesian_torch_tpu.models.bayesian import (
            resnet_variational as zoo)
    return getattr(zoo, arch)(rngs=make_rngs(seed, noise_seed=seed + 1))


def run(args, estimator="Reparameterization"):
    train_data, test_data = load_cifar10(args.data_dir, args.synthetic)
    model = get_model(args.arch, args.seed, estimator)
    tag = "flipout" if estimator == "Flipout" else "bayesian"
    ckpt_path = os.path.join(args.save_dir, f"cifar_{tag}_{args.arch}")

    mesh = None
    if getattr(args, "mesh_mc", 1) > 1:
        from bayesian_torch_tpu.parallel import make_mesh
        mesh = make_mesh(mc=args.mesh_mc)
        print(f"mesh: {dict(mesh.shape)}")

    if args.moped:
        from bayesian_torch_tpu.models.deterministic import resnet as det_zoo
        det = getattr(det_zoo, args.arch)(
            rngs=make_rngs(args.seed + 7, noise_seed=args.seed + 8))
        MOPED(model, det, args.moped_ckpt, args.delta)
        print(f"applied MOPED init (delta={args.delta})")

    if args.mode == "train":
        model.train()
        optimizer = nnx.Optimizer(
            model, optax.adam(lr_schedule(args.lr, args.epochs)),
            wrt=nnx.Param)
        engine.train(model, optimizer, train_data, epochs=args.epochs,
                     batch_size=args.batch_size, num_mc=args.num_mc,
                     mesh=mesh, checkpoint_dir=args.save_dir,
                     resume=args.resume)
        model.eval()
        metrics = engine.evaluate(model, test_data,
                                  batch_size=args.test_batch_size,
                                  num_monte_carlo=args.num_monte_carlo,
                                  structured=args.structured_mc,
                                  mesh=mesh)
        save_checkpoint(model, ckpt_path)
        engine.save_metrics(metrics, os.path.join(
            args.save_dir, f"cifar_{tag}_metrics.json"))
    else:
        load_checkpoint(model, ckpt_path)
        model.eval()
        engine.evaluate(
            model, test_data, batch_size=args.test_batch_size,
            num_monte_carlo=args.num_monte_carlo, mesh=mesh,
            structured=args.structured_mc,
            save_probs_to=os.path.join(args.save_dir,
                                       f"probs_cifar_{tag}_mc.npy"))


def main(argv=None):
    run(build_parser().parse_args(argv), "Reparameterization")


if __name__ == "__main__":
    main()
