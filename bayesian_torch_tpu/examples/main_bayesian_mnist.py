"""Bayesian SCNN on MNIST (reparameterization).

Counterpart of reference examples/main_bayesian_mnist.py: train with the
MC-averaged ELBO (NLL + KL/batch), evaluate with MC predictive sampling
and dump the probability stack for offline UQ analysis. The reference's
``for mc_run in range(num_mc)`` loops run as the vmapped MC axis.
"""

from __future__ import annotations

import argparse
import os

from flax import nnx

from bayesian_torch_tpu.examples import _engine as engine
from bayesian_torch_tpu.examples._data import load_mnist
from bayesian_torch_tpu.models.bayesian.simple_cnn_variational import SCNN
from bayesian_torch_tpu.utils.checkpoint import (load_checkpoint,
                                                 save_checkpoint)
from bayesian_torch_tpu.layers.base_variational_layer import make_rngs


def build_parser():
    p = argparse.ArgumentParser(description="Bayesian SCNN MNIST")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--test-batch-size", type=int, default=1000)
    p.add_argument("--epochs", type=int, default=14)
    p.add_argument("--lr", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "test"])
    p.add_argument("--num_monte_carlo", type=int, default=20,
                   help="MC samples at test time")
    p.add_argument("--num_mc", type=int, default=1,
                   help="MC samples during training")
    p.add_argument("--save_dir", type=str, default="./checkpoint/bayesian")
    p.add_argument("--resume", action="store_true",
                   help="resume from <save_dir>/last (epoch + optimizer "
                        "+ best_acc)")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="use synthetic data (no-network environments)")
    p.add_argument("--tensorboard", action="store_true",
                   help="log scalars to <save_dir>/tb")
    p.add_argument("--mesh-mc", type=int, default=1,
                   help="mesh slots for the MC axis (rest go to data)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    train_data, test_data = load_mnist(args.data_dir, args.synthetic)

    model = SCNN(rngs=make_rngs(args.seed, noise_seed=args.seed + 1))
    ckpt_path = os.path.join(args.save_dir, "mnist_bayesian_scnn")

    mesh = None
    if args.mesh_mc > 1:
        from bayesian_torch_tpu.parallel import make_mesh
        mesh = make_mesh(mc=args.mesh_mc)
        print(f"mesh: {dict(mesh.shape)}")

    if args.mode == "train":
        model.train()
        writer = (engine.make_writer(os.path.join(args.save_dir, "tb"))
                  if args.tensorboard else None)
        # reference uses Adadelta(lr=1.0) (main_bayesian_mnist argparse)
        import optax
        optimizer = nnx.Optimizer(model, optax.adadelta(args.lr),
                                  wrt=nnx.Param)
        engine.train(model, optimizer, train_data, epochs=args.epochs,
                     batch_size=args.batch_size, num_mc=args.num_mc,
                     writer=writer, mesh=mesh,
                     checkpoint_dir=args.save_dir, resume=args.resume)
        model.eval()
        metrics = engine.evaluate(model, test_data,
                                  batch_size=args.test_batch_size,
                                  num_monte_carlo=args.num_monte_carlo,
                                  writer=writer, epoch=args.epochs,
                                  mesh=mesh)
        save_checkpoint(model, ckpt_path)
        engine.save_metrics(metrics, os.path.join(args.save_dir,
                                                  "mnist_metrics.json"))
    else:
        load_checkpoint(model, ckpt_path)
        model.eval()
        engine.evaluate(
            model, test_data, batch_size=args.test_batch_size,
            num_monte_carlo=args.num_monte_carlo, mesh=mesh,
            save_probs_to=os.path.join(args.save_dir,
                                       "probs_mnist_mc.npy"))


if __name__ == "__main__":
    main()
