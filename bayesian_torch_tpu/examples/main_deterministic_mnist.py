"""Deterministic SCNN on MNIST (baseline / MOPED source).

Counterpart of reference examples/main_deterministic_mnist.py.
"""

from __future__ import annotations

import argparse
import os
import time

import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from bayesian_torch_tpu.examples._data import batches, load_mnist
from bayesian_torch_tpu.models.deterministic.simple_cnn import SCNN
from bayesian_torch_tpu.utils.checkpoint import (load_checkpoint,
                                                 save_checkpoint)
from bayesian_torch_tpu.layers.base_variational_layer import make_rngs


def build_parser():
    p = argparse.ArgumentParser(description="Deterministic SCNN MNIST")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--test-batch-size", type=int, default=1000)
    p.add_argument("--epochs", type=int, default=14)
    p.add_argument("--lr", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "test"])
    p.add_argument("--save_dir", type=str,
                   default="./checkpoint/deterministic")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    return p


def evaluate_det(model, data, batch_size):
    model.eval()

    @nnx.jit
    def fwd(model, xb):
        return model(xb)

    correct = total = 0
    t0 = time.time()
    for xb, yb in batches(*data, batch_size, shuffle=False):
        preds = np.asarray(fwd(model, jnp.asarray(xb)).argmax(axis=1))
        correct += int((preds == yb).sum())
        total += xb.shape[0]
    print(f"test: accuracy {correct / total * 100:.2f}% | "
          f"{total / (time.time() - t0):.1f} imgs/s")
    return correct / total


def main(argv=None):
    args = build_parser().parse_args(argv)
    train_data, test_data = load_mnist(args.data_dir, args.synthetic)
    model = SCNN(rngs=make_rngs(args.seed, noise_seed=args.seed + 1))
    ckpt_path = os.path.join(args.save_dir, "mnist_det_scnn")

    if args.mode == "train":
        model.train()
        optimizer = nnx.Optimizer(model, optax.adadelta(args.lr),
                                  wrt=nnx.Param)

        @nnx.jit
        def step(model, optimizer, xb, yb):
            def loss_fn(model):
                log_probs = model(xb)
                return -jnp.take_along_axis(log_probs, yb[:, None],
                                            axis=1).mean()
            loss, grads = nnx.value_and_grad(loss_fn)(model)
            optimizer.update(model, grads)
            return loss

        for epoch in range(args.epochs):
            for i, (xb, yb) in enumerate(batches(*train_data,
                                                 args.batch_size,
                                                 seed=epoch)):
                loss = step(model, optimizer, jnp.asarray(xb),
                            jnp.asarray(yb))
                if i % 50 == 0:
                    print(f"epoch {epoch} step {i}: loss {float(loss):.4f}")
        evaluate_det(model, test_data, args.test_batch_size)
        save_checkpoint(model, ckpt_path)
    else:
        load_checkpoint(model, ckpt_path)
        evaluate_det(model, test_data, args.test_batch_size)


if __name__ == "__main__":
    main()
