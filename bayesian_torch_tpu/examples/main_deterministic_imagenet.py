"""Deterministic ImageNet ResNet (baseline / MOPED source).

Counterpart of reference examples/main_deterministic_imagenet.py.
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import optax
from flax import nnx

from bayesian_torch_tpu.examples._data import batches, load_imagenet_val
from bayesian_torch_tpu.examples.main_deterministic_mnist import (
    evaluate_det,
)
from bayesian_torch_tpu.utils.checkpoint import (load_checkpoint,
                                                 save_checkpoint)
from bayesian_torch_tpu.layers.base_variational_layer import make_rngs


def build_parser():
    p = argparse.ArgumentParser(description="Deterministic ImageNet")
    p.add_argument("--arch", type=str, default="resnet50")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=90)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "test"])
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--save_dir", type=str,
                   default="./checkpoint/deterministic")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    x, y = load_imagenet_val(args.data_dir, args.synthetic,
                             num_classes=args.num_classes)
    n_val = max(1, len(x) // 5)
    train_data, test_data = (x[n_val:], y[n_val:]), (x[:n_val], y[:n_val])

    from bayesian_torch_tpu.models.deterministic import (
        resnet_large as zoo)
    model = getattr(zoo, args.arch)(
        num_classes=args.num_classes,
        rngs=make_rngs(args.seed, noise_seed=args.seed + 1))
    ckpt_path = os.path.join(args.save_dir, f"imagenet_det_{args.arch}")

    if args.mode == "train":
        model.train()
        optimizer = nnx.Optimizer(model, optax.sgd(args.lr, momentum=0.9),
                                  wrt=nnx.Param)

        @nnx.jit
        def step(model, optimizer, xb, yb):
            def loss_fn(model):
                logits = model(xb)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, yb).mean()
            loss, grads = nnx.value_and_grad(loss_fn)(model)
            optimizer.update(model, grads)
            return loss

        for epoch in range(args.epochs):
            for i, (xb, yb) in enumerate(batches(*train_data,
                                                 args.batch_size,
                                                 seed=epoch)):
                loss = step(model, optimizer, jnp.asarray(xb),
                            jnp.asarray(yb))
                if i % 10 == 0:
                    print(f"epoch {epoch} step {i}: loss {float(loss):.4f}")
        evaluate_det(model, test_data, args.batch_size)
        save_checkpoint(model, ckpt_path)
    else:
        load_checkpoint(model, ckpt_path)
        evaluate_det(model, test_data, args.batch_size)


if __name__ == "__main__":
    main()
