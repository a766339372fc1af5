"""ImageNet pipeline via dnn_to_bnn conversion.

Counterpart of reference examples/main_bayesian_imagenet_dnn2bnn.py:
deterministic ResNet-50 -> dnn_to_bnn (const_bnn_prior_parameters) ->
CE + get_kl_loss/batch training, MC predictive eval.
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import optax
from flax import nnx

from bayesian_torch_tpu.examples import _engine as engine
from bayesian_torch_tpu.examples._data import batches, load_imagenet_val
from bayesian_torch_tpu.models import dnn_to_bnn, get_kl_loss
from bayesian_torch_tpu.parallel import mc_forward
from bayesian_torch_tpu.utils.checkpoint import (load_checkpoint,
                                                 save_checkpoint)
from bayesian_torch_tpu.layers.base_variational_layer import make_rngs


def build_parser():
    p = argparse.ArgumentParser(description="ImageNet dnn_to_bnn")
    p.add_argument("--arch", type=str, default="resnet50")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=90)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "test"])
    p.add_argument("--num_monte_carlo", type=int, default=10)
    p.add_argument("--num_mc", type=int, default=1)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--save_dir", type=str,
                   default="./checkpoint/imagenet_dnn2bnn")
    p.add_argument("--bnn-type", type=str, default="Reparameterization")
    p.add_argument("--moped_enable", action="store_true")
    p.add_argument("--moped_delta", type=float, default=0.5)
    p.add_argument("--det-ckpt", type=str, default=None)
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
        resnet_large as det_zoo)
    model = getattr(det_zoo, args.arch)(
        num_classes=args.num_classes,
        rngs=make_rngs(args.seed, noise_seed=args.seed + 1))
    if args.det_ckpt:
        load_checkpoint(model, args.det_ckpt)

    const_bnn_prior_parameters = {
        "prior_mu": 0.0,
        "prior_sigma": 1.0,
        "posterior_mu_init": 0.0,
        "posterior_rho_init": -3.0,
        "type": args.bnn_type,
        "moped_enable": args.moped_enable,
        "moped_delta": args.moped_delta,
    }
    dnn_to_bnn(model, const_bnn_prior_parameters)
    ckpt_path = os.path.join(args.save_dir, f"imagenet_dnn2bnn_{args.arch}")

    num_mc, batch_size = args.num_mc, args.batch_size

    @nnx.jit
    def train_step(model, optimizer, xb, yb):
        def loss_fn(model):
            outs = mc_forward(model, xb, num_mc, return_kl=False)
            logits = outs.mean(axis=0)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
            kl = get_kl_loss(model)
            return ce + kl / batch_size
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    if args.mode == "train":
        model.train()
        optimizer = nnx.Optimizer(model, optax.sgd(args.lr, 0.9),
                                  wrt=nnx.Param)
        for epoch in range(args.epochs):
            for i, (xb, yb) in enumerate(batches(*train_data, batch_size,
                                                 seed=epoch)):
                loss = train_step(model, optimizer, jnp.asarray(xb),
                                  jnp.asarray(yb))
                if i % 10 == 0:
                    print(f"epoch {epoch} step {i}: loss {float(loss):.4f}")
        model.eval()
        metrics = engine.evaluate(model, test_data, batch_size=batch_size,
                                  num_monte_carlo=args.num_monte_carlo)
        save_checkpoint(model, ckpt_path)
        engine.save_metrics(metrics,
                            os.path.join(args.save_dir, "metrics.json"))
    else:
        load_checkpoint(model, ckpt_path)
        model.eval()
        engine.evaluate(model, test_data, batch_size=batch_size,
                        num_monte_carlo=args.num_monte_carlo)


if __name__ == "__main__":
    main()
