"""CIFAR-10 pipeline via dnn_to_bnn conversion + optional PTQ.

Counterpart of reference examples/main_bayesian_cifar_dnn2bnn.py:
build a deterministic ResNet-20, (optionally) warm-start it from a
checkpoint, convert with dnn_to_bnn using the
``const_bnn_prior_parameters`` dict (the API contract preserved
verbatim, reference :146-154), train with CE + get_kl_loss/batch, and
optionally quantize: prepare -> calibrate (100 samples) -> convert
(reference :569-583).
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import optax
from flax import nnx

from bayesian_torch_tpu.examples import _engine as engine
from bayesian_torch_tpu.examples._data import batches, load_cifar10
from bayesian_torch_tpu.models import dnn_to_bnn, get_kl_loss
from bayesian_torch_tpu.utils.checkpoint import (load_checkpoint,
                                                 save_checkpoint)
from bayesian_torch_tpu.layers.base_variational_layer import make_rngs


def build_parser():
    p = argparse.ArgumentParser(description="CIFAR10 dnn_to_bnn")
    p.add_argument("--arch", type=str, default="resnet20")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--test-batch-size", type=int, default=1000)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "test", "ptq"])
    p.add_argument("--num_monte_carlo", type=int, default=20)
    p.add_argument("--num_mc", type=int, default=1)
    p.add_argument("--save_dir", type=str, default="./checkpoint/dnn2bnn")
    p.add_argument("--bnn-type", type=str, default="Reparameterization",
                   choices=["Reparameterization", "Flipout"])
    p.add_argument("--moped_enable", action="store_true")
    p.add_argument("--moped_delta", type=float, default=0.5)
    p.add_argument("--det-ckpt", type=str, default=None,
                   help="deterministic warm-start checkpoint")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    return p


def build_bnn(args):
    from bayesian_torch_tpu.models.deterministic import resnet as det_zoo
    model = getattr(det_zoo, args.arch)(
        rngs=make_rngs(args.seed, noise_seed=args.seed + 1))
    if args.det_ckpt:
        load_checkpoint(model, args.det_ckpt)

    # the reference's structured-config contract (dnn_to_bnn.py:41-49)
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
    return model


def make_train_step(batch_size, num_mc):
    from bayesian_torch_tpu.parallel import mc_forward

    @nnx.jit
    def step(model, optimizer, x, y):
        def loss_fn(model):
            outs = mc_forward(model, x, num_mc, return_kl=False)
            logits = outs.mean(axis=0)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            kl = get_kl_loss(model)
            return ce + kl / batch_size, (ce, kl)

        (loss, (ce, kl)), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(model)
        optimizer.update(model, grads)
        return loss, ce, kl

    return step


def quantize(model, calib_data, batch_size=128, num_calib=100):
    """prepare -> calibrate on ~100 samples -> convert
    (reference main_bayesian_cifar_dnn2bnn.py:235-248,569-583)."""
    from bayesian_torch_tpu.quantization import convert, prepare

    prepare(model)

    @nnx.jit
    def calib_step(model, x):
        return model(x)

    x_all, y_all = calib_data
    seen = 0
    for xb, _ in batches(x_all, y_all, batch_size, shuffle=False):
        calib_step(model, jnp.asarray(xb))
        seen += xb.shape[0]
        if seen >= num_calib:
            break
    convert(model)
    return model


def main(argv=None):
    args = build_parser().parse_args(argv)
    train_data, test_data = load_cifar10(args.data_dir, args.synthetic)
    model = build_bnn(args)
    ckpt_path = os.path.join(args.save_dir, f"cifar_dnn2bnn_{args.arch}")

    if args.mode == "train":
        model.train()
        optimizer = nnx.Optimizer(model, optax.adam(args.lr), wrt=nnx.Param)
        step_fn = make_train_step(args.batch_size, args.num_mc)
        for epoch in range(args.epochs):
            for i, (xb, yb) in enumerate(batches(
                    train_data[0], train_data[1], args.batch_size,
                    seed=epoch)):
                loss, ce, kl = step_fn(model, optimizer, jnp.asarray(xb),
                                       jnp.asarray(yb))
                if i % 50 == 0:
                    print(f"epoch {epoch} step {i}: loss {float(loss):.4f}"
                          f" ce {float(ce):.4f} kl {float(kl):.4f}")
        model.eval()
        metrics = engine.evaluate(model, test_data,
                                  batch_size=args.test_batch_size,
                                  num_monte_carlo=args.num_monte_carlo)
        save_checkpoint(model, ckpt_path)
        engine.save_metrics(metrics, os.path.join(args.save_dir,
                                                  "metrics.json"))
    elif args.mode == "test":
        load_checkpoint(model, ckpt_path)
        model.eval()
        engine.evaluate(model, test_data, batch_size=args.test_batch_size,
                        num_monte_carlo=args.num_monte_carlo)
    else:  # ptq
        if os.path.exists(os.path.abspath(ckpt_path)):
            load_checkpoint(model, ckpt_path)
        model.eval()
        print("float eval:")
        engine.evaluate(model, test_data, batch_size=args.test_batch_size,
                        num_monte_carlo=args.num_monte_carlo)
        quantize(model, train_data, args.batch_size)
        print("int8 eval:")
        engine.evaluate(model, test_data, batch_size=args.test_batch_size,
                        num_monte_carlo=args.num_monte_carlo)


if __name__ == "__main__":
    main()
