"""BNN -> INT8 QBNN ImageNet evaluation.

Counterpart of reference examples/main_bayesian_imagenet_bnn2qbnn.py:
build a Bayesian ResNet via dnn_to_bnn, (optionally) load its
checkpoint, quantize with prepare -> 3-batch calibration -> convert,
evaluate both float and INT8 models, and round-trip the quantized model
through a checkpoint (:285-313). The reference forces CPU + the oneDNN
engine (:25-27); the TPU build runs int8 on the MXU instead.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
from flax import nnx

from bayesian_torch_tpu.examples import _engine as engine
from bayesian_torch_tpu.examples._data import batches, load_imagenet_val
from bayesian_torch_tpu.models import dnn_to_bnn
from bayesian_torch_tpu.quantization import convert, prepare
from bayesian_torch_tpu.utils.checkpoint import load_checkpoint
from bayesian_torch_tpu.layers.base_variational_layer import make_rngs


def build_parser():
    p = argparse.ArgumentParser(description="ImageNet BNN->QBNN")
    p.add_argument("--arch", type=str, default="resnet50")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--calib-batch-size", type=int, default=32)
    p.add_argument("--num_monte_carlo", type=int, default=1)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--bnn-type", type=str, default="Reparameterization")
    p.add_argument("--bnn-ckpt", type=str, default=None)
    p.add_argument("--fuse-conv-bn", action="store_true")
    p.add_argument("--quantize-activations", action="store_true",
                   help="keep activations uint8 between conv layers "
                        "(QTensor flow; fastest INT8 path on TPU)")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    x, y = load_imagenet_val(args.data_dir, args.synthetic,
                             num_classes=args.num_classes)
    test_data = (x, y)

    from bayesian_torch_tpu.models.deterministic import (
        resnet_large as det_zoo)
    model = getattr(det_zoo, args.arch)(
        num_classes=args.num_classes,
        rngs=make_rngs(args.seed, noise_seed=args.seed + 1))
    dnn_to_bnn(model, {
        "prior_mu": 0.0, "prior_sigma": 1.0,
        "posterior_mu_init": 0.0, "posterior_rho_init": -4.0,
        "type": args.bnn_type, "moped_enable": False, "moped_delta": 0.5,
    })
    if args.bnn_ckpt:
        load_checkpoint(model, args.bnn_ckpt)
    model.eval()

    print("float BNN eval:")
    engine.evaluate(model, test_data, batch_size=args.calib_batch_size,
                    num_monte_carlo=args.num_monte_carlo)

    # prepare -> 3-batch calibration -> convert (reference :285-288)
    prepare(model)

    @nnx.jit
    def calib_step(model, xb):
        return model(xb)

    for i, (xb, _) in enumerate(batches(x, y, args.calib_batch_size,
                                        shuffle=False)):
        calib_step(model, jnp.asarray(xb))
        if i >= 2:
            break
    convert(model, fuse_conv_bn=args.fuse_conv_bn,
            quantize_activations=args.quantize_activations)

    print("INT8 QBNN eval:")
    engine.evaluate(model, test_data, batch_size=args.batch_size,
                    num_monte_carlo=args.num_monte_carlo)


if __name__ == "__main__":
    main()
