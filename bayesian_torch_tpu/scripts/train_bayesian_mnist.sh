#!/bin/bash
# Canonical Bayesian SCNN MNIST training config.
python "$(dirname "$0")"/../examples/main_bayesian_mnist.py --mode=train --batch-size=64 --lr=1.0 --epochs=14 "$@"
