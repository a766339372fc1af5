#!/bin/bash
# Canonical MNIST MC eval: bs=10000, 20 MC samples.
python "$(dirname "$0")"/../examples/main_bayesian_mnist.py --mode=test --test-batch-size=10000 --num_monte_carlo=20 "$@"
