#!/bin/bash
# Canonical CIFAR eval config: bs=1000, 50 MC samples.
python "$(dirname "$0")"/../examples/main_bayesian_cifar.py --mode=test --arch=resnet20 --test-batch-size=1000 --num_monte_carlo=50 "$@"
