#!/bin/bash
# Canonical CIFAR train config: resnet20, lr=0.001, bs=128.
python "$(dirname "$0")"/../examples/main_bayesian_cifar.py --mode=train --arch=resnet20 --lr=0.001 --batch-size=128 "$@"
