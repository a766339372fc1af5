#!/bin/bash
# Canonical INT8 ImageNet eval: resnet50, val bs=1, 1 MC sample.
python "$(dirname "$0")"/../examples/main_bayesian_imagenet_bnn2qbnn.py --arch=resnet50 --batch-size=1 --num_monte_carlo=1 "$@"
