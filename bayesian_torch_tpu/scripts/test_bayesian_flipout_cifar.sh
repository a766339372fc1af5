#!/bin/bash
python "$(dirname "$0")"/../examples/main_bayesian_flipout_cifar.py --mode=test --arch=resnet20 --test-batch-size=1000 --num_monte_carlo=50 "$@"
