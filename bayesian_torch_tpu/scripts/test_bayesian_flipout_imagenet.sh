#!/bin/bash
python "$(dirname "$0")"/../examples/main_bayesian_flipout_imagenet.py --mode=test --arch=resnet50 --num_monte_carlo=10 "$@"
