#!/bin/bash
python "$(dirname "$0")"/../examples/main_bayesian_flipout_cifar.py --mode=train --arch=resnet20 --lr=0.001 --batch-size=128 "$@"
