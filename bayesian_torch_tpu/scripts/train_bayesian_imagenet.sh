#!/bin/bash
# Canonical ImageNet train config: resnet50, bs=128, lr=0.001, MOPED delta=0.5.
python "$(dirname "$0")"/../examples/main_bayesian_imagenet.py --mode=train --arch=resnet50 --batch-size=128 --lr=0.001 --moped --delta=0.5 "$@"
