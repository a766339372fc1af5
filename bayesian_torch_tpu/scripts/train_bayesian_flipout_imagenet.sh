#!/bin/bash
python "$(dirname "$0")"/../examples/main_bayesian_flipout_imagenet.py --mode=train --arch=resnet50 --batch-size=128 --lr=0.001 "$@"
