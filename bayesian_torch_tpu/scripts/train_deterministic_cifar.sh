#!/bin/bash
python "$(dirname "$0")"/../examples/main_deterministic_cifar.py --mode=train --arch=resnet20 --batch-size=128 --lr=0.1 "$@"
