#!/bin/bash
python "$(dirname "$0")"/../examples/main_deterministic_cifar.py --mode=test --arch=resnet20 --test-batch-size=1000 "$@"
