#!/bin/bash
python "$(dirname "$0")"/../examples/main_deterministic_imagenet.py --mode=test --arch=resnet50 "$@"
