#!/bin/bash
python "$(dirname "$0")"/../examples/main_deterministic_mnist.py --mode=train --batch-size=64 --lr=1.0 "$@"
