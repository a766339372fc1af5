#!/bin/bash
python "$(dirname "$0")"/../examples/main_deterministic_mnist.py --mode=test --test-batch-size=10000 "$@"
