#!/bin/bash
# PTQ pipeline on CIFAR: prepare -> 100-sample calibration -> convert -> eval.
python "$(dirname "$0")"/../examples/main_bayesian_cifar_dnn2bnn.py --mode=ptq --arch=resnet20 "$@"
