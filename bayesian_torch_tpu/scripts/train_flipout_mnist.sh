#!/bin/bash
# Flipout SCNN MNIST training (uses the flipout model zoo variant).
python - "$@" <<'PY'
import sys
from bayesian_torch_tpu.examples import main_bayesian_mnist as m
import bayesian_torch_tpu.models.flipout.simple_cnn as flip
m.SCNN = flip.SCNN
m.main(["--mode=train", "--batch-size=64", "--lr=1.0"] + sys.argv[1:])
PY
