"""Minimal prepare -> calibrate -> convert smoke snippet.

Counterpart of reference examples/quantization_test.py:16-33.
"""

import jax.numpy as jnp
import numpy as np
from flax import nnx

from bayesian_torch_tpu.models.bayesian.simple_cnn_variational import SCNN
from bayesian_torch_tpu.quantization import convert, prepare
from bayesian_torch_tpu.layers.base_variational_layer import make_rngs


def main():
    model = SCNN(rngs=make_rngs(0, noise_seed=1))
    model.eval()
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 1, 28, 28).astype(np.float32))

    prepare(model)
    model(x)  # one random calibration input
    convert(model)

    out, kl = model(x)
    print("quantized forward:", out.shape, "kl:", kl)
    print("layer types:", type(model.conv1).__name__,
          type(model.fc2).__name__)


if __name__ == "__main__":
    main()
