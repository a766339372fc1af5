"""Bayesian ResNet-20 on CIFAR-10 (flipout).

Counterpart of reference examples/main_bayesian_flipout_cifar.py; shares
the trainer with main_bayesian_cifar.
"""

from bayesian_torch_tpu.examples.main_bayesian_cifar import (build_parser,
                                                             run)


def main(argv=None):
    run(build_parser("Bayesian Flipout CIFAR10").parse_args(argv),
        "Flipout")


if __name__ == "__main__":
    main()
