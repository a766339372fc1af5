"""Bayesian ResNet-50 on ImageNet (flipout).

Counterpart of reference examples/main_bayesian_flipout_imagenet.py;
shares the trainer with main_bayesian_imagenet.
"""

from bayesian_torch_tpu.examples.main_bayesian_imagenet import (
    build_parser,
    run,
)


def main(argv=None):
    run(build_parser("Bayesian Flipout ImageNet").parse_args(argv),
        "Flipout")


if __name__ == "__main__":
    main()
