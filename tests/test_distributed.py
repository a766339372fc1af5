"""parallel.initialize: single-process no-op behavior."""


def test_initialize_single_process():
    from bayesian_torch_tpu.parallel import initialize
    n = initialize()
    assert n >= 1
