from bayesian_torch_tpu.data.loader import DataLoader  # noqa: F401
