"""Examples as system tests (synthetic data, tiny configs) — the
reference's scripts-as-tests strategy (SURVEY.md §4), automated."""

import os

import pytest


def test_bayesian_mnist_train_and_test(tmp_path):
    from bayesian_torch_tpu.examples.main_bayesian_mnist import main
    save = str(tmp_path / "ckpt")
    main(["--mode=train", "--epochs=1", "--synthetic", "--batch-size=64",
          "--test-batch-size=256", "--num_monte_carlo=3",
          f"--save_dir={save}"])
    main(["--mode=test", "--synthetic", "--test-batch-size=256",
          "--num_monte_carlo=3", f"--save_dir={save}"])
    assert os.path.exists(os.path.join(save, "probs_mnist_mc.npy"))


@pytest.mark.slow
def test_bayesian_cifar_train(tmp_path):
    from bayesian_torch_tpu.examples.main_bayesian_cifar import main
    main(["--mode=train", "--epochs=1", "--synthetic", "--batch-size=128",
          "--test-batch-size=256", "--num_monte_carlo=2",
          f"--save_dir={tmp_path}"])
    assert os.path.exists(
        os.path.join(tmp_path, "cifar_bayesian_metrics.json"))


@pytest.mark.slow
def test_bayesian_cifar_moped(tmp_path):
    from bayesian_torch_tpu.examples.main_bayesian_cifar import main
    main(["--mode=train", "--epochs=1", "--synthetic", "--moped",
          "--batch-size=128", "--test-batch-size=256",
          "--num_monte_carlo=2", f"--save_dir={tmp_path}"])


@pytest.mark.slow
def test_flipout_cifar_train(tmp_path):
    from bayesian_torch_tpu.examples.main_bayesian_flipout_cifar import main
    main(["--mode=train", "--epochs=1", "--synthetic", "--batch-size=128",
          "--test-batch-size=256", "--num_monte_carlo=2",
          f"--save_dir={tmp_path}"])


@pytest.mark.slow
def test_cifar_dnn2bnn_train_and_ptq(tmp_path):
    from bayesian_torch_tpu.examples.main_bayesian_cifar_dnn2bnn import main
    main(["--mode=train", "--epochs=1", "--synthetic", "--batch-size=128",
          "--test-batch-size=256", "--num_monte_carlo=2",
          f"--save_dir={tmp_path}"])
    main(["--mode=ptq", "--synthetic", "--batch-size=128",
          "--test-batch-size=256", "--num_monte_carlo=2",
          f"--save_dir={tmp_path}"])


def test_deterministic_mnist_train(tmp_path):
    from bayesian_torch_tpu.examples.main_deterministic_mnist import main
    main(["--mode=train", "--epochs=1", "--synthetic", "--batch-size=64",
          "--test-batch-size=256", f"--save_dir={tmp_path}"])


def test_quantization_test_snippet(capsys):
    from bayesian_torch_tpu.examples.quantization_test import main
    main()
    out = capsys.readouterr().out
    assert "QuantizedConv2dReparameterization" in out


@pytest.mark.slow
def test_bayesian_imagenet_smoke(tmp_path):
    from bayesian_torch_tpu.examples.main_bayesian_imagenet import main
    main(["--mode=train", "--epochs=1", "--synthetic", "--arch=resnet18",
          "--batch-size=16", "--num_monte_carlo=2", "--num-classes=10",
          f"--save_dir={tmp_path}"])


@pytest.mark.slow
def test_bayesian_mnist_converges(tmp_path, monkeypatch):
    """End-to-end learning check: 3 epochs on the synthetic blobs must
    reach high MC-predictive accuracy (regression test for the
    shared-prototype synthetic data)."""
    import json
    from bayesian_torch_tpu.examples.main_bayesian_mnist import main
    # conftest caps the synthetic set at 512 samples; 15 epochs gives
    # ~120 optimizer steps, matching the convergence point seen at
    # full size
    main(["--mode=train", "--epochs=15", "--synthetic", "--batch-size=64",
          "--test-batch-size=256", "--num_monte_carlo=5",
          f"--save_dir={tmp_path}"])
    with open(f"{tmp_path}/mnist_metrics.json") as f:
        metrics = json.load(f)
    assert metrics["accuracy"] > 0.7, metrics
