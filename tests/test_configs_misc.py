"""Config tree parses (parity with the reference's test_setup.py:123-150
config checks), package imports, and profiling utils."""

from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_config_yamls_exist_and_parse():
    files = [
        ROOT / "configs/model_configs/whisper.yaml",
        ROOT / "configs/lora_configs/default.yaml",
        ROOT / "configs/training_configs/default.yaml",
        ROOT / "configs/dataset_configs/default.yaml",
        ROOT / "configs/router_config.yaml",
    ]
    import yaml
    for f in files:
        assert f.exists(), f
        data = yaml.safe_load(f.read_text())
        assert isinstance(data, dict) and data


def test_config_yaml_matches_live_defaults():
    import yaml
    from sar_tpu.models.lora import LoraConfig
    from sar_tpu.training.trainer import TrainingArgs
    lora_doc = yaml.safe_load(
        (ROOT / "configs/lora_configs/default.yaml").read_text())["lora"]
    lcfg = LoraConfig()
    assert lora_doc["rank"] == lcfg.r
    assert lora_doc["alpha"] == lcfg.alpha
    assert lora_doc["dropout"] == lcfg.dropout
    train_doc = yaml.safe_load(
        (ROOT / "configs/training_configs/default.yaml").read_text())["training"]
    targs = TrainingArgs()
    assert train_doc["learning_rate"] == targs.learning_rate
    assert train_doc["max_steps"] == targs.max_steps
    assert train_doc["scheduler"] == targs.scheduler


def test_all_package_imports():
    """Parity with the reference's import smoke test (test_setup.py:10-42)."""
    import sar_tpu
    import sar_tpu.data.collate
    import sar_tpu.data.datasets
    import sar_tpu.data.loader
    import sar_tpu.data.preprocessing
    import sar_tpu.data.synthetic
    import sar_tpu.data.tokenizer
    import sar_tpu.decode.beam
    import sar_tpu.decode.greedy
    import sar_tpu.evaluation.evaluator
    import sar_tpu.models.base
    import sar_tpu.models.classifier
    import sar_tpu.models.config
    import sar_tpu.models.convert
    import sar_tpu.models.lora
    import sar_tpu.models.router
    import sar_tpu.models.whisper
    import sar_tpu.ops.attention
    import sar_tpu.ops.mel
    import sar_tpu.parallel.sharding
    import sar_tpu.training.callbacks
    import sar_tpu.training.checkpoints
    import sar_tpu.training.lid_trainer
    import sar_tpu.training.metrics
    import sar_tpu.training.optim
    import sar_tpu.training.trainer
    import sar_tpu.utils.native
    import sar_tpu.utils.profiling
    assert sar_tpu.__version__


def test_profiling_benchmark_fn():
    import jax.numpy as jnp
    from sar_tpu.utils.profiling import benchmark_fn, rtfx
    stats = benchmark_fn(lambda x: x * 2, jnp.ones((8, 8)), iters=2)
    assert stats["per_iter_s"] > 0
    assert rtfx(lambda x: x, jnp.ones(4), audio_seconds=10.0, iters=1) > 0


def test_scripts_importable():
    import sys
    sys.path.insert(0, str(ROOT / "scripts"))
    import download_datasets
    import evaluate_model
    import route_infer
    import train_lora
    import train_router
    for mod in (train_lora, evaluate_model, train_router, route_infer,
                download_datasets):
        assert hasattr(mod, "main") and hasattr(mod, "parse_args")


def test_job_scripts_syntax():
    """Grid scripts (jobs/*.sh) must at least parse (bash -n)."""
    import subprocess
    scripts = sorted((ROOT / "jobs").glob("*.sh"))
    assert len(scripts) == 9
    for s in scripts:
        subprocess.run(["bash", "-n", str(s)], check=True)
