"""Config tree parses (parity with the reference's test_setup.py:123-150
config checks), package imports, and profiling utils."""

from pathlib import Path

import pytest

pytestmark = pytest.mark.smoke

ROOT = Path(__file__).resolve().parent.parent


def test_config_yamls_exist_and_parse():
    files = [
        ROOT / "configs/model_configs/whisper.yaml",
        ROOT / "configs/model_configs/owsm.yaml",
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
    import sar_tpu.ops.attic.attention
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


def test_decoder_light_variants_registered():
    """turbo/distil registry entries: large-v3 encoder + shallow decoder."""
    from sar_tpu.models.config import HF_MODEL_IDS, get_config
    turbo = get_config("whisper-large-turbo")
    distil = get_config("distil-large-v3")
    for cfg, dec in ((turbo, 4), (distil, 2)):
        assert cfg.encoder_layers == 32 and cfg.decoder_layers == dec
        assert cfg.num_mel_bins == 128 and cfg.vocab_size == 51866
        assert cfg.prompt_ids("hindi")[-1] == cfg.no_timestamps_token_id
    assert HF_MODEL_IDS["whisper-large-turbo"].endswith("large-v3-turbo")


def test_asymmetric_depth_forward_and_decode():
    """Nothing may assume encoder_layers == decoder_layers (the turbo/distil
    shape): forward + compiled greedy decode on a 3-enc/1-dec miniature."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sar_tpu.decode import greedy_decode
    from sar_tpu.models import whisper
    from sar_tpu.models.config import get_config
    cfg = dataclasses.replace(get_config("whisper-test"),
                              encoder_layers=3, decoder_layers=1)
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, cfg.num_mel_bins, 64)), jnp.float32)
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("english"), jnp.int32)
    toks = np.asarray(greedy_decode(params, enc, cfg, prompt,
                                    max_new_tokens=6, cross_kv_int8=True,
                                    self_kv_int8=True))
    assert toks.shape[0] == 2
    logits = whisper.decode_train(params, enc, jnp.asarray(toks), cfg)
    assert logits.shape[-1] == cfg.vocab_size
