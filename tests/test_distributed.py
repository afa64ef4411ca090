"""Multi-slice / multi-host (DCN) layer: 3-axis replica x data x model mesh
on the virtual 8-CPU backend, CLI flag plumbing, and the per-host batch
assembly path. The reference has no distributed execution at all (SLURM
array of independent jobs, SURVEY.md §2.14); this is the TPU-native
scale-out design: "replica" rides DCN, "data"/"model" ride ICI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sar_tpu.models import lora as lora_lib
from sar_tpu.models import whisper
from sar_tpu.models.config import get_config
from sar_tpu.parallel import distributed as dist
from sar_tpu.parallel.sharding import (make_mesh, mesh_from_flags,
                                       shard_batch, shard_lora, shard_params)


@pytest.fixture(scope="module")
def world(eight_devices):
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_multislice_mesh_axes(eight_devices):
    mesh = dist.make_multislice_mesh(dp=2, tp=2, replicas=2)
    assert mesh.axis_names == ("replica", "data", "model")
    assert dict(mesh.shape) == {"replica": 2, "data": 2, "model": 2}
    assert dist.batch_axis_names(mesh) == ("replica", "data")
    assert dist.n_batch_shards(mesh) == 4


def test_multislice_mesh_infers_replicas(eight_devices):
    mesh = dist.make_multislice_mesh(dp=2, tp=2)
    assert dict(mesh.shape) == {"replica": 2, "data": 2, "model": 2}
    with pytest.raises(ValueError):
        dist.make_multislice_mesh(dp=8, tp=2, replicas=1)


def test_mesh_from_flags_dcn(eight_devices):
    mesh = mesh_from_flags(2, 2, dcn_dp=2)
    assert mesh.axis_names == ("replica", "data", "model")
    # 2-axis path unchanged when dcn_dp == 1.
    assert mesh_from_flags(2, 2).axis_names == ("data", "model")
    assert mesh_from_flags(1, 1) is None


def test_maybe_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert dist.maybe_initialize_distributed() is False


def test_maybe_initialize_ignores_warning_hostnames(monkeypatch):
    # The axon tunnel leaves a literal warning string in the env var; it
    # must not be mistaken for a worker list.
    monkeypatch.setenv(
        "TPU_WORKER_HOSTNAMES",
        "WARNING: could not determine TPU worker hostnames or IP addresses")
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    assert dist.maybe_initialize_distributed() is False


def test_put_global_batch_single_process(eight_devices):
    mesh = dist.make_multislice_mesh(dp=2, tp=2, replicas=2)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    y = dist.put_global_batch(x, mesh)
    assert y.sharding.spec == P(("replica", "data"), None)
    np.testing.assert_array_equal(np.asarray(y), x)
    assert dist.local_batch_size(32) == 32
    with pytest.raises(ValueError):
        dist.make_multislice_mesh(dp=4, tp=4, replicas=2)


def test_forward_parity_on_multislice_mesh(world, rng):
    """replica x data x model sharded forward == single device."""
    cfg, params = world
    mesh = dist.make_multislice_mesh(dp=2, tp=2, replicas=2)
    sharded = shard_params(params, mesh)
    mel = jnp.asarray(rng.standard_normal((8, cfg.num_mel_bins, 64)),
                      jnp.float32)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 6)), jnp.int32)

    single = whisper.forward(params, mel, tokens, cfg)
    batch = shard_batch({"mel": mel, "tokens": tokens}, mesh)
    multi = jax.jit(lambda p, m, t: whisper.forward(p, m, t, cfg))(
        sharded, batch["mel"], batch["tokens"])
    np.testing.assert_allclose(np.asarray(single), np.asarray(multi),
                               atol=2e-4)


def test_trainer_on_multislice_mesh_matches_single_device(world):
    """ASRTrainer on the 3-axis mesh (train_lora.py --dcn_dp 2 --dp 2 --tp 2)
    reproduces the single-device loss trajectory — the hierarchical DCN+ICI
    gradient all-reduce is numerically the same reduction."""
    from sar_tpu.data.collate import create_collator
    from sar_tpu.data.loader import DataLoader
    from sar_tpu.data.synthetic import SyntheticASRDataset
    from sar_tpu.data.tokenizer import CharTokenizer
    from sar_tpu.training import ASRTrainer, TrainingArgs

    cfg, params = world
    tok = CharTokenizer(cfg)
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, dropout=0.0)
    args = TrainingArgs(learning_rate=3e-3, warmup_steps=1, max_steps=2,
                        eval_steps=0, gradient_accumulation_steps=2,
                        mixed_precision="no", gradient_checkpointing=False,
                        seed=0)
    coll = create_collator(cfg.sot_token_id, pad_to_length=16)

    def run(mesh):
        ds = SyntheticASRDataset(cfg, size=16, num_words=2, seed=5)
        loader = DataLoader(ds, batch_size=4, collator=coll, seed=7)
        bank = lora_lib.init_lora(jax.random.PRNGKey(11), cfg, lcfg)
        t = ASRTrainer(cfg, params, bank, lcfg, args, tokenizer=tok,
                       language="english", mesh=mesh)
        return t.train(loader)["loss"]

    loss_single = run(None)
    loss_mesh = run(dist.make_multislice_mesh(dp=2, tp=2, replicas=2))
    np.testing.assert_allclose(loss_single, loss_mesh, atol=2e-4)


def test_evaluator_on_multislice_mesh(world):
    from sar_tpu.data.tokenizer import CharTokenizer
    from sar_tpu.evaluation.evaluator import ASREvaluator

    cfg, params = world
    tok = CharTokenizer(cfg)
    rng = np.random.default_rng(3)
    # 6 rows: not a multiple of the 4 batch shards (exercises padding).
    mel = jnp.asarray(rng.standard_normal((6, cfg.num_mel_bins, 64)),
                      jnp.float32)

    def preds(mesh):
        ev = ASREvaluator(cfg, params, tok, language="english",
                          max_new_tokens=8, kv_int8=False, mesh=mesh)
        return ev._transcribe_batch(mel)

    assert preds(None) == preds(dist.make_multislice_mesh(dp=2, tp=2,
                                                          replicas=2))
