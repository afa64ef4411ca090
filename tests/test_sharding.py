"""Multi-device sharding on the virtual 8-CPU mesh: TP/DP forward parity and
the full sharded training step (what the driver's dryrun_multichip validates)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sar_tpu.models import lora as lora_lib
from sar_tpu.models import whisper
from sar_tpu.models.config import get_config
from sar_tpu.parallel.sharding import (make_mesh, param_specs, shard_batch,
                                       shard_lora, shard_params)


@pytest.fixture(scope="module")
def world(eight_devices):
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_param_specs_structure(world):
    _, params = world
    specs = param_specs(params)
    # Structure must match exactly so tree.map pairs leaves with specs.
    assert jax.tree.structure(params) == jax.tree.structure(
        specs, is_leaf=lambda x: isinstance(x, P))


@pytest.mark.parametrize("n_model", [1, 2, 4])
def test_sharded_forward_matches_single_device(world, rng, n_model):
    cfg, params = world
    mesh = make_mesh(n_model=n_model)
    sharded = shard_params(params, mesh)
    mel = jnp.asarray(rng.standard_normal((8, cfg.num_mel_bins, 64)), jnp.float32)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 6)), jnp.int32)

    single = whisper.forward(params, mel, tokens, cfg)
    batch = shard_batch({"mel": mel, "tokens": tokens}, mesh)
    multi = jax.jit(lambda p, m, t: whisper.forward(p, m, t, cfg))(
        sharded, batch["mel"], batch["tokens"])
    np.testing.assert_allclose(np.asarray(single), np.asarray(multi),
                               atol=2e-4)


def test_sharded_train_step_runs_and_matches(world, rng):
    """DPxTP LoRA grad step == single-device grad step."""
    cfg, params = world
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, dropout=0.0)
    lora = lora_lib.init_lora(jax.random.PRNGKey(1), cfg, lcfg)
    mel = jnp.asarray(rng.standard_normal((8, cfg.num_mel_bins, 64)), jnp.float32)
    labels = jnp.asarray(rng.integers(10, 200, (8, 6)), jnp.int32)

    def loss_fn(lora, params, mel, labels):
        dec_in = whisper.shift_tokens_right(labels, cfg.sot_token_id,
                                            cfg.pad_token_id)
        logits = whisper.forward(params, mel, dec_in, cfg, lora=lora,
                                 lora_scale=lcfg.scale)
        return whisper.cross_entropy_loss(logits, labels)

    g_single = jax.grad(loss_fn)(lora, params, mel, labels)

    mesh = make_mesh(n_model=2)
    sp = shard_params(params, mesh)
    sl = shard_lora(lora, mesh)
    batch = shard_batch({"mel": mel, "labels": labels}, mesh)
    g_multi = jax.jit(jax.grad(loss_fn))(sl, sp, batch["mel"], batch["labels"])

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_multi)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_sharded_greedy_decode_matches(world, rng):
    """TP+DP greedy decode == single-device decode (the whisper-large
    ICI-sharded batch-inference path, BASELINE config #5, at toy scale)."""
    from sar_tpu.decode import greedy_decode
    cfg, params = world
    mel = jnp.asarray(rng.standard_normal((8, cfg.num_mel_bins, 64)), jnp.float32)
    prompt = jnp.asarray(cfg.prompt_ids("hindi"), jnp.int32)

    def run(p, m):
        enc = whisper.encode(p, m, cfg)
        return greedy_decode(p, enc, cfg, prompt, max_new_tokens=8)

    single = run(params, mel)
    mesh = make_mesh(n_model=2)
    sp = shard_params(params, mesh)
    sm = shard_batch({"mel": mel}, mesh)["mel"]
    multi = jax.jit(run)(sp, sm)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(multi))


def test_trainer_on_mesh_matches_single_device(world):
    """ASRTrainer(mesh=...) — the user-facing DPxTP path (train_lora.py
    --dp/--tp) — must reproduce the single-device loss trajectory."""
    from sar_tpu.data.collate import create_collator
    from sar_tpu.data.loader import DataLoader
    from sar_tpu.data.synthetic import SyntheticASRDataset
    from sar_tpu.data.tokenizer import CharTokenizer
    from sar_tpu.models import lora as lora_lib
    from sar_tpu.training import ASRTrainer, TrainingArgs

    cfg, params = world
    tok = CharTokenizer(cfg)
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, dropout=0.0)
    args = TrainingArgs(learning_rate=3e-3, warmup_steps=1, max_steps=3,
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
        return t.train(loader)["loss"], t.lora

    loss_single, lora_single = run(None)
    loss_mesh, lora_mesh = run(make_mesh(n_model=2))
    np.testing.assert_allclose(loss_single, loss_mesh, atol=2e-4)
    for a, b in zip(jax.tree.leaves(lora_single), jax.tree.leaves(lora_mesh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_evaluator_on_mesh_matches_single_device(world):
    """ASREvaluator(mesh=...) — evaluate_model.py --dp/--tp — must produce
    identical transcriptions, including on a partial (padded) batch."""
    from sar_tpu.data.tokenizer import CharTokenizer
    from sar_tpu.evaluation.evaluator import ASREvaluator

    cfg, params = world
    tok = CharTokenizer(cfg)
    rng = np.random.default_rng(3)
    # 6 rows: not a multiple of the 4-way data axis (exercises padding).
    mel = jnp.asarray(rng.standard_normal((6, cfg.num_mel_bins, 64)),
                      jnp.float32)

    def preds(mesh):
        ev = ASREvaluator(cfg, params, tok, language="english",
                          max_new_tokens=8, kv_int8=False, mesh=mesh)
        return ev._transcribe_batch(mel)

    assert preds(None) == preds(make_mesh(n_model=2))


def test_dryrun_multichip_entrypoint(eight_devices):
    """The driver's multi-chip validation path must run end to end."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def _run_driver_like_subprocess(code: str) -> None:
    """Run `code` in a fresh interpreter with NO conftest help: XLA_FLAGS
    stripped, whatever platform the environment pins left in place — exactly
    the environment the driver's MULTICHIP check runs in."""
    import os
    import subprocess
    import sys
    repo = str(Path(__file__).resolve().parent.parent)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (
        f"subprocess failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
    assert "dryrun routed decode OK" in proc.stdout


def test_dryrun_multichip_self_initializes():
    """dryrun_multichip(8) must pass when called before jax is imported, with
    no XLA_FLAGS set (round-1 MULTICHIP failure mode)."""
    _run_driver_like_subprocess(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)")


def test_dryrun_multichip_after_backend_init():
    """dryrun_multichip(8) must pass even when the caller already initialized
    a too-small jax backend (falls back to a fresh subprocess)."""
    _run_driver_like_subprocess(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) < 8\n"
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)")


def test_entry_traces(world):
    """entry() must produce a jittable fn (trace only — whisper-small compile
    is exercised by the driver on real hardware)."""
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    jax.eval_shape(fn, *args)


def test_lid_trainer_on_mesh_matches_single_device(world):
    """LIDTrainer(mesh=...) — train_router.py --dp/--tp — must reproduce the
    single-device loss trajectory and final accuracy (the LID step is
    dominated by the frozen encoder forward, sharded like ASRTrainer)."""
    from sar_tpu.data.collate import LIDCollator
    from sar_tpu.data.loader import DataLoader
    from sar_tpu.data.synthetic import SyntheticASRDataset
    from sar_tpu.models import classifier as clf
    from sar_tpu.training.lid_trainer import (LIDDataset, LIDTrainer,
                                              LIDTrainingArgs)

    cfg, params = world
    langs = ["english", "german"]
    ccfg = clf.ClassifierConfig(input_dim=cfg.d_model, hidden_dims=(32,),
                                num_classes=2, dropout=0.0, languages=langs)
    args = LIDTrainingArgs(learning_rate=5e-3, weight_decay=0.0,
                           warmup_steps=2, max_steps=4, eval_steps=4,
                           scheduler="constant", mixed_precision="no",
                           gradient_accumulation_steps=2)

    def run(mesh):
        datasets = {l: SyntheticASRDataset(cfg, size=12, language=l,
                                           language_id=i, seed=i)
                    for i, l in enumerate(langs)}
        ds = LIDDataset(datasets, langs)
        loader = DataLoader(ds, batch_size=4, collator=LIDCollator(), seed=3)
        # drop_last=False -> the final batch is PARTIAL, exercising the
        # mesh padding path in evaluate().
        eval_loader = DataLoader(ds, batch_size=9, collator=LIDCollator(),
                                 shuffle=False, drop_last=False)
        p = clf.init_classifier(jax.random.PRNGKey(5), ccfg)
        t = LIDTrainer(cfg, params, p, ccfg, args, mesh=mesh)
        hist = t.train(loader, eval_loader)
        return hist["loss"], hist["eval"][-1]

    loss_single, eval_single = run(None)
    loss_mesh, eval_mesh = run(make_mesh(n_data=4, n_model=2))
    np.testing.assert_allclose(loss_single, loss_mesh, atol=2e-4)
    assert eval_single["accuracy"] == eval_mesh["accuracy"]
    assert eval_single["confusion_matrix"] == eval_mesh["confusion_matrix"]
    assert eval_single["num_samples"] == eval_mesh["num_samples"] == 24
