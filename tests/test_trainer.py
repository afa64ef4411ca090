"""End-to-end LoRA training on synthetic data: loss must drop, WER must
improve, checkpoints must round-trip. Mirrors the reference's training
semantics (/root/reference/src/training/trainer.py) at toy scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.data.collate import create_collator
from sar_tpu.data.loader import DataLoader
from sar_tpu.data.synthetic import SyntheticASRDataset
from sar_tpu.data.tokenizer import CharTokenizer
from sar_tpu.models import lora as lora_lib
from sar_tpu.models import whisper
from sar_tpu.models.config import get_config
from sar_tpu.training import (ASRTrainer, CheckpointCallback,
                              EarlyStoppingCallback, TensorBoardCallback,
                              TrainingArgs, WandbCallback)
from sar_tpu.training.optim import make_schedule


@pytest.fixture(scope="module")
def world():
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    tok = CharTokenizer(cfg)
    train_ds = SyntheticASRDataset(cfg, size=32, num_words=2, seed=0)
    eval_ds = SyntheticASRDataset(cfg, size=8, num_words=2, seed=99)
    coll = create_collator(cfg.sot_token_id, pad_to_length=24)
    train_loader = DataLoader(train_ds, batch_size=4, collator=coll, seed=1)
    eval_loader = DataLoader(eval_ds, batch_size=4, collator=coll,
                             shuffle=False, drop_last=False)
    return cfg, params, tok, train_loader, eval_loader


def _args(**kw):
    base = dict(learning_rate=3e-3, warmup_steps=2, max_steps=30, eval_steps=15,
                gradient_accumulation_steps=2, mixed_precision="no",
                max_new_tokens=16, gradient_checkpointing=False, seed=0)
    base.update(kw)
    return TrainingArgs(**base)


def test_training_reduces_loss_and_wer(world, tmp_path):
    cfg, params, tok, train_loader, eval_loader = world
    lcfg = lora_lib.LoraConfig(r=8, alpha=16, dropout=0.0)
    bank = lora_lib.init_lora(jax.random.PRNGKey(1), cfg, lcfg)
    ckpt_cb = CheckpointCallback(tmp_path / "out", save_steps=15,
                                 save_total_limit=1)
    trainer = ASRTrainer(cfg, params, bank, lcfg, _args(), tokenizer=tok,
                         language="english", callbacks=[ckpt_cb])
    history = trainer.train(train_loader, eval_loader)

    first, last = history["loss"][0], np.mean(history["loss"][-5:])
    assert last < first, f"loss did not drop: {first} -> {last}"
    # Initial eval at step 0 must have run (reference trainer.py:218-223).
    assert history["eval"][0]["step"] == 0
    assert len(history["eval"]) >= 2
    # Best checkpoint exists.
    assert (tmp_path / "out" / "best" / "adapter" / "adapter_params.npz").exists()


def test_checkpoint_roundtrip(world, tmp_path):
    cfg, params, tok, train_loader, eval_loader = world
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, dropout=0.0)
    bank = lora_lib.init_lora(jax.random.PRNGKey(2), cfg, lcfg)
    t1 = ASRTrainer(cfg, params, bank, lcfg, _args(max_steps=4, eval_steps=0),
                    tokenizer=tok, language="english")
    t1.train(train_loader)
    t1.save_checkpoint(tmp_path / "ck")

    bank2 = lora_lib.init_lora(jax.random.PRNGKey(3), cfg, lcfg)
    t2 = ASRTrainer(cfg, params, bank2, lcfg, _args(max_steps=4, eval_steps=0),
                    tokenizer=tok, language="english")
    t2.load_checkpoint(tmp_path / "ck")
    assert t2.global_step == 4
    for a, b in zip(jax.tree.leaves(t1.lora), jax.tree.leaves(t2.lora)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Optimizer state restored too (unlike the reference quirk,
    # trainer.py:477-489).
    for a, b in zip(jax.tree.leaves(t1.opt_state), jax.tree.leaves(t2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_stopping_fires():
    cb = EarlyStoppingCallback(patience=2, min_delta=0.01)

    class T: global_step = 0
    cb.on_evaluate_end(T, {"wer": 1.0})
    cb.on_evaluate_end(T, {"wer": 1.0})
    assert not cb.should_stop
    cb.on_evaluate_end(T, {"wer": 1.0})
    assert cb.should_stop


def test_schedules():
    for kind in ("linear", "cosine", "constant"):
        s = make_schedule(kind, 1e-3, warmup_steps=10, max_steps=100)
        assert float(s(0)) < 1e-6
        np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-5)
        if kind == "constant":
            np.testing.assert_allclose(float(s(99)), 1e-3, rtol=1e-5)
        else:
            assert float(s(99)) < 1e-3


def test_mixed_precision_bf16(world):
    cfg, params, tok, train_loader, _ = world
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, dropout=0.1)
    bank = lora_lib.init_lora(jax.random.PRNGKey(4), cfg, lcfg)
    t = ASRTrainer(cfg, params, bank, lcfg,
                   _args(max_steps=2, eval_steps=0, mixed_precision="bf16"),
                   tokenizer=tok, language="english")
    assert t.base_params["encoder"]["conv1"]["w"].dtype == jnp.bfloat16
    # LayerNorm params stay fp32.
    assert t.base_params["encoder"]["ln"]["scale"].dtype == jnp.float32
    # LoRA master weights stay fp32.
    assert jax.tree.leaves(t.lora)[0].dtype == jnp.float32
    hist = t.train(train_loader)
    assert np.isfinite(hist["loss"]).all()


def test_checkpoint_callback_rolling_limit(tmp_path):
    """Periodic checkpoints beyond save_total_limit are pruned; best is kept
    (parity with callbacks.py:123-218)."""

    class FakeTrainer:
        best_metric = None
        global_step = 0

        def save_checkpoint(self, path):
            from pathlib import Path
            Path(path).mkdir(parents=True, exist_ok=True)
            (Path(path) / "marker").write_text("x")

    t = FakeTrainer()
    cb = CheckpointCallback(tmp_path, save_steps=1, save_total_limit=2)
    for step in (1, 2, 3, 4):
        cb.on_step_end(t, step, {})
    kept = sorted(p.name for p in tmp_path.glob("step_*"))
    assert kept == ["step_3", "step_4"]
    cb.on_evaluate_end(t, {"wer": 0.5})
    cb.on_evaluate_end(t, {"wer": 0.9})   # worse: best not overwritten... still exists
    assert (tmp_path / "best" / "marker").exists()
    assert cb.best_value == 0.5


def test_wandb_tensorboard_noop(tmp_path, monkeypatch):
    """Missing wandb/tensorboard degrade to no-ops."""
    import builtins

    class T: global_step = 1
    w = WandbCallback()   # wandb genuinely absent in this image
    w.on_train_begin(T)
    w.on_step_end(T, 1, {"loss": 1.0})
    w.on_evaluate_end(T, {"wer": 1.0})
    w.on_train_end(T)

    # Force the tensorboard import to fail to exercise the no-op branch.
    real_import = builtins.__import__

    def broken(name, *a, **kw):
        if name.startswith("torch.utils.tensorboard"):
            raise ImportError(name)
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", broken)
    tb = TensorBoardCallback(tmp_path / "tb")
    tb.on_train_begin(T)
    assert tb._writer is None
    tb.on_step_end(T, 1, {"loss": 1.0})
    tb.on_train_end(T)


def test_training_with_bucketing_collator(world):
    """pad_to_multiple collators yield variable label widths; the trainer
    must pad each accumulation group to its max instead of crashing."""
    cfg, params, tok, _, _ = world
    ds = SyntheticASRDataset(cfg, size=16, num_words=2, seed=3)
    coll = create_collator(cfg.sot_token_id, pad_to_multiple=4)
    loader = DataLoader(ds, batch_size=4, collator=coll, seed=2)
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, dropout=0.0)
    bank = lora_lib.init_lora(jax.random.PRNGKey(9), cfg, lcfg)
    t = ASRTrainer(cfg, params, bank, lcfg,
                   _args(max_steps=3, eval_steps=0), tokenizer=tok,
                   language="english")
    hist = t.train(loader)
    assert np.isfinite(hist["loss"]).all()
