"""Round-4 hygiene regressions (VERDICT r03 weak items 1-4 and 7):

- batch_transcribe compiles ONCE across calls (module-level jit cache);
- threshold routing is fully traced (no host sync) when labels are given;
- encode_features(layer_index>=0) runs only the tapped prefix of layers
  with a single [B, T, D] carry (no [L, B, T, D] stack);
- trainer.evaluate pads ragged final batches OFF-mesh too (one compile);
- W&B / TensorBoard callbacks log the reference's key schema, pinned via
  fake modules (neither library is installed in this image).
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.data.collate import create_collator
from sar_tpu.data.loader import DataLoader
from sar_tpu.data.synthetic import SyntheticASRDataset
from sar_tpu.data.tokenizer import CharTokenizer
from sar_tpu.models import classifier as clf
from sar_tpu.models import lora as lora_lib
from sar_tpu.models import whisper
from sar_tpu.models.config import get_config
from sar_tpu.models.router import AdapterRouter
from sar_tpu.training import ASRTrainer, TrainingArgs
from sar_tpu.training.callbacks import TensorBoardCallback, WandbCallback

LANGS = ["english", "german"]


@pytest.fixture(scope="module")
def world():
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


# ---------------------------------------------------------------------------
# weak #1: batch_transcribe / transcribe_audio must not recompile per call
# ---------------------------------------------------------------------------

def test_batch_transcribe_compiles_once(world, rng):
    from sar_tpu.evaluation.evaluator import _transcribe_step, batch_transcribe
    cfg, params = world
    tok = CharTokenizer(cfg)
    clips = [rng.standard_normal(16000).astype(np.float32) * 0.05
             for _ in range(3)]
    before = _transcribe_step._cache_size()
    a = batch_transcribe(clips, cfg, params, tok, language="english",
                         batch_size=2, max_new_tokens=8)
    mid = _transcribe_step._cache_size()
    b = batch_transcribe(clips, cfg, params, tok, language="english",
                         batch_size=2, max_new_tokens=8)
    after = _transcribe_step._cache_size()
    # Two batch chunks in call 1 + a whole second call: ONE new entry total.
    assert mid - before == 1
    assert after == mid
    assert a == b


# ---------------------------------------------------------------------------
# weak #2: threshold routing with labels is a traced lax.cond
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def router_world(world):
    cfg, params = world
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, dropout=0.0)
    banks = []
    for seed in (1, 3):
        b = lora_lib.init_lora(jax.random.PRNGKey(seed), cfg, lcfg)
        leaves, td = jax.tree.flatten(b)
        keys = jax.random.split(jax.random.PRNGKey(seed + 10), len(leaves))
        banks.append(jax.tree.unflatten(
            td, [jax.random.normal(k, l.shape) * 0.05
                 for k, l in zip(keys, leaves)]))
    bank = lora_lib.stack_adapters(banks)
    ccfg = clf.ClassifierConfig(input_dim=cfg.d_model, hidden_dims=(32,),
                                num_classes=2, dropout=0.0, languages=LANGS)
    clf_params = clf.init_classifier(jax.random.PRNGKey(5), ccfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 64)),
                      jnp.float32)
    labels = jnp.asarray(rng.integers(10, 100, (2, 6)), jnp.int32)
    return cfg, params, bank, lcfg, clf_params, ccfg, mel, labels


@pytest.mark.parametrize("threshold,expect_branch", [(-1.0, "hard"),
                                                     (1.1, "soft")])
def test_threshold_routing_is_traceable(router_world, threshold,
                                        expect_branch):
    cfg, params, bank, lcfg, clf_params, ccfg, mel, labels = router_world
    router = AdapterRouter(cfg, params, bank, lcfg, clf_params, ccfg,
                           strategy="threshold", threshold=threshold)
    # Under jit the old bool(jnp.all(...)) raised TracerBoolConversionError;
    # the traced cond must run and match the branch the threshold selects.
    thr = jax.jit(lambda m, l: router.forward(m, l))(mel, labels)
    want = router.forward(mel, labels, strategy=expect_branch)
    np.testing.assert_allclose(np.asarray(thr["loss"]),
                               np.asarray(want["loss"]), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(thr["logits"]),
                               np.asarray(want["logits"]),
                               rtol=2e-4, atol=2e-5)
    assert bool(thr["confident"]) == (expect_branch == "hard")
    assert thr["adapter_idx"].shape == (2,)


# ---------------------------------------------------------------------------
# weak #3: layer-tap feature extraction — prefix scan, single carry
# ---------------------------------------------------------------------------

def test_encode_features_layer_tap_matches_full_stack(world, rng):
    cfg, params = world
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 64)),
                      jnp.float32)
    L = jax.tree.leaves(params["encoder"]["layers"])[0].shape[0]
    assert L >= 2

    # Reference semantics: output of encoder layer k, pre-final-LN. Build
    # the expected value by running the full encoder WITH the final LN off
    # is not exposed; instead check consistency: tap at L-1 equals tap at
    # -1-equivalent depth via the prefix property, and tap at 0 differs.
    tap0 = clf.encode_features(params, mel, cfg, layer_index=0)
    tap_last = clf.encode_features(params, mel, cfg, layer_index=L - 1)
    tap_neg = clf.encode_features(params, mel, cfg, layer_index=-1 - 0)  # -1 -> post-LN path
    assert tap0.shape == (2, 32, cfg.d_model)
    assert tap_last.shape == tap0.shape
    # Negative indices other than -1 normalize against L.
    tap_neg2 = clf.encode_features(params, mel, cfg, layer_index=-L)
    np.testing.assert_allclose(np.asarray(tap_neg2), np.asarray(tap0),
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(tap0), np.asarray(tap_last))
    # -1 is the documented post-LN final output (different from layer L-1).
    assert tap_neg.shape == tap0.shape

    with pytest.raises(ValueError):
        clf.encode_features(params, mel, cfg, layer_index=L)

    # The jaxpr must not materialize an [L, B, T, D] stacked output.
    jaxpr = jax.make_jaxpr(
        lambda m: clf.encode_features(params, m, cfg, layer_index=0))(mel)
    stacked_shape = (L, 2, 32, cfg.d_model)
    assert all(getattr(v.aval, "shape", None) != stacked_shape
               for eqn in jaxpr.jaxpr.eqns for v in eqn.outvars)


# ---------------------------------------------------------------------------
# weak #4: ragged final eval batch must not retrace off-mesh
# ---------------------------------------------------------------------------

def test_eval_ragged_batch_single_compile(world):
    cfg, params = world
    tok = CharTokenizer(cfg)
    # 6 samples / batch 4 with drop_last=False -> batches of 4 and 2.
    eval_ds = SyntheticASRDataset(cfg, size=6, num_words=2, seed=7)
    coll = create_collator(cfg.sot_token_id, pad_to_length=24)
    eval_loader = DataLoader(eval_ds, batch_size=4, collator=coll,
                             shuffle=False, drop_last=False)
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, dropout=0.0)
    bank = lora_lib.init_lora(jax.random.PRNGKey(1), cfg, lcfg)
    args = TrainingArgs(learning_rate=1e-3, warmup_steps=1, max_steps=2,
                        eval_steps=0, mixed_precision="no", max_new_tokens=8,
                        gradient_checkpointing=False, seed=0)
    trainer = ASRTrainer(cfg, params, bank, lcfg, args, tokenizer=tok,
                         language="english")
    metrics = trainer.evaluate(eval_loader)
    assert metrics["num_samples"] == 6
    assert trainer._eval_step._cache_size() == 1


# ---------------------------------------------------------------------------
# weak #7: W&B / TensorBoard logging schema, pinned via fake modules
# ---------------------------------------------------------------------------

class _Trainer:
    global_step = 120


def test_wandb_callback_schema(monkeypatch):
    records = []

    class _Run:
        def log(self, payload, step=None):
            records.append((dict(payload), step))

        def finish(self):
            records.append(("finish", None))

    fake = types.ModuleType("wandb")
    init_kwargs = {}

    def _init(**kw):
        init_kwargs.update(kw)
        return _Run()

    fake.init = _init
    monkeypatch.setitem(sys.modules, "wandb", fake)

    cb = WandbCallback(project="p", name="n", config={"lr": 1}, log_every=50)
    tr = _Trainer()
    cb.on_train_begin(tr)
    assert init_kwargs == {"project": "p", "name": "n", "config": {"lr": 1},
                           "resume": "allow"}
    cb.on_step_end(tr, 50, {"loss": 1.5, "learning_rate": 1e-4})
    cb.on_step_end(tr, 51, {"loss": 1.4, "learning_rate": 1e-4})  # skipped
    cb.on_evaluate_end(tr, {"wer": 0.5, "eval_loss": 2.0})
    cb.on_train_end(tr)

    # Reference schema (callbacks.py:49-120): train/loss,
    # train/learning_rate at the step; eval/* at trainer.global_step.
    assert records[0] == ({"train/loss": 1.5, "train/learning_rate": 1e-4},
                          50)
    assert records[1] == ({"eval/wer": 0.5, "eval/eval_loss": 2.0}, 120)
    assert records[2] == ("finish", None)


def test_tensorboard_callback_schema(monkeypatch, tmp_path):
    scalars = []

    class _Writer:
        def __init__(self, log_dir):
            scalars.append(("open", log_dir))

        def add_scalar(self, tag, value, step):
            scalars.append((tag, value, step))

        def close(self):
            scalars.append(("close",))

    fake = types.ModuleType("torch.utils.tensorboard")
    fake.SummaryWriter = _Writer
    monkeypatch.setitem(sys.modules, "torch.utils.tensorboard", fake)

    cb = TensorBoardCallback(tmp_path / "tb", log_every=10)
    tr = _Trainer()
    cb.on_train_begin(tr)
    cb.on_step_end(tr, 10, {"loss": 1.0, "learning_rate": 2e-4})
    cb.on_evaluate_end(tr, {"wer": 0.4, "predictions": ["x"]})
    cb.on_train_end(tr)

    tags = [s[0] for s in scalars]
    assert tags == ["open", "train/loss", "train/learning_rate", "eval/wer",
                    "close"]
    assert scalars[1] == ("train/loss", 1.0, 10)
    assert scalars[3] == ("eval/wer", 0.4, 120)  # non-numeric keys dropped
