"""Cross-framework end-to-end parity vs the reference's OWN installed
torch/PEFT pipeline.

These tests import the reference's actual `ASRTrainer`
(/root/reference/src/training/trainer.py:25-312) and `ASREvaluator`
(/root/reference/src/evaluation/__init__.py:44-114), drive them on a tiny
random HF Whisper + PEFT LoRA over shared synthetic data, and assert that
sar_tpu — on the converted weights and the imported PEFT adapter — matches:

  (a) the teacher-forced loss at init (through the reference's own
      `_training_step`),
  (b) the LoRA parameters after real AdamW optimizer steps (decay-masked
      param groups trainer.py:106-132, warmup start factor 1e-8 :134-197,
      gradient accumulation and clipping :251-277),
  (c) the full LR schedule trajectories (linear/cosine/constant),
  (d) the evaluator's predictions and WER/CER — decoded on BOTH sides by
      the same real word-level WhisperTokenizer (not the byte-level
      CharTokenizer), greedy and beam.

The reference's metrics module imports `evaluate` (not installed here); a
stub backed by sar_tpu's own corpus WER/CER is injected so BOTH frameworks
score predictions with the same metric function — the parity claim is about
the predictions; the metric is deliberately shared.
"""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sar_tpu.evaluation.evaluator import ASREvaluator
from sar_tpu.models import convert, whisper
from sar_tpu.models import lora as lora_lib
from sar_tpu.training import metrics as our_metrics
from sar_tpu.training.optim import make_schedule
from sar_tpu.training.trainer import ASRTrainer, TrainingArgs

from _hf_tiny import (SOT_TOKEN, make_tiny_model, peft_wrap,
                      randomize_peft_lora, synth_labels, synth_mels,
                      tiny_hf_config, train_word_tokenizer)

REF_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# Reference import with the `evaluate` stub.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref():
    stub = types.ModuleType("evaluate")

    class _Metric:
        def __init__(self, kind):
            self.fn = (our_metrics.compute_wer if kind == "wer"
                       else our_metrics.compute_cer)

        def compute(self, predictions, references):
            return self.fn(list(predictions), list(references))

    stub.load = lambda kind: _Metric(kind)
    prev = sys.modules.get("evaluate")
    sys.modules["evaluate"] = stub
    added_path = REF_ROOT not in sys.path
    if added_path:
        sys.path.insert(0, REF_ROOT)
    try:
        trainer_mod = importlib.import_module("src.training.trainer")
        eval_mod = importlib.import_module("src.evaluation")
        yield types.SimpleNamespace(ASRTrainer=trainer_mod.ASRTrainer,
                                    ASREvaluator=eval_mod.ASREvaluator)
    finally:
        if added_path and REF_ROOT in sys.path:
            sys.path.remove(REF_ROOT)
        if prev is not None:
            sys.modules["evaluate"] = prev


# ---------------------------------------------------------------------------
# Shared world: real word tokenizer + tiny HF/PEFT model + converted pytrees.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def word_tok(tmp_path_factory):
    return train_word_tokenizer(tmp_path_factory.mktemp("bpe"))


TEXTS = [
    "the quick brown fox",
    "hello world this is a test",
    "one two three four five",
    "speech adapter routing",
    "the lazy dog jumps",
    "six seven eight nine ten",
]


def _build_world(word_tok, seed=0, r=4, alpha=8, nonzero_lora=True):
    sot = word_tok.convert_tokens_to_ids(SOT_TOKEN)
    eos = word_tok.eos_token_id
    hf_cfg = tiny_hf_config(vocab_size=len(word_tok), eos=eos, sot=sot)
    model = make_tiny_model(hf_cfg, seed=seed)
    cfg = convert.config_from_hf(hf_cfg)
    params = jax.tree.map(jnp.asarray, convert.from_hf_model(model, cfg))
    pm = peft_wrap(model, r=r, alpha=alpha)
    if nonzero_lora:
        # PEFT inits B = 0; a zero delta makes grads w.r.t. A exactly zero
        # and AdamW's sign-like first step numerically ill-conditioned, so
        # the optimizer-parity tests start from a nonzero adapter.
        randomize_peft_lora(pm, seed=seed + 1, scale=0.05)
    bank = jax.tree.map(jnp.asarray, convert.lora_from_peft_state_dict(
        {k: v for k, v in pm.state_dict().items() if "lora_" in k}, cfg))
    lcfg = lora_lib.LoraConfig(r=r, alpha=alpha, dropout=0.0)
    return types.SimpleNamespace(hf_cfg=hf_cfg, cfg=cfg, params=params,
                                 pm=pm, bank=bank, lcfg=lcfg,
                                 sot=sot, eos=eos)


def _batches(word_tok, world, n_batches, batch_size, seed, width=32):
    """The SAME synthetic batches for both frameworks."""
    texts = [TEXTS[(seed + i) % len(TEXTS)]
             for i in range(n_batches * batch_size)]
    torch_batches, our_batches = [], []
    for bi in range(n_batches):
        chunk = texts[bi * batch_size:(bi + 1) * batch_size]
        mel = synth_mels(seed * 100 + bi, batch_size, world.hf_cfg)
        lab = synth_labels(chunk, word_tok, world.eos, width)
        torch_batches.append({
            "input_features": torch.from_numpy(mel),
            "labels": torch.from_numpy(lab),
        })
        # Reference refs are labels decoded (+ .strip()); feed ours the same
        # strings so both metric calls see identical references.
        ref_texts = [word_tok.decode(
            [t for t in row if t != -100], skip_special_tokens=True).strip()
            for row in lab]
        our_batches.append({
            "input_features": mel,
            "labels": lab.astype(np.int32),
            "texts": ref_texts,
        })
    return torch_batches, our_batches


class _ListLoader:
    """Minimal loader speaking sar_tpu's loader protocol over fixed batches."""

    def __init__(self, batches):
        self.batches = batches
        self.current_epoch = 0

    def iterate(self):
        while True:
            for b in self.batches:
                yield b
            self.current_epoch += 1

    def one_epoch(self):
        yield from self.batches


class _TokShim:
    """Decode exactly as the reference does: skip specials + strip
    (/root/reference/src/evaluation/__init__.py:76-91)."""

    def __init__(self, wt):
        self.wt = wt

    def decode(self, ids):
        return self.wt.decode(list(map(int, ids)),
                              skip_special_tokens=True).strip()


def _processor(word_tok):
    from transformers import WhisperFeatureExtractor, WhisperProcessor
    return WhisperProcessor(WhisperFeatureExtractor(), word_tok)


def _ref_trainer(ref, pm, train_batches, **kw):
    base = dict(train_dataloader=train_batches, eval_dataloader=None,
                learning_rate=1e-3, weight_decay=0.01, warmup_steps=1,
                max_steps=2, gradient_accumulation_steps=2, max_grad_norm=1.0,
                scheduler_type="linear", mixed_precision="no", device="cpu")
    base.update(kw)
    return ref.ASRTrainer(pm, **base)


# ---------------------------------------------------------------------------
# (a) teacher-forced loss parity at init, through the reference's own step.
# ---------------------------------------------------------------------------

def test_teacher_forced_loss_parity(ref, word_tok):
    world = _build_world(word_tok, seed=3)
    torch_b, our_b = _batches(word_tok, world, n_batches=1, batch_size=3,
                              seed=1)
    tr = _ref_trainer(ref, world.pm, torch_b)
    loss_ref = float(tr._training_step(torch_b[0]))

    labels = jnp.asarray(our_b[0]["labels"])
    dec_in = whisper.shift_tokens_right(labels, world.cfg.sot_token_id,
                                        world.cfg.pad_token_id)
    logits = whisper.forward(world.params,
                             jnp.asarray(our_b[0]["input_features"]),
                             dec_in, world.cfg, lora=world.bank,
                             lora_scale=world.lcfg.scale)
    loss_ours = float(whisper.cross_entropy_loss(logits, labels))
    assert abs(loss_ref - loss_ours) < 1e-5, (loss_ref, loss_ours)


# ---------------------------------------------------------------------------
# (b) optimizer-step parity: two real AdamW steps with accumulation.
# ---------------------------------------------------------------------------

def test_adamw_steps_parity(ref, word_tok):
    world = _build_world(word_tok, seed=5)
    bank0 = jax.tree.map(lambda x: np.array(x), world.bank)
    torch_b, our_b = _batches(word_tok, world, n_batches=4, batch_size=2,
                              seed=2)

    tr = _ref_trainer(ref, world.pm, torch_b, warmup_steps=1, max_steps=2,
                      gradient_accumulation_steps=2)
    tr.train()
    assert tr.global_step == 2
    ref_bank = convert.lora_from_peft_state_dict(
        {k: v for k, v in world.pm.state_dict().items() if "lora_" in k},
        world.cfg)

    args = TrainingArgs(learning_rate=1e-3, weight_decay=0.01, warmup_steps=1,
                        max_steps=2, eval_steps=0, scheduler="linear",
                        mixed_precision="no", gradient_accumulation_steps=2,
                        gradient_checkpointing=False, seed=0)
    ours = ASRTrainer(world.cfg, world.params,
                      jax.tree.map(jnp.asarray, bank0), world.lcfg, args)
    ours.train(_ListLoader(our_b))
    assert ours.global_step == 2

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_bank)
    flat_ours = dict(
        (jax.tree_util.keystr(p), np.asarray(v))
        for p, v in jax.tree_util.tree_leaves_with_path(ours.lora))
    assert flat_ref, "empty reference bank"
    for path, theirs in flat_ref:
        mine = flat_ours[jax.tree_util.keystr(path)]
        # Step 1 runs at lr*1e-8 (warmup floor), step 2 at full lr=1e-3; an
        # update magnitude is ~lr, so 1e-6 is ~0.1% of one step.
        np.testing.assert_allclose(mine, theirs, atol=1e-6,
                                   err_msg=f"bank mismatch at {path}")
        # And training actually moved the params.
        start = dict((jax.tree_util.keystr(p), v) for p, v
                     in jax.tree_util.tree_leaves_with_path(bank0))
        assert np.abs(mine - start[jax.tree_util.keystr(path)]).max() > 1e-5


# ---------------------------------------------------------------------------
# (c) LR schedule trajectory parity for all three schedulers.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["linear", "cosine", "constant"])
def test_schedule_trajectory_parity(ref, word_tok, kind):
    world = _build_world(word_tok, seed=7, nonzero_lora=False)
    lr, warmup, total = 5e-4, 4, 12
    tr = _ref_trainer(ref, world.pm, [], learning_rate=lr,
                      warmup_steps=warmup, max_steps=total,
                      scheduler_type=kind)
    theirs = []
    for _ in range(total):
        # The lr used by optimizer step k is the value set after k prior
        # scheduler.step() calls (trainer.py steps the scheduler after the
        # optimizer, :276-280).
        theirs.append(tr.optimizer.param_groups[0]["lr"])
        tr.scheduler.step()
    sched = make_schedule(kind, lr, warmup, total)
    ours = [float(sched(i)) for i in range(total)]
    # Our schedule evaluates in float32 (on-device), torch's in float64;
    # 1e-5 relative is float32 roundoff, far below anything training-visible.
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-11,
                               err_msg=f"{kind} schedule diverges")


# ---------------------------------------------------------------------------
# (d) evaluator parity: identical predictions -> identical WER/CER,
#     word-level text via the same real WhisperTokenizer.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("num_beams", [1, 2])
def test_evaluator_prediction_and_wer_parity(ref, word_tok, num_beams):
    world = _build_world(word_tok, seed=11)
    torch_b, our_b = _batches(word_tok, world, n_batches=2, batch_size=3,
                              seed=4)

    ref_eval = ref.ASREvaluator(world.pm, _processor(word_tok), device="cpu",
                                max_new_tokens=10, num_beams=num_beams)
    theirs = ref_eval.evaluate(torch_b, return_predictions=True)

    ours_eval = ASREvaluator(world.cfg, world.params, _TokShim(word_tok),
                             max_new_tokens=10, num_beams=num_beams,
                             lora=world.bank, lora_scale=world.lcfg.scale,
                             kv_int8=False, flash=False,
                             prompt_tokens=[world.sot])
    ours = ours_eval.evaluate(_ListLoader(our_b), return_predictions=True)

    assert ours["references"] == theirs["references"]
    assert ours["predictions"] == theirs["predictions"], (
        f"beam={num_beams}: prediction texts diverge")
    assert ours["num_samples"] == theirs["num_samples"] == 6
    np.testing.assert_allclose(ours["wer"], theirs["wer"], rtol=1e-9)
    np.testing.assert_allclose(ours["cer"], theirs["cer"], rtol=1e-9)


def test_trained_adapter_cross_framework_eval(ref, word_tok):
    """Close the loop: train with the REFERENCE trainer, import the updated
    PEFT adapter, and check sar_tpu transcribes identically to the reference
    evaluator on the trained model — the actual interop workflow (train on
    the reference stack, serve on sar_tpu)."""
    world = _build_world(word_tok, seed=13)
    torch_b, our_b = _batches(word_tok, world, n_batches=2, batch_size=2,
                              seed=6)
    tr = _ref_trainer(ref, world.pm, torch_b, warmup_steps=1, max_steps=3,
                      gradient_accumulation_steps=1, learning_rate=5e-3)
    tr.train()

    bank = jax.tree.map(jnp.asarray, convert.lora_from_peft_state_dict(
        {k: v for k, v in world.pm.state_dict().items() if "lora_" in k},
        world.cfg))

    ref_eval = ref.ASREvaluator(world.pm, _processor(word_tok), device="cpu",
                                max_new_tokens=8, num_beams=1)
    theirs = ref_eval.evaluate(torch_b, return_predictions=True)
    ours_eval = ASREvaluator(world.cfg, world.params, _TokShim(word_tok),
                             max_new_tokens=8, num_beams=1, lora=bank,
                             lora_scale=world.lcfg.scale, kv_int8=False,
                             flash=False, prompt_tokens=[world.sot])
    ours = ours_eval.evaluate(_ListLoader(our_b), return_predictions=True)
    assert ours["predictions"] == theirs["predictions"]
    np.testing.assert_allclose(ours["wer"], theirs["wer"], rtol=1e-9)
