"""Joint multilingual adapter-bank training: one trainer, one bank, mixed
batches routed per utterance by language_ids — a capability beyond the
reference's one-job-per-language SLURM grid."""

import jax
import numpy as np
import pytest

from sar_tpu.data.collate import create_collator
from sar_tpu.data.datasets import _ConcatDataset
from sar_tpu.data.loader import DataLoader
from sar_tpu.data.synthetic import SyntheticASRDataset
from sar_tpu.data.tokenizer import CharTokenizer
from sar_tpu.models import lora as lora_lib
from sar_tpu.models import whisper
from sar_tpu.models.config import get_config
from sar_tpu.training import ASRTrainer, TrainingArgs

LANGS = ["english", "german"]


def test_joint_bank_training_learns_and_routes():
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    tok = CharTokenizer(cfg)

    parts = [SyntheticASRDataset(cfg, size=16, num_words=2, language=l,
                                 language_id=i, seed=i)
             for i, l in enumerate(LANGS)]
    ds = _ConcatDataset(parts)
    coll = create_collator(cfg.sot_token_id, pad_to_length=24,
                           with_language=True)
    train_loader = DataLoader(ds, batch_size=4, collator=coll, seed=1)
    eval_loader = DataLoader(ds, batch_size=4, collator=coll, shuffle=False,
                             drop_last=False)

    lcfg = lora_lib.LoraConfig(r=8, alpha=16, dropout=0.0)
    bank = lora_lib.init_lora(jax.random.PRNGKey(1), cfg, lcfg,
                              num_adapters=len(LANGS))
    trainer = ASRTrainer(
        cfg, params, bank, lcfg,
        TrainingArgs(learning_rate=3e-3, warmup_steps=2, max_steps=25,
                     eval_steps=25, gradient_accumulation_steps=2,
                     mixed_precision="no", max_new_tokens=12,
                     gradient_checkpointing=False, seed=0),
        tokenizer=tok, language=LANGS[0], languages=LANGS)
    assert trainer.multi_adapter

    history = trainer.train(train_loader, eval_loader)
    first, last = history["loss"][0], np.mean(history["loss"][-5:])
    assert last < first, f"bank training did not learn: {first} -> {last}"
    # Eval ran with per-utterance adapters/prompts.
    assert history["eval"][-1]["num_samples"] == 32
