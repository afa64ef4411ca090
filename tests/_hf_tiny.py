"""Shared offline HF/PEFT helpers for the cross-framework parity tests.

Everything here is hermetic: tiny random-init HF Whisper configs (no hub
downloads), PEFT wrapping matching the reference's LoRA setup
(/root/reference/src/models/whisper_lora.py:86-98 — deliberately no
task_type), and a real word-level WhisperTokenizer trained offline on a tiny
corpus so WER comparisons run on word-segmented text rather than the
byte-level CharTokenizer.
"""

from __future__ import annotations

import numpy as np
import torch

SOT_TOKEN = "<|startoftranscript|>"

# Tiny multilingual-ish corpus for the offline BPE; fixed so the fixture
# tokenizer (and every id in these tests) is deterministic.
TOKENIZER_CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "hello world this is a test of speech recognition",
    "namaste duniya yeh ek pariksha hai",
    "ciao mondo questa e una prova di riconoscimento vocale",
    "sat sri akal duniya eh ik praikhia hai",
    "audio speech adapter routing language model",
    "one two three four five six seven eight nine ten",
] * 4


def train_word_tokenizer(out_dir):
    """Train a byte-level BPE offline and wrap it as a real WhisperTokenizer.

    Returns the (slow) WhisperTokenizer — the same class the reference's
    processor decodes with (/root/reference/src/models/base.py:44-74).
    """
    from tokenizers import ByteLevelBPETokenizer
    from transformers import WhisperTokenizer

    bpe = ByteLevelBPETokenizer()
    bpe.train_from_iterator(TOKENIZER_CORPUS, vocab_size=200, min_frequency=1,
                            special_tokens=["<|endoftext|>"])
    out_dir = str(out_dir)
    bpe.save_model(out_dir)
    tok = WhisperTokenizer(
        vocab_file=f"{out_dir}/vocab.json", merges_file=f"{out_dir}/merges.txt",
        unk_token="<|endoftext|>", bos_token="<|endoftext|>",
        eos_token="<|endoftext|>", pad_token="<|endoftext|>")
    tok.add_special_tokens({"additional_special_tokens": [SOT_TOKEN]})
    return tok


def tiny_hf_config(vocab_size: int, eos: int, sot: int, layers: int = 2,
                   d_model: int = 64, heads: int = 4, frames: int = 64):
    """Tiny HF WhisperConfig; non-multilingual so generate()'s init tokens are
    exactly [decoder_start_token_id] (no language detection)."""
    from transformers import WhisperConfig as HFConfig
    return HFConfig(
        vocab_size=vocab_size, num_mel_bins=80, d_model=d_model,
        encoder_layers=layers, encoder_attention_heads=heads,
        decoder_layers=layers, decoder_attention_heads=heads,
        encoder_ffn_dim=2 * d_model, decoder_ffn_dim=2 * d_model,
        max_source_positions=frames // 2, max_target_positions=48,
        pad_token_id=eos, bos_token_id=sot, eos_token_id=eos,
        decoder_start_token_id=sot, attn_implementation="eager",
    )


def make_tiny_model(hf_cfg, seed: int = 0):
    """Random-init HF model with generation lists cleared, the way the
    reference loads models (/root/reference/src/models/base.py:129-131)."""
    from transformers import WhisperForConditionalGeneration
    torch.manual_seed(seed)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    model.generation_config.forced_decoder_ids = None
    model.generation_config.suppress_tokens = None
    model.generation_config.begin_suppress_tokens = None
    return model


def peft_wrap(model, r: int = 4, alpha: int = 8, dropout: float = 0.0,
              targets=("q_proj", "v_proj")):
    """PEFT-wrap exactly as the reference does (whisper_lora.py:86-98):
    LoraConfig without task_type, bias='none'."""
    import peft
    lcfg = peft.LoraConfig(r=r, lora_alpha=alpha, lora_dropout=dropout,
                           target_modules=list(targets), bias="none")
    return peft.get_peft_model(model, lcfg)


def randomize_peft_lora(peft_model, seed: int = 0, scale: float = 0.05):
    """Give every lora_A/lora_B nonzero random weights (PEFT inits B = 0, so a
    fresh wrap has an exactly-zero delta — useless for forward-parity tests)."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in peft_model.named_parameters():
            if "lora_A" in name or "lora_B" in name:
                p.copy_(torch.randn(p.shape, generator=gen) * scale)


def synth_mels(seed: int, batch: int, hf_cfg) -> np.ndarray:
    """Deterministic synthetic log-mel batches shared by both frameworks."""
    rng = np.random.default_rng(seed)
    frames = hf_cfg.max_source_positions * 2
    return rng.standard_normal(
        (batch, hf_cfg.num_mel_bins, frames)).astype(np.float32)


def synth_labels(texts: list[str], tokenizer, eos: int, width: int) -> np.ndarray:
    """Tokenize texts -> [B, width] label rows, -100-padded (the collator
    contract, /root/reference/src/data/collate.py:69-72)."""
    rows = []
    for t in texts:
        ids = tokenizer.encode(t, add_special_tokens=False) + [eos]
        assert len(ids) <= width, f"label too long: {len(ids)} > {width}"
        rows.append(ids + [-100] * (width - len(ids)))
    return np.asarray(rows, np.int64)
