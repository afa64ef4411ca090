"""Phase-3 adapter analysis (the reference planned but never implemented it)."""

import jax
import numpy as np
import pytest

from sar_tpu.analysis import adapter_similarity, analyze_adapter, compare_adapters
from sar_tpu.models import lora as lora_lib
from sar_tpu.models.config import get_config


@pytest.fixture(scope="module")
def banks(tmp_path_factory):
    cfg = get_config("whisper-test")
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, dropout=0.0)
    out = {}
    root = tmp_path_factory.mktemp("adapters")
    for i, lang in enumerate(("english", "german")):
        b = lora_lib.init_lora(jax.random.PRNGKey(i), cfg, lcfg)
        leaves, td = jax.tree.flatten(b)
        keys = jax.random.split(jax.random.PRNGKey(10 + i), len(leaves))
        b = jax.tree.unflatten(td, [jax.random.normal(k, l.shape) * 0.1
                                    for k, l in zip(keys, leaves)])
        lora_lib.save_adapter(root / lang, b, lcfg, metadata={"language": lang})
        out[lang] = (b, lcfg, str(root / lang))
    return out


def test_analyze_adapter(banks):
    b, lcfg, _ = banks["english"]
    a = analyze_adapter(b, lcfg)
    assert a["rank"] == 4
    # q/v targets on encoder + decoder self/cross.
    assert set(a["layers"]) == {"encoder.q", "encoder.v", "decoder.self_q",
                                "decoder.self_v", "decoder.cross_q",
                                "decoder.cross_v"}
    row = a["layers"]["encoder.q"][0]
    assert row["frobenius_norm"] > 0
    assert 0 < row["effective_rank"] <= 4.0


def test_effective_rank_of_rank1_delta():
    from sar_tpu.analysis.adapters import (_delta_singular_values,
                                           _effective_rank)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((16, 4)).astype(np.float32)
    a[:, 1:] = 0.0                        # only one active rank column
    b = rng.standard_normal((4, 16)).astype(np.float32)
    b[1:, :] = 0.0
    sv = _delta_singular_values(a, b, 1.0)
    assert _effective_rank(sv) == pytest.approx(1.0, abs=1e-3)


def test_self_similarity_is_one(banks):
    b, lcfg, _ = banks["english"]
    sim = adapter_similarity(b, b, lcfg.scale, lcfg.scale)
    assert sim["mean_similarity"] == pytest.approx(1.0, abs=1e-5)


def test_cross_similarity_near_zero(banks):
    ba, lcfg, _ = banks["english"]
    bb, _, _ = banks["german"]
    sim = adapter_similarity(ba, bb, lcfg.scale, lcfg.scale)
    assert abs(sim["mean_similarity"]) < 0.3  # independent random adapters


def test_compare_adapters_and_cli(banks, tmp_path):
    dirs = {lang: path for lang, (_, _, path) in banks.items()}
    report = compare_adapters(dirs)
    assert set(report["adapters"]) == {"english", "german"}
    assert "english/german" in report["pairwise_similarity"]

    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import analyze_adapters
    out = tmp_path / "report.json"
    analyze_adapters.main([
        "--adapters", *[f"{l}={p}" for l, p in dirs.items()],
        "--output", str(out)])
    assert out.exists()


def test_compare_adapters_accepts_peft_dirs(tmp_path):
    """Adapter analysis must consume the reference's own PEFT
    save_pretrained checkpoints (whisper_lora.py:207-232 format)."""
    pytest.importorskip("peft")
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from _hf_tiny import (make_tiny_model, peft_wrap, randomize_peft_lora,
                          tiny_hf_config)

    from sar_tpu.analysis import compare_adapters
    from sar_tpu.models import convert
    hf_cfg = tiny_hf_config(vocab_size=120, eos=3, sot=4)
    cfg = convert.config_from_hf(hf_cfg)
    for i, lang in enumerate(("english", "german")):
        peft_model = peft_wrap(make_tiny_model(hf_cfg, seed=i))
        randomize_peft_lora(peft_model, seed=i)
        peft_model.save_pretrained(str(tmp_path / lang))
    report = compare_adapters({"english": str(tmp_path / "english"),
                               "german": str(tmp_path / "german")},
                              model=cfg)
    assert set(report["adapters"]) == {"english", "german"}
    assert "english/german" in report["pairwise_similarity"]
    assert report["adapters"]["english"]["rank"] == 4
