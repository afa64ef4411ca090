"""End-to-end CLI pipeline on the hermetic synthetic path:
train_lora -> evaluate_model -> train_router -> route_infer.
This is the full Phase-1 + Phase-2 workflow of the reference, in-process."""

import json
import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"
sys.path.insert(0, str(SCRIPTS))

LANGS = ["english", "german"]


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    import train_lora

    adapters = {}
    for lang in LANGS:
        out = root / f"lora_{lang}"
        train_lora.main([
            "--model", "whisper-test", "--language", lang,
            "--data_sources", "synthetic",
            "--lora_rank", "4", "--lora_alpha", "8", "--lora_dropout", "0.0",
            "--batch_size", "4", "--gradient_accumulation_steps", "1",
            "--learning_rate", "3e-3", "--warmup_steps", "2",
            "--max_steps", "12", "--eval_steps", "6", "--save_steps", "6",
            "--max_label_length", "24", "--max_new_tokens", "12",
            "--mixed_precision", "no", "--no_wandb",
            "--max_samples", "32",
            "--output_dir", str(out),
        ])
        adapters[lang] = out
    return root, adapters


def test_train_lora_outputs(pipeline):
    root, adapters = pipeline
    for lang, out in adapters.items():
        assert (out / "final" / "adapter_params.npz").exists()
        assert (out / "best" / "adapter" / "adapter_params.npz").exists()
        assert (out / "config.yaml").exists()
        hist = json.loads((out / "history.json").read_text())
        assert hist["eval"][0]["step"] == 0          # initial eval ran
        assert len(hist["eval"]) >= 2


def test_evaluate_model_cli(pipeline):
    root, adapters = pipeline
    import evaluate_model
    results = evaluate_model.main([
        "--checkpoint", str(adapters["english"] / "final"),
        "--model", "whisper-test", "--language", "english",
        "--data_sources", "synthetic", "--split", "test",
        "--batch_size", "4", "--max_new_tokens", "12",
        "--mixed_precision", "no", "--max_samples", "12",
        "--save_predictions",
        "--output_dir", str(root / "eval_out"),
    ])
    assert 0 <= results["wer"]
    assert results["num_samples"] > 0
    metrics = json.loads((root / "eval_out" / "metrics.json").read_text())
    assert "wer" in metrics and "cer" in metrics
    assert (root / "eval_out" / "predictions.txt").exists()


def test_evaluate_zero_shot(pipeline):
    root, _ = pipeline
    import evaluate_model
    results = evaluate_model.main([
        "--checkpoint", "none", "--model", "whisper-test",
        "--language", "english", "--data_sources", "synthetic",
        "--batch_size", "4", "--max_new_tokens", "8",
        "--mixed_precision", "no", "--max_samples", "8",
    ])
    assert results["num_samples"] == 8


def test_router_pipeline(pipeline):
    root, adapters = pipeline
    import route_infer
    import train_router

    train_router.main([
        "--base_model", "whisper-test", "--languages", *LANGS,
        "--data_sources", "synthetic",
        "--hidden_dims", "32", "--dropout", "0.0",
        "--label_smoothing", "0.0",
        "--samples_per_language", "32",
        "--batch_size", "16", "--learning_rate", "5e-3",
        "--weight_decay", "0.0",
        "--warmup_steps", "5", "--max_steps", "120", "--eval_steps", "120",
        "--scheduler_type", "constant", "--mixed_precision", "no",
        "--no_wandb",
        "--output_dir", str(root / "router_out"),
    ])
    assert (root / "router_out" / "classifier" / "classifier_params.npz").exists()
    hist = json.loads((root / "router_out" / "history.json").read_text())
    assert hist["eval"][-1]["accuracy"] > 0.8, hist["eval"][-1]

    results = route_infer.main([
        "--model", "whisper-test",
        "--classifier", str(root / "router_out"),
        "--adapters",
        *[f"{l}={adapters[l] / 'final'}" for l in LANGS],
        "--data_sources", "synthetic", "--split", "test",
        "--max_samples", "8", "--batch_size", "4",
        "--max_new_tokens", "12", "--mixed_precision", "no",
        "--oracle",
        "--router_dir", str(root / "router_saved"),
        "--output_dir", str(root / "route_out"),
    ])
    assert results["lid_accuracy"] > 0.8
    # The CLI now feeds MIXED-language batches (with batch 4 over two
    # interleaved languages every batch is 2+2) and reports the Phase-2
    # routing-overhead metric.
    assert results["routing_overhead_ms"] is not None
    for lang in LANGS:
        entry = results["per_language"][lang]
        assert entry["num_samples"] == 8
        assert "oracle_wer" in entry
    assert (root / "route_out" / "routing_results.json").exists()
    assert (root / "router_saved" / "router_config.json").exists()


def test_class_weight_path(pipeline, tmp_path):
    root, _ = pipeline
    import train_router
    train_router.main([
        "--base_model", "whisper-test", "--languages", *LANGS,
        "--data_sources", "synthetic",
        "--hidden_dims", "16", "--dropout", "0.0",
        "--samples_per_language", "16",
        "--class_weights", "inverse_freq",
        "--batch_size", "8", "--max_steps", "4", "--eval_steps", "0",
        "--mixed_precision", "no", "--no_wandb",
        "--output_dir", str(tmp_path / "cw"),
    ])
    cfg = json.loads((tmp_path / "cw" / "classifier" /
                      "classifier_config.json").read_text())
    assert cfg["config"]["class_weights"] is not None
