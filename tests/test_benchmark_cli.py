"""scripts/benchmark.py hermetic smokes: the greedy, beam, and s8-scores
sweep paths on the CPU backend with the tiny config (numbers are
meaningless off-TPU; this guards the CLI plumbing + jnp twin paths)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


def test_benchmark_greedy_and_beam_rows():
    import benchmark
    report = benchmark.main([
        "--model", "whisper-test", "--platform", "cpu",
        "--batch_sizes", "2", "--max_new_tokens", "4",
        "--num_beams", "1", "2", "--iters", "1"])
    rows = report["results"]
    assert [r["num_beams"] for r in rows] == [1, 2]
    assert all(r["rtfx"] > 0 for r in rows)


def test_benchmark_int4_kv_row():
    import benchmark
    report = benchmark.main([
        "--model", "whisper-test", "--platform", "cpu",
        "--batch_sizes", "2", "--max_new_tokens", "4",
        "--kv_cache", "int4", "--iters", "1"])
    (row,) = report["results"]
    assert row["kv"] == "int4" and row["rtfx"] > 0
    assert 0.0 <= row["token_agreement_vs_int8"] <= 1.0


def test_benchmark_no_agreement_skips_comparison_decode():
    """--no_agreement drops the exact-path comparison decode from
    approximate rows (capacity probes: at whisper-large B>=48 the int8-KV
    reference decode itself thrashes or crashes while int4 fits)."""
    import benchmark
    report = benchmark.main([
        "--model", "whisper-test", "--platform", "cpu",
        "--batch_sizes", "2", "--max_new_tokens", "4",
        "--kv_cache", "int4", "--iters", "1", "--no_agreement"])
    (row,) = report["results"]
    assert row["kv"] == "int4" and row["rtfx"] > 0
    assert "token_agreement_vs_int8" not in row


def test_benchmark_scores_int8_row_reports_agreement():
    import benchmark
    report = benchmark.main([
        "--model", "whisper-test", "--platform", "cpu",
        "--batch_sizes", "2", "--max_new_tokens", "4",
        "--attn_scores", "int8", "--iters", "1"])
    (row,) = report["results"]
    assert row["attn_scores"] == "int8"
    assert 0.0 <= row["token_agreement_vs_bf16"] <= 1.0


def test_benchmark_serving_row():
    import benchmark
    report = benchmark.main([
        "--model", "whisper-test", "--batch_sizes", "2",
        "--max_new_tokens", "6", "--serving", "--serving_requests", "5",
        "--serving_wait_ms", "100", "--platform", "cpu"])
    (row,) = report["results"]
    assert row["mode"] == "serving"
    assert row["requests"] == 5
    assert row["requests_per_s"] > 0
    assert row["batches"] >= 3          # 5 requests at batch 2
    assert row["latency_ms_p50"] > 0


def test_benchmark_train_row():
    import benchmark
    report = benchmark.main([
        "--model", "whisper-test", "--platform", "cpu",
        "--batch_sizes", "2", "--train", "--train_accum", "2",
        "--train_label_len", "8", "--train_lora_rank", "4", "--iters", "1"])
    (row,) = report["results"]
    assert row["mode"] == "train"
    assert row["batch"] == 2 and row["accum"] == 2
    assert row["examples_per_s"] > 0


def test_benchmark_routed_row():
    """--routed: one compiled LID->gather->decode program vs the oracle
    program; the row must carry the reference's Phase-2 success metric
    (routing overhead per utterance) and perfect token agreement — routing
    may cost time, never tokens."""
    import benchmark
    report = benchmark.main([
        "--model", "whisper-test", "--platform", "cpu",
        "--batch_sizes", "2", "--max_new_tokens", "4", "--routed",
        "--routed_languages", "2", "--routed_lora_rank", "4", "--iters", "1"])
    (row,) = report["results"]
    assert row["mode"] == "routed"
    assert row["languages"] == 2
    assert row["rtfx_routed"] > 0 and row["rtfx_oracle"] > 0
    assert row["token_agreement_vs_oracle"] == 1.0
    assert row["lid_ms_per_utt"] > 0


def test_benchmark_routed_early_lid_tap():
    """LID at an early encoder layer must produce a full row too (the
    cheap-LID configuration)."""
    import benchmark
    report = benchmark.main([
        "--model", "whisper-test", "--platform", "cpu",
        "--batch_sizes", "2", "--max_new_tokens", "4", "--routed",
        "--routed_languages", "2", "--routed_lora_rank", "4",
        "--routed_lid_layer", "0", "--iters", "1"])
    (row,) = report["results"]
    assert row["lid_layer"] == 0
    assert row["token_agreement_vs_oracle"] == 1.0
