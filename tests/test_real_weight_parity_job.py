"""jobs/real_weight_parity.sh — the one-command real-weight parity runner.

The actual grid needs network (HF weights + FLEURS); what IS testable
offline and is tested here: the script's dry-run path emits the full
command grid, and compare_baseline.py produces the right verdicts from
metrics.json cells.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_dry_run_emits_full_grid(tmp_path):
    out = subprocess.run(
        ["bash", str(REPO / "jobs" / "real_weight_parity.sh"), "--dry-run"],
        capture_output=True, text=True, cwd=REPO,
        env={"PATH": "/usr/bin:/bin", "OUT": str(tmp_path)})
    assert out.returncode == 0, out.stderr
    lines = [l for l in out.stdout.splitlines() if l.startswith("DRY:")]
    # 3 models x 4 languages + the final compare call.
    assert len(lines) == 13, out.stdout
    assert sum("whisper-small" in l for l in lines) == 4
    assert sum("--language punjabi" in l for l in lines) == 3
    assert all("--checkpoint none" in l for l in lines[:-1])
    assert all("--data_sources fleurs" in l for l in lines[:-1])
    assert "compare_baseline.py" in lines[-1]


def test_dry_run_single_model(tmp_path):
    out = subprocess.run(
        ["bash", str(REPO / "jobs" / "real_weight_parity.sh"), "--dry-run",
         "whisper-small"],
        capture_output=True, text=True, cwd=REPO,
        env={"PATH": "/usr/bin:/bin", "OUT": str(tmp_path)})
    assert out.returncode == 0, out.stderr
    lines = [l for l in out.stdout.splitlines() if l.startswith("DRY:")]
    assert len(lines) == 5          # 4 languages + compare
    assert all("whisper-medium" not in l for l in lines)


def test_compare_baseline_verdicts(tmp_path):
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import compare_baseline
    finally:
        sys.path.pop(0)

    def cell(model, lang, wer_frac):
        d = tmp_path / f"{model}_{lang}"
        d.mkdir(parents=True)
        (d / "metrics.json").write_text(json.dumps({"wer": wer_frac}))

    cell("whisper-small", "hindi", 0.8416)      # exactly the baseline
    cell("whisper-small", "italian", 0.2000)    # better
    cell("whisper-small", "punjabi", 1.5500)    # worse
    report = compare_baseline.compare(tmp_path)
    by = {(c["model"], c["language"]): c for c in report["cells"]}
    assert by[("whisper-small", "hindi")]["status"] == "parity"
    assert by[("whisper-small", "italian")]["status"] == "better"
    assert by[("whisper-small", "punjabi")]["status"] == "worse"
    assert by[("whisper-medium", "hindi")]["status"] == "missing"
    assert report["num_measured"] == 3
    assert report["num_parity_or_better"] == 2
    assert report["num_missing"] == 9


def test_compare_baseline_cli_empty_results_exits_nonzero(tmp_path):
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "compare_baseline.py"),
         "--results", str(tmp_path), "--output",
         str(tmp_path / "diff.json")],
        capture_output=True, text=True, cwd=REPO)
    assert out.returncode == 1
    assert (tmp_path / "diff.json").exists()
    report = json.loads((tmp_path / "diff.json").read_text())
    assert report["num_measured"] == 0 and report["num_missing"] == 12
