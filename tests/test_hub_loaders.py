"""The four HF-hub loader code paths, exercised OFFLINE.

`load_common_voice/ai4bharat/mls/fleurs` are network-gated in production, but
their logic — config normalization (pa -> pa-IN), split maps
(validation -> valid/dev), column renames, text-field preference order,
16 kHz audio cast — is pure. These tests drive them through a monkeypatched
`datasets.load_dataset` returning in-memory fixtures and assert the behaviors
the reference implements at /root/reference/src/data/dataset.py:143-420.

datasets 5.0 is installed but its Audio feature requires torchcodec (absent
here) to encode/decode in-memory arrays, so the fixtures are a minimal shim
with the exact Dataset surface the loaders touch (column_names,
rename_column, cast_column) — every loader line still executes; the 16 kHz
cast is recorded and asserted rather than run through torchcodec.
"""

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")

from sar_tpu.data import datasets as sar_ds


def _audio(seconds=2.0, sr=16_000, freq=440.0):
    t = np.arange(int(seconds * sr)) / sr
    return {"array": (0.1 * np.sin(2 * np.pi * freq * t)).astype(np.float32),
            "sampling_rate": sr}


class _FakeDataset:
    """The slice of datasets.Dataset the loaders use. Immutable-style:
    rename_column / cast_column return new instances, like the real API."""

    def __init__(self, rows: dict, cast_log=None):
        n = len(next(iter(rows.values())))
        assert all(len(v) == n for v in rows.values())
        self._rows = dict(rows)
        self.cast_log = cast_log if cast_log is not None else []

    @property
    def column_names(self):
        return list(self._rows)

    def rename_column(self, old, new):
        rows = dict(self._rows)
        rows[new] = rows.pop(old)
        return _FakeDataset(rows, self.cast_log)

    def cast_column(self, name, feature):
        assert name in self._rows, f"cast of missing column {name}"
        self.cast_log.append((name, getattr(feature, "sampling_rate", None)))
        return _FakeDataset(self._rows, self.cast_log)

    def __len__(self):
        return len(next(iter(self._rows.values())))

    def __getitem__(self, i):
        return {k: v[i] for k, v in self._rows.items()}


class _FakeHub:
    """Monkeypatched datasets.load_dataset recording (repo, config, split)."""

    def __init__(self, table):
        self.table = table      # (repo, config, split) -> _FakeDataset
        self.calls = []

    def __call__(self, repo, config=None, split=None, streaming=False, **kw):
        self.calls.append({"repo": repo, "config": config, "split": split,
                           "streaming": streaming})
        key = (repo, config, split)
        if key not in self.table:
            raise FileNotFoundError(f"fake hub has no {key}")
        return self.table[key]


@pytest.fixture
def hub(monkeypatch):
    def install(table):
        fake = _FakeHub(table)
        monkeypatch.setattr(datasets, "load_dataset", fake)
        return fake
    return install


def test_common_voice_pa_config_and_rename(hub):
    """Punjabi normalizes to the pa-IN config; `sentence` becomes `text`;
    the audio column is cast to 16 kHz (dataset.py:143-216)."""
    raw = _FakeDataset({"audio": [_audio(2.0)],
                        "sentence": ["sat sri akal"]})
    fake = hub({("fsicoli/common_voice_17_0", "pa-IN", "train"): raw})
    ds = sar_ds.load_common_voice("pa", split="train")
    assert fake.calls[0]["config"] == "pa-IN"
    assert "text" in ds.column_names and "sentence" not in ds.column_names
    assert ds[0]["text"] == "sat sri akal"
    assert ds.cast_log == [("audio", 16_000)]


def test_common_voice_plain_code_passthrough_and_streaming_flag(hub):
    raw = _FakeDataset({"audio": [_audio()], "sentence": ["ciao"]})
    fake = hub({("fsicoli/common_voice_17_0", "it", "test"): raw})
    sar_ds.load_common_voice("it", split="test", streaming=True)
    assert fake.calls[0] == {"repo": "fsicoli/common_voice_17_0",
                             "config": "it", "split": "test",
                             "streaming": True}


def test_ai4bharat_split_map_rename_and_text_preference(hub):
    """validation -> valid; audio_filepath -> audio; `normalized` wins over
    `verbatim` (the reference's preference order, dataset.py:312-330)."""
    raw = _FakeDataset({"audio_filepath": [_audio()],
                        "verbatim": ["umm namaste duniya"],
                        "normalized": ["namaste duniya"]})
    fake = hub({("ai4bharat/IndicVoices", "punjabi", "valid"): raw})
    ds = sar_ds.load_ai4bharat("punjabi", split="validation")
    assert fake.calls[0]["split"] == "valid"
    assert ds[0]["text"] == "namaste duniya"
    assert "audio" in ds.column_names and "audio_filepath" not in ds.column_names
    assert ("audio", 16_000) in ds.cast_log


def test_ai4bharat_language_name_map_and_fallback_text(hub):
    """Short names map through AI4BHARAT_LANGUAGES; with only
    `transcription` present, that becomes `text`."""
    raw = _FakeDataset({"audio": [_audio()], "transcription": ["vanakkam"]})
    fake = hub({("ai4bharat/IndicVoices", "tamil", "train"): raw})
    ds = sar_ds.load_ai4bharat("tamil", split="train")
    assert fake.calls[0]["config"] == "tamil"
    assert ds[0]["text"] == "vanakkam"


def test_mls_split_map_and_rename(hub):
    raw = _FakeDataset({"audio": [_audio()],
                        "transcript": ["buongiorno a tutti"]})
    fake = hub({("facebook/multilingual_librispeech", "italian", "dev"): raw})
    ds = sar_ds.load_mls("italian", split="validation")
    assert fake.calls[0]["split"] == "dev"
    assert ds[0]["text"] == "buongiorno a tutti"
    assert ds.cast_log == [("audio", 16_000)]


def test_fleurs_rename(hub):
    raw = _FakeDataset({"audio": [_audio()], "transcription": ["namaste"]})
    fake = hub({("google/fleurs", "hi_in", "test"): raw})
    ds = sar_ds.load_fleurs("hi_in", split="test")
    assert fake.calls[0]["repo"] == "google/fleurs"
    assert ds[0]["text"] == "namaste"
    assert ds.cast_log == [("audio", 16_000)]


def test_create_dataset_hub_path_end_to_end(hub):
    """create_dataset over monkeypatched hub sources: per-source failure skip
    (dataset.py:511-513), mixing ratios, max_samples, and the ASRDataset
    duration filter all run on the HUB path (not just synthetic)."""
    from sar_tpu.data.tokenizer import CharTokenizer
    from sar_tpu.models.config import get_config

    n = 8
    cv = _FakeDataset({"audio": [_audio(1.5 + 0.25 * i) for i in range(n)],
                       "sentence": [f"sample number {i}" for i in range(n)]})
    # 0.5 s clip -> dropped by the min-duration filter.
    short = _FakeDataset({"audio": [_audio(0.5)], "sentence": ["too short"]})
    hub({
        ("fsicoli/common_voice_17_0", "pa-IN", "train"): cv,
        ("fsicoli/common_voice_17_0", "pa-IN", "test"): short,
        # ai4bharat intentionally ABSENT -> per-source skip must kick in.
    })
    cfg = get_config("whisper-test")
    tok = CharTokenizer(cfg)

    ds = sar_ds.create_dataset("punjabi", sources=["common_voice", "ai4bharat"],
                               split="train", tokenizer=tok, max_samples=6)
    assert len(ds) == 6                      # capped, ai4bharat skipped
    item = ds[0]
    assert set(item) == {"audio", "labels", "text", "language_id"}
    assert item["text"].startswith("sample number")
    assert item["audio"].dtype == np.float32

    dropped = sar_ds.create_dataset("punjabi", sources=["common_voice"],
                                    split="test", tokenizer=tok)
    assert len(dropped) == 0                 # min-duration filter fired

    mixed = sar_ds.create_dataset("punjabi", sources=["common_voice"],
                                  split="train", tokenizer=tok,
                                  mixing_ratios={"common_voice": 0.5})
    assert len(mixed) == n // 2

    with pytest.raises(RuntimeError, match="No sources loaded"):
        sar_ds.create_dataset("punjabi", sources=["ai4bharat"], split="train",
                              tokenizer=tok)
