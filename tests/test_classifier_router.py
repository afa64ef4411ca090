"""LID classifier, LID trainer, and adapter router tests — capability parity
with /root/reference/src/models/adapter_router.py and scripts/train_router.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.data.collate import LIDCollator, create_collator
from sar_tpu.data.loader import DataLoader
from sar_tpu.data.synthetic import SyntheticASRDataset
from sar_tpu.models import classifier as clf
from sar_tpu.models import lora as lora_lib
from sar_tpu.models import whisper
from sar_tpu.models.config import get_config
from sar_tpu.models.router import AdapterRouter
from sar_tpu.training.lid_trainer import LIDDataset, LIDTrainer, LIDTrainingArgs

LANGS = ("english", "german")


@pytest.fixture(scope="module")
def world():
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _feats(rng, B, T=30, D=64):
    return jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)


@pytest.mark.parametrize("pooling", ["mean", "max", "attention"])
def test_classifier_poolings(world, rng, pooling):
    ccfg = clf.ClassifierConfig(input_dim=64, hidden_dims=(32, 16),
                                num_classes=3, pooling=pooling,
                                languages=("a", "b", "c"))
    p = clf.init_classifier(jax.random.PRNGKey(1), ccfg)
    out = clf.apply_classifier(p, ccfg, _feats(rng, 4),
                               labels=jnp.asarray([0, 1, 2, 0]))
    assert out["logits"].shape == (4, 3)
    np.testing.assert_allclose(np.asarray(out["probs"]).sum(-1), 1.0, rtol=1e-5)
    assert np.isfinite(float(out["loss"]))


def test_classifier_mask_aware(world, rng):
    ccfg = clf.ClassifierConfig(input_dim=64, num_classes=2, pooling="mean",
                                languages=("a", "b"))
    p = clf.init_classifier(jax.random.PRNGKey(1), ccfg)
    x = _feats(rng, 2, T=10)
    mask = jnp.asarray([[True] * 10, [True] * 4 + [False] * 6])
    # Masked positions must not influence the pooled output.
    x2 = x.at[1, 4:].set(999.0)
    a = clf.apply_classifier(p, ccfg, x, attention_mask=mask)["logits"]
    b = clf.apply_classifier(p, ccfg, x2, attention_mask=mask)["logits"]
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-4)


def test_classifier_cnn_front(world, rng):
    ccfg = clf.ClassifierConfig(input_dim=64, num_classes=2, use_cnn=True,
                                cnn_channels=32, languages=("a", "b"))
    p = clf.init_classifier(jax.random.PRNGKey(1), ccfg)
    out = clf.apply_classifier(p, ccfg, _feats(rng, 2))
    assert out["logits"].shape == (2, 2)


def test_class_weight_strategies():
    counts = {"a": 100, "b": 10, "c": 1000}
    for strat in ("inverse_freq", "inverse_sqrt", "effective_samples"):
        w = clf.compute_class_weights_from_counts(counts, ("a", "b", "c"), strat)
        assert w.shape == (3,)
        np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-5)
        assert w[1] > w[0] > w[2]  # rarer class gets higher weight
    # Capping clamps then re-normalizes to mean 1 (reference semantics,
    # adapter_router.py:195-199): the max/min spread shrinks.
    uncapped = clf.compute_class_weights_from_counts(
        counts, ("a", "b", "c"), "inverse_freq")
    capped = clf.compute_class_weights_from_counts(
        counts, ("a", "b", "c"), "inverse_freq", max_weight=2.0)
    np.testing.assert_allclose(capped.mean(), 1.0, rtol=1e-5)
    assert capped.max() / capped.min() < uncapped.max() / uncapped.min()
    smoothed = clf.compute_class_weights_from_counts(
        counts, ("a", "b", "c"), "inverse_freq", smoothing=1.0)
    np.testing.assert_allclose(smoothed, 1.0, rtol=1e-5)


def test_weighted_smoothed_loss(world, rng):
    ccfg = clf.ClassifierConfig(input_dim=64, num_classes=2, languages=("a", "b"),
                                label_smoothing=0.1, class_weights=(2.0, 0.5))
    p = clf.init_classifier(jax.random.PRNGKey(1), ccfg)
    out = clf.apply_classifier(p, ccfg, _feats(rng, 4),
                               labels=jnp.asarray([0, 0, 1, 1]))
    # Compare against torch's CrossEntropyLoss semantics.
    import torch
    logits_t = torch.tensor(np.asarray(out["logits"]))
    loss_t = torch.nn.CrossEntropyLoss(
        weight=torch.tensor([2.0, 0.5]), label_smoothing=0.1)(
        logits_t, torch.tensor([0, 0, 1, 1]))
    np.testing.assert_allclose(float(out["loss"]), float(loss_t), rtol=1e-5)


def test_classifier_save_load(tmp_path, world, rng):
    ccfg = clf.ClassifierConfig(input_dim=64, num_classes=2, languages=("a", "b"))
    p = clf.init_classifier(jax.random.PRNGKey(1), ccfg)
    clf.save_classifier(tmp_path / "c", p, ccfg, metadata={"step": 7})
    p2, ccfg2, meta = clf.load_classifier(tmp_path / "c")
    assert ccfg2 == ccfg and meta["step"] == 7
    x = _feats(rng, 2)
    np.testing.assert_allclose(
        np.asarray(clf.apply_classifier(p, ccfg, x)["logits"]),
        np.asarray(clf.apply_classifier(p2, ccfg2, x)["logits"]), atol=1e-6)


def test_encode_features_layer_tap(world, rng):
    cfg, params = world
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 64)), jnp.float32)
    final = clf.encode_features(params, mel, cfg, layer_index=-1)
    layer0 = clf.encode_features(params, mel, cfg, layer_index=0)
    assert final.shape == layer0.shape == (2, 32, 64)
    assert not np.allclose(np.asarray(final), np.asarray(layer0))


def test_lid_training_learns(world):
    cfg, params = world
    datasets = {l: SyntheticASRDataset(cfg, size=24, language=l, language_id=i,
                                       seed=i)
                for i, l in enumerate(LANGS)}
    ds = LIDDataset(datasets, LANGS, balance=True)
    assert ds.class_counts == {"english": 24, "german": 24}
    loader = DataLoader(ds, batch_size=16, collator=LIDCollator(), seed=0)
    eval_loader = DataLoader(ds, batch_size=16, collator=LIDCollator(),
                             shuffle=False, drop_last=False)
    ccfg = clf.ClassifierConfig(input_dim=cfg.d_model, hidden_dims=(32,),
                                num_classes=2, dropout=0.0, languages=LANGS)
    p = clf.init_classifier(jax.random.PRNGKey(5), ccfg)
    trainer = LIDTrainer(cfg, params, p, ccfg,
                         LIDTrainingArgs(learning_rate=5e-3, weight_decay=0.0,
                                         warmup_steps=5, max_steps=150,
                                         eval_steps=150, scheduler="constant",
                                         mixed_precision="no"))
    hist = trainer.train(loader, eval_loader)
    acc0 = hist["eval"][0]["accuracy"]
    acc1 = hist["eval"][-1]["accuracy"]
    assert acc1 > max(acc0, 0.9), f"LID did not learn: {acc0} -> {acc1}"
    assert len(hist["eval"][-1]["confusion_matrix"]) == 2


def test_lid_cached_features_path(world):
    """train_cached/evaluate_cached (frozen-encoder feature cache) learn the
    same task as the streaming path and evaluate_cached agrees with
    evaluate() on identical params."""
    cfg, params = world
    datasets = {l: SyntheticASRDataset(cfg, size=24, language=l, language_id=i,
                                       seed=i)
                for i, l in enumerate(LANGS)}
    ds = LIDDataset(datasets, LANGS, balance=True)
    coll = LIDCollator()
    loader = DataLoader(ds, batch_size=16, collator=coll, shuffle=False,
                        drop_last=False)
    ccfg = clf.ClassifierConfig(input_dim=cfg.d_model, hidden_dims=(32,),
                                num_classes=2, dropout=0.0, languages=LANGS)
    p = clf.init_classifier(jax.random.PRNGKey(5), ccfg)
    trainer = LIDTrainer(cfg, params, p, ccfg,
                         LIDTrainingArgs(learning_rate=5e-3, weight_decay=0.0,
                                         warmup_steps=5, max_steps=150,
                                         eval_steps=150, scheduler="constant",
                                         mixed_precision="no"))
    feats, labels = trainer.precompute_features(loader)
    assert feats.shape[0] == len(ds) and labels.shape == (len(ds),)

    # evaluate_cached == evaluate on the SAME (untrained) params.
    m_stream = trainer.evaluate(loader)
    m_cached = trainer.evaluate_cached(feats, labels)
    assert m_cached["confusion_matrix"] == m_stream["confusion_matrix"]
    assert abs(m_cached["accuracy"] - m_stream["accuracy"]) < 1e-9

    hist = trainer.train_cached(feats, labels, batch_size=16,
                                eval_feats=feats, eval_labels=labels)
    acc0 = hist["eval"][0]["accuracy"]
    acc1 = hist["eval"][-1]["accuracy"]
    assert acc1 > max(acc0, 0.9), f"cached LID did not learn: {acc0} -> {acc1}"


def test_encoder_layer_travels_with_classifier(world, tmp_path, rng):
    """The tap layer is part of ClassifierConfig: it survives save/load,
    inference paths honor it, and LIDTrainer refuses a mismatched pairing
    (a head trained on layer-k features must never be fed layer -1 ones)."""
    cfg, params = world
    ccfg = clf.ClassifierConfig(input_dim=cfg.d_model, hidden_dims=(16,),
                                num_classes=2, languages=LANGS,
                                encoder_layer=0)
    p = clf.init_classifier(jax.random.PRNGKey(0), ccfg)
    clf.save_classifier(tmp_path / "c", p, ccfg)
    _, loaded, _ = clf.load_classifier(tmp_path / "c")
    assert loaded.encoder_layer == 0
    # Old checkpoints (no encoder_layer key) default to -1.
    legacy = clf.ClassifierConfig.from_dict(
        {k: v for k, v in ccfg.to_dict().items() if k != "encoder_layer"})
    assert legacy.encoder_layer == -1

    # Router feature extraction taps the configured layer.
    from sar_tpu.models import lora as lora_lib
    lcfg = lora_lib.LoraConfig(r=2, alpha=4)
    bank = lora_lib.stack_adapters(
        [lora_lib.init_lora(jax.random.PRNGKey(i), cfg, lcfg)
         for i in range(2)])
    router = AdapterRouter(cfg=cfg, base_params=params, bank=bank,
                           lora_cfg=lcfg, clf_params=p, clf_cfg=ccfg)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, cfg.num_mel_bins, cfg.num_audio_frames)), jnp.float32)
    got = router.extract_encoder_features(mel)
    want = clf.encode_features(params, mel, cfg, layer_index=0, flash=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=0)

    with pytest.raises(ValueError, match="encoder_layer"):
        LIDTrainer(cfg, params, p, ccfg,
                   LIDTrainingArgs(encoder_layer=-1, mixed_precision="no"))


def test_lid_checkpoint_resume(world, tmp_path):
    """save_checkpoint stores optimizer state + step; load_checkpoint restores
    them (parity with the reference's training_state.pt,
    /root/reference/scripts/train_router.py:533-550)."""
    cfg, params = world
    datasets = {l: SyntheticASRDataset(cfg, size=16, language=l, language_id=i,
                                       seed=i)
                for i, l in enumerate(LANGS)}
    ds = LIDDataset(datasets, LANGS)
    loader = DataLoader(ds, batch_size=8, collator=LIDCollator(), seed=0)
    ccfg = clf.ClassifierConfig(input_dim=cfg.d_model, hidden_dims=(16,),
                                num_classes=2, dropout=0.0, languages=LANGS)
    args = LIDTrainingArgs(learning_rate=5e-3, warmup_steps=1, max_steps=4,
                           eval_steps=0, mixed_precision="no")
    t1 = LIDTrainer(cfg, params, clf.init_classifier(jax.random.PRNGKey(5),
                                                     ccfg), ccfg, args)
    t1.train(loader)
    t1.save_checkpoint(tmp_path / "ck")

    t2 = LIDTrainer(cfg, params, clf.init_classifier(jax.random.PRNGKey(6),
                                                     ccfg), ccfg, args)
    t2.load_checkpoint(tmp_path / "ck")
    assert t2.global_step == 4
    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(t1.opt_state), jax.tree.leaves(t2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_router_strategies_and_generate(world, tmp_path):
    cfg, params = world
    # Two adapters with distinct (random) deltas.
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, dropout=0.0)
    banks = []
    for seed in (1, 3):
        b = lora_lib.init_lora(jax.random.PRNGKey(seed), cfg, lcfg)
        leaves, td = jax.tree.flatten(b)
        keys = jax.random.split(jax.random.PRNGKey(seed + 10), len(leaves))
        banks.append(jax.tree.unflatten(
            td, [jax.random.normal(k, l.shape) * 0.05 for k, l in zip(keys, leaves)]))
    bank = lora_lib.stack_adapters(banks)

    ccfg = clf.ClassifierConfig(input_dim=cfg.d_model, hidden_dims=(32,),
                                num_classes=2, dropout=0.0, languages=LANGS)
    clf_params = clf.init_classifier(jax.random.PRNGKey(5), ccfg)

    router = AdapterRouter(cfg, params, bank, lcfg, clf_params, ccfg,
                           strategy="hard", threshold=0.7)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 64)), jnp.float32)
    labels = jnp.asarray(rng.integers(10, 100, (2, 6)), jnp.int32)

    hard = router.forward(mel, labels, strategy="hard")
    assert np.isfinite(float(hard["loss"]))
    assert hard["logits"].shape == (2, 6, cfg.vocab_size)

    soft = router.forward(mel, labels, strategy="soft")
    assert np.isfinite(float(soft["loss"]))
    # Soft logits = prob-weighted mix, different from hard in general.
    assert soft["logits"].shape == hard["logits"].shape

    thr = router.forward(mel, labels, strategy="threshold")
    assert "loss" in thr

    # Routed generation: language override and detection paths.
    out_override = router.generate(mel, language="german", max_new_tokens=6)
    out_detect = router.generate(mel, max_new_tokens=6)
    assert out_override.shape == out_detect.shape
    P = router.prompt_len
    # Override path must use the german prompt token on every row.
    assert (np.asarray(out_override)[:, 1] == cfg.lang_token_id("german")).all()

    # Save/load round trip.
    router.save(tmp_path / "router")
    r2 = AdapterRouter.load(tmp_path / "router", cfg, params)
    out2 = r2.generate(mel, language="german", max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(out_override), np.asarray(out2))


def test_router_hard_matches_single_adapter_path(world):
    """Routed hard decode must equal running each sample through its own
    adapter — the correctness claim of the BGMV design."""
    cfg, params = world
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, dropout=0.0)
    banks = []
    for seed in (1, 3):
        b = lora_lib.init_lora(jax.random.PRNGKey(seed), cfg, lcfg)
        leaves, td = jax.tree.flatten(b)
        keys = jax.random.split(jax.random.PRNGKey(seed + 10), len(leaves))
        banks.append(jax.tree.unflatten(
            td, [jax.random.normal(k, l.shape) * 0.05 for k, l in zip(keys, leaves)]))
    bank = lora_lib.stack_adapters(banks)
    ccfg = clf.ClassifierConfig(input_dim=cfg.d_model, hidden_dims=(32,),
                                num_classes=2, dropout=0.0, languages=LANGS)
    clf_params = clf.init_classifier(jax.random.PRNGKey(5), ccfg)
    router = AdapterRouter(cfg, params, bank, lcfg, clf_params, ccfg)

    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 64)), jnp.float32)

    from sar_tpu.decode import greedy_decode
    routed = {}
    for li, lang in enumerate(LANGS):
        enc = whisper.encode(params, mel, cfg, lora=banks[li], lora_scale=lcfg.scale)
        prompt = jnp.asarray(cfg.prompt_ids(lang), jnp.int32)
        routed[lang] = greedy_decode(params, enc, cfg, prompt, max_new_tokens=6,
                                     lora=banks[li], lora_scale=lcfg.scale)

    for li, lang in enumerate(LANGS):
        out = router.generate(mel, language=lang, max_new_tokens=6)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(routed[lang]))


def test_language_classifier_class_handle(world, rng, tmp_path):
    """The parity-named LanguageClassifier class is a real, callable handle."""
    from sar_tpu.models import LanguageClassifier
    ccfg = clf.ClassifierConfig(input_dim=64, hidden_dims=(16,), num_classes=2,
                                dropout=0.0, languages=("a", "b"))
    model = LanguageClassifier(ccfg, seed=1)
    x = _feats(rng, 3)
    out = model(x, labels=jnp.asarray([0, 1, 0]))
    assert out["logits"].shape == (3, 2) and np.isfinite(float(out["loss"]))
    labels, probs = model.predict(x)
    assert labels.shape == (3,)
    names, _ = model.predict_language(x)
    assert set(names) <= {"a", "b"}
    model.save(tmp_path / "clf")
    again = LanguageClassifier.load(tmp_path / "clf")
    np.testing.assert_allclose(np.asarray(model(x)["logits"]),
                               np.asarray(again(x)["logits"]), atol=1e-6)
