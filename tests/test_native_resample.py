"""Native polyphase resampler vs the numpy convolution path.

Both must produce the same samples (shared Kaiser-sinc filter, "same"
alignment); the native path just skips the zero multiplies.
"""

import math
import time

import numpy as np
import pytest

from sar_tpu.data import preprocessing as pp
from sar_tpu.utils.native import native_available, resample_poly

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no native toolchain")


def _numpy_reference(audio, L, M, taps):
    up = np.zeros(len(audio) * L, np.float64)
    up[::L] = audio.astype(np.float64) * L
    return np.convolve(up, taps, mode="same")[::M].astype(np.float32)


@pytest.mark.parametrize("orig_sr,target_sr", [
    (8000, 16000),    # L=2, M=1 (upsample)
    (48000, 16000),   # L=1, M=3 (downsample)
    (22050, 16000),   # L=320, M=441 (heavy rational ratio)
])
def test_native_matches_numpy(orig_sr, target_sr):
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(orig_sr // 10).astype(np.float32)  # 100 ms
    g = math.gcd(orig_sr, target_sr)
    L, M = target_sr // g, orig_sr // g
    taps = pp._design_taps(L, M)
    got = resample_poly(audio, taps, L, M)
    assert got is not None
    want = _numpy_reference(audio, L, M, taps)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_tiny_input_native_and_fallback_agree():
    """Inputs shorter than the filter: both paths must agree in shape and
    values (np.convolve 'same' centers on the LONGER array, so the fallback
    uses full+slice — regression)."""
    orig_sr, target_sr = 22050, 16000
    g = math.gcd(orig_sr, target_sr)
    L, M = target_sr // g, orig_sr // g
    taps = pp._design_taps(L, M)
    audio = np.random.default_rng(2).standard_normal(50).astype(np.float32)
    native = resample_poly(audio, taps, L, M)
    up = np.zeros(len(audio) * L, np.float64)
    up[::L] = audio.astype(np.float64) * L
    half = (len(taps) - 1) // 2
    fallback = np.convolve(up, taps, mode="full")[
        half:half + len(up):M].astype(np.float32)
    assert native.shape == fallback.shape
    np.testing.assert_allclose(native, fallback, rtol=1e-5, atol=1e-6)


def test_resample_uses_native_and_preserves_tone():
    """A pure tone survives 48k->16k resampling with the right length and
    frequency (sanity on the public resample() entry)."""
    sr, f = 48000, 440.0
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * f * t).astype(np.float32)
    out = pp.resample(tone, sr, 16000)
    assert len(out) == 16000
    # Dominant FFT bin should still be 440 Hz.
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * 16000 / len(out)
    assert abs(peak_hz - f) < 2.0
    assert np.abs(out[200:-200]).max() == pytest.approx(1.0, abs=0.05)


def test_native_is_faster_on_heavy_ratio():
    """The polyphase path must beat the full convolution by a wide margin on
    a rational ratio (this is its reason to exist)."""
    orig_sr, target_sr = 22050, 16000
    g = math.gcd(orig_sr, target_sr)
    L, M = target_sr // g, orig_sr // g
    taps = pp._design_taps(L, M)
    audio = np.random.default_rng(1).standard_normal(orig_sr // 4).astype(np.float32)
    t0 = time.perf_counter()
    resample_poly(audio, taps, L, M)
    native_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _numpy_reference(audio, L, M, taps)
    numpy_s = time.perf_counter() - t0
    assert native_s < numpy_s / 5, (native_s, numpy_s)
