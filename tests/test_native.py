"""Native C++ data kernels: build, correctness vs numpy, and integration."""

import numpy as np
import pytest

from motioncraft_tpu.data.native import (available, onset_amplitude_native,
                                         stride_windows_native)


@pytest.mark.skipif(not available(), reason="no C++ toolchain")
class TestNative:
    def test_onset_amplitude_matches_envelope(self, rng):
        wav = (rng.randn(16000) * 0.1).astype(np.float32)
        out = onset_amplitude_native(wav)
        assert out.shape == (16000, 2)
        np.testing.assert_allclose(out[:, 0], np.abs(wav), rtol=1e-6)
        assert set(np.unique(out[:, 1])).issubset({0.0, 1.0})

    def test_onsets_fire_on_impulses(self):
        """Clicks in silence must produce onsets near the click positions."""
        sr = 16000
        wav = np.zeros(sr * 2, np.float32)
        clicks = [4000, 12000, 20000, 28000]
        for c in clicks:
            wav[c:c + 200] = np.sin(np.arange(200) * 0.7).astype(np.float32)
        out = onset_amplitude_native(wav)
        onset_pos = np.nonzero(out[:, 1])[0]
        assert len(onset_pos) >= len(clicks) - 1
        for c in clicks:
            assert np.min(np.abs(onset_pos - c)) < 1024, (c, onset_pos)

    def test_stride_windows_matches_numpy(self, rng):
        src = rng.randn(100, 7).astype(np.float32)
        out = stride_windows_native(src, win=30, stride=20)
        assert out.shape == (4, 30, 7)
        for w in range(4):
            np.testing.assert_array_equal(out[w], src[w * 20:w * 20 + 30])

    def test_beat2_uses_native(self, rng):
        from motioncraft_tpu.data.beat2 import onset_amplitude
        wav = (rng.randn(8000) * 0.1).astype(np.float32)
        out = onset_amplitude(wav)
        native = onset_amplitude_native(wav)
        np.testing.assert_array_equal(out, native)
