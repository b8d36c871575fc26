"""Wav2Vec2 audio feature wrapper.

The vendored EMAGE stack wraps HuggingFace Wav2Vec2 for audio features
(EMAGE_2024/models/utils/wav2vec.py) and the ControlNet config offers
``condition_pre_encode_type='wav2vec'`` as an alternative to the raw
WavEncoder.  transformers ships FlaxWav2Vec2Model; this wrapper uses it when
the pretrained weights are available locally and otherwise reports clearly.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..registry import SUBMODULES


@SUBMODULES.register_module()
class Wav2Vec2Encoder:
    """16 kHz waveform -> hidden features [B, T', 768] via FlaxWav2Vec2."""

    def __init__(self, modelpath: str = "facebook/wav2vec2-base-960h",
                 local_only: bool = True, layer: Optional[int] = None):
        from transformers import FlaxWav2Vec2Model
        self.layer = layer
        self.model = FlaxWav2Vec2Model.from_pretrained(
            modelpath, local_files_only=local_only)

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp
        out = self.model(jnp.asarray(wav, jnp.float32),
                         output_hidden_states=self.layer is not None)
        if self.layer is not None:
            return np.asarray(out.hidden_states[self.layer])
        return np.asarray(out.last_hidden_state)
