"""GloVe word vectorizer for the HumanML3D evaluator
(reference mogen/models/utils/word_vectorizer.py): returns (300-d GloVe
embedding, 15-d POS one-hot) per 'word/POS' token.  When the ./data/glove
assets are absent, falls back to deterministic hash-seeded vectors so the
pipeline stays runnable (metrics then lose meaning but not shape)."""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Tuple

import numpy as np

POS_ENUMERATOR = {
    "VERB": 0, "NOUN": 1, "DET": 2, "ADP": 3, "NUM": 4, "AUX": 5, "PRON": 6,
    "ADJ": 7, "ADV": 8, "Loc_VIP": 9, "Body_VIP": 10, "Obj_VIP": 11,
    "Act_VIP": 12, "Desc_VIP": 13, "OTHER": 14,
}


class WordVectorizer:
    def __init__(self, meta_root: str, prefix: str, word_size: int = 300,
                 pos_size: int = 15):
        self.word_size = word_size
        self.pos_size = pos_size
        self.word2vec = None
        self.word2idx = None
        data_path = os.path.join(meta_root, f"{prefix}_data.npy")
        words_path = os.path.join(meta_root, f"{prefix}_words.pkl")
        idx_path = os.path.join(meta_root, f"{prefix}_idx.pkl")
        if all(os.path.isfile(p) for p in (data_path, words_path, idx_path)):
            vectors = np.load(data_path)
            with open(words_path, "rb") as f:
                words = pickle.load(f)
            with open(idx_path, "rb") as f:
                self.word2idx = pickle.load(f)
            self.word2vec = {w: vectors[self.word2idx[w]] for w in words}

    def _fallback_vec(self, word: str) -> np.ndarray:
        seed = int(hashlib.md5(word.encode()).hexdigest()[:8], 16)
        return np.random.RandomState(seed).randn(self.word_size).astype(np.float32) * 0.1

    def __getitem__(self, item: str) -> Tuple[np.ndarray, np.ndarray]:
        word, _, pos = item.partition("/")
        pos_vec = np.zeros(self.pos_size, np.float32)
        pos_vec[POS_ENUMERATOR.get(pos, POS_ENUMERATOR["OTHER"])] = 1.0
        if self.word2vec is not None and word in self.word2vec:
            word_vec = np.asarray(self.word2vec[word], np.float32)
        else:
            word_vec = self._fallback_vec(word)
        return word_vec, pos_vec
