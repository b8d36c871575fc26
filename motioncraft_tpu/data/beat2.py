"""BEAT2 (PantoMatrix) speech-gesture data loading, TPU-native redesign.

Re-implements the capability of the vendored EMAGE loader
(/root/reference/mogen/datasets/EMAGE_2024/dataloaders/beat_motionx.py):
  - train/test split from ``train_test_split.csv`` filtered to
    ``training_speakers`` (:31-121)
  - per recording: SMPL-X flame pose npz (poses [T,165], expressions [T,100],
    trans [T,3]), 16 kHz wav, TextGrid word alignment
  - ``onset+amplitude`` audio representation: amplitude envelope + onset
    impulse train at sample rate (:398-412)
  - fixed-length stride windows (pose_length=64, stride=20 per
    EMAGE_2024/configs/st_mogen_emage.yaml)

Instead of an LMDB+pyarrow cache we cache windows as a single compressed .npz
per (split, speakers, window) config — no native DB dependency, loads in one
mmap-able read, trivially shardable across hosts.  Pre-built reference LMDB
caches are ALSO readable (``Beat2LmdbDataset``): same ``{:005}`` ascii key
layout and 9-tuple sample schema as beat_motionx.py:206-234,747-773, with
legacy-pyarrow or pickle value deserialization.
"""

from __future__ import annotations

import csv
import hashlib
import os
from types import SimpleNamespace
from typing import Dict, List, Optional

import numpy as np


def load_beat2_args(path: Optional[str]) -> SimpleNamespace:
    """YAML config (st_mogen_emage.yaml schema) -> namespace with defaults."""
    cfg = {}
    if path and os.path.isfile(path):
        import yaml
        with open(path) as f:
            cfg = yaml.safe_load(f) or {}
    defaults = dict(
        data_path="./data/datasets/beats2/PantoMatrix/BEAT2/beat_english_v2.0.0/",
        pose_length=64, stride=20, pose_fps=30, audio_sr=16000,
        audio_rep="onset+amplitude", pose_rep="smplxflame_30",
        facial_rep="smplxflame_30", training_speakers=[2], audio_fps=16000,
        cache_path=None, new_cache=False, mean_pose_path=None, std_pose_path=None,
    )
    defaults.update({k: v for k, v in cfg.items() if v is not None})
    return SimpleNamespace(**defaults)


def read_wav(path: str):
    """16-bit PCM wav -> (sr, float32 [-1, 1])."""
    from scipy.io import wavfile
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    return sr, data


def onset_amplitude(wav: np.ndarray, sr: int = 16000) -> np.ndarray:
    """[L] float audio -> [L, 2] (amplitude envelope, onset impulses).

    Fast path: the native C++ spectral-flux extractor (native/audio_features);
    then librosa (matching the reference); then the numpy fallback.
    """
    from .native import onset_amplitude_native
    native = onset_amplitude_native(np.asarray(wav, np.float32))
    if native is not None:
        return native
    L = len(wav)
    try:
        import librosa
        amplitude_envelope = np.abs(wav)
        onset_frames = librosa.onset.onset_detect(y=wav, sr=sr, units="samples")
        onset = np.zeros(L, np.float32)
        onset[np.clip(onset_frames, 0, L - 1)] = 1.0
    except ImportError:
        amplitude_envelope = np.abs(wav).astype(np.float32)
        hop, win = 512, 1024
        n_frames = max(1, (L - win) // hop + 1)
        if n_frames > 2:
            frames = np.lib.stride_tricks.as_strided(
                wav, (n_frames, win), (wav.strides[0] * hop, wav.strides[0])).copy()
            mag = np.abs(np.fft.rfft(frames * np.hanning(win), axis=1))
            flux = np.maximum(mag[1:] - mag[:-1], 0).sum(axis=1)
            flux = flux / (flux.max() + 1e-9)
            thresh = flux.mean() + flux.std()
            peaks = [i for i in range(1, len(flux) - 1)
                     if flux[i] > thresh and flux[i] >= flux[i - 1] and flux[i] >= flux[i + 1]]
            onset = np.zeros(L, np.float32)
            onset[np.clip(np.asarray(peaks, np.int64) * hop, 0, L - 1)] = 1.0
        else:
            onset = np.zeros(L, np.float32)
    return np.stack([amplitude_envelope, onset], axis=1).astype(np.float32)


def parse_textgrid_words(path: str) -> List[tuple]:
    """Minimal Praat TextGrid parser -> [(start_s, end_s, word), ...]."""
    out = []
    if not os.path.isfile(path):
        return out
    xmin = xmax = None
    text = None
    in_words = False
    with open(path, errors="ignore") as f:
        for raw in f:
            line = raw.strip()
            if line.startswith("name"):
                in_words = "words" in line
            if not in_words:
                continue
            if line.startswith("xmin"):
                xmin = float(line.split("=")[1])
            elif line.startswith("xmax"):
                xmax = float(line.split("=")[1])
            elif line.startswith("text"):
                text = line.split("=", 1)[1].strip().strip('"')
                if xmin is not None and xmax is not None:
                    out.append((xmin, xmax, text))
    return out


def load_recordings(args: SimpleNamespace, split: str = "test"):
    """Full-length recordings of a split (for windowed long-form eval):
    yields dicts with pose/facial/trans [T,*], audio [T*spf, 2], words, name."""
    ds = Beat2WindowDataset.__new__(Beat2WindowDataset)
    ds.args, ds.split = args, split
    fps = args.pose_fps
    spf = args.audio_sr // fps
    out = []
    for name in ds._split_recordings():
        pose_file = os.path.join(args.data_path, args.pose_rep, name + ".npz")
        if not os.path.isfile(pose_file):
            continue
        data = np.load(pose_file, allow_pickle=True)
        rec = {"name": name,
               "pose": np.asarray(data["poses"], np.float32),
               "facial": np.asarray(data["expressions"], np.float32),
               "trans": np.asarray(data["trans"], np.float32)}
        if "betas" in data:
            rec["betas"] = np.asarray(data["betas"], np.float32)
        T = len(rec["pose"])
        wav_file = os.path.join(args.data_path, "wave16k", name + ".wav")
        if os.path.isfile(wav_file):
            sr, wav = read_wav(wav_file)
            rec["wav"] = wav
            rec["wav_path"] = wav_file
            rec["audio"] = onset_amplitude(wav, sr)[: T * spf]
        else:
            rec["wav"] = np.zeros(T * spf, np.float32)
            rec["audio"] = np.zeros((T * spf, 2), np.float32)
        tg = parse_textgrid_words(
            os.path.join(args.data_path, "textgrid", name + ".TextGrid"))
        rec["word_spans"] = tg
        out.append(rec)
    return out


class Beat2WindowDataset:
    """Stride-window view over BEAT2 recordings with an npz cache."""

    def __init__(self, args: SimpleNamespace, split: str = "train"):
        self.args = args
        self.split = split
        lmdb_dir = find_lmdb_cache(args, split)
        if lmdb_dir and not args.new_cache:
            vocab = load_vocab(os.path.join(args.data_path, "weights", "vocab.pkl"))
            lm = Beat2LmdbDataset(lmdb_dir, vocab=vocab)
            self._windows = [lm.window(i) for i in range(len(lm))]
            return
        cache = self._cache_file()
        if cache and os.path.isfile(cache) and not args.new_cache:
            data = np.load(cache, allow_pickle=True)
            self._windows = list(data["windows"])
        else:
            self._windows = self._build_windows()
            if cache:
                os.makedirs(os.path.dirname(cache), exist_ok=True)
                np.savez_compressed(cache, windows=np.asarray(self._windows, dtype=object))

    def _cache_file(self) -> Optional[str]:
        if not self.args.cache_path:
            return None
        key = hashlib.md5(repr((self.split, self.args.training_speakers,
                                self.args.pose_length, self.args.stride,
                                self.args.audio_rep)).encode()).hexdigest()[:10]
        return os.path.join(self.args.cache_path, f"beat2_{self.split}_{key}.npz")

    def _split_recordings(self) -> List[str]:
        csv_path = os.path.join(self.args.data_path, "train_test_split.csv")
        names = []
        with open(csv_path) as f:
            for row in csv.reader(f):
                if len(row) < 2:
                    continue
                name, typ = row[0], row[1]
                if typ != self.split and not (self.split == "train" and typ == "additional"):
                    continue
                try:
                    speaker = int(name.split("_")[0])
                except ValueError:
                    continue
                if speaker in self.args.training_speakers:
                    names.append(name)
        return names

    def _build_windows(self) -> List[Dict]:
        windows = []
        fps = self.args.pose_fps
        spf = self.args.audio_sr // fps  # audio samples per frame
        for name in self._split_recordings():
            pose_file = os.path.join(self.args.data_path, self.args.pose_rep,
                                     name + ".npz")
            wav_file = os.path.join(self.args.data_path, "wave16k", name + ".wav")
            tg_file = os.path.join(self.args.data_path, "textgrid", name + ".TextGrid")
            if not os.path.isfile(pose_file):
                continue
            data = np.load(pose_file, allow_pickle=True)
            poses = np.asarray(data["poses"], np.float32)
            facial = np.asarray(data["expressions"], np.float32)
            trans = np.asarray(data["trans"], np.float32)
            T = len(poses)
            audio_feat = None
            if os.path.isfile(wav_file):
                sr, wav = read_wav(wav_file)
                audio_feat = onset_amplitude(wav, sr)
            word_spans = parse_textgrid_words(tg_file)

            n = self.args.pose_length
            for start in range(0, T - n + 1, self.args.stride):
                end = start + n
                win = {"pose": poses[start:end], "facial": facial[start:end],
                       "trans": trans[start:end], "name": name, "start": start}
                if audio_feat is not None:
                    a0, a1 = start * spf, end * spf
                    seg = audio_feat[a0:a1]
                    if len(seg) < (a1 - a0):
                        seg = np.pad(seg, ((0, (a1 - a0) - len(seg)), (0, 0)))
                    win["audio"] = seg
                else:
                    win["audio"] = np.zeros((n * spf, 2), np.float32)
                t0, t1 = start / fps, end / fps
                win["words"] = [w for (s, e, w) in word_spans
                                if w and s < t1 and e > t0]
                windows.append(win)
        return windows

    def __len__(self):
        return len(self._windows)

    def __getitem__(self, idx):
        return self._windows[idx]


# ------------------------------------------------------- reference LMDB cache
def deserialize_lmdb_sample(buf: bytes):
    """Decode one cached sample: legacy ``pyarrow.deserialize`` (what the
    reference wrote, beat_motionx.py:751) when the installed pyarrow still
    has it, else pickle (our own writer / EMAGE's newer caches)."""
    try:
        import pyarrow
        if hasattr(pyarrow, "deserialize"):
            try:
                return pyarrow.deserialize(buf)
            except Exception:
                pass
    except ImportError:
        pass
    import pickle
    return pickle.loads(buf)


class _TolerantUnpickler:
    """Unpickle objects whose defining module is absent (e.g. the EMAGE
    ``Vocab`` class from dataloaders.build_vocab): unknown classes become
    plain attribute bags."""

    def __call__(self, fileobj):
        import pickle

        class Bag:
            def __setstate__(self, state):
                self.__dict__.update(state if isinstance(state, dict) else {})

        class U(pickle.Unpickler):
            def find_class(self, module, name):
                try:
                    return super().find_class(module, name)
                except (ImportError, AttributeError):
                    return type(name, (Bag,), {})

        return U(fileobj).load()


def load_vocab(path: str):
    """EMAGE vocab.pkl -> {index: word} (beat_motionx.py:91-93)."""
    if not os.path.isfile(path):
        return None
    with open(path, "rb") as f:
        obj = _TolerantUnpickler()(f)
    idx2word = getattr(obj, "index2word", None) or (
        obj.get("index2word") if isinstance(obj, dict) else None)
    return dict(idx2word) if idx2word else None


class Beat2LmdbDataset:
    """Read a pre-built EMAGE/MotionCraft BEAT2 LMDB cache.

    Key layout and value schema follow beat_motionx.py:747-773: ascii keys
    ``"{:005}".format(idx)``; values are 9-tuples (pose, audio, facial,
    shape, word, emo, sem, vid, trans).  Pass ``env`` directly to use a
    custom backend (tests inject a dict-backed stub; lmdb is optional)."""

    def __init__(self, lmdb_dir: Optional[str] = None, env=None,
                 vocab: Optional[dict] = None):
        if env is None:
            try:
                import lmdb
            except ImportError as e:
                raise ImportError(
                    "reading a pre-built BEAT2 LMDB cache requires the 'lmdb' "
                    "package (pip install lmdb)") from e
            env = lmdb.open(lmdb_dir, readonly=True, lock=False)
        self.env = env
        with self.env.begin(write=False) as txn:
            self.n_samples = txn.stat()["entries"]
        self.vocab = vocab

    def __len__(self):
        return self.n_samples

    def __getitem__(self, idx: int) -> Dict:
        with self.env.begin(write=False) as txn:
            buf = txn.get("{:005}".format(idx).encode("ascii"))
        if buf is None:
            raise IndexError(idx)
        (pose, audio, facial, shape, word, emo, sem, vid,
         trans) = deserialize_lmdb_sample(buf)
        return {"pose": np.asarray(pose, np.float32),
                "audio": np.asarray(audio, np.float32),
                "facial": np.asarray(facial, np.float32),
                "beta": np.asarray(shape, np.float32),
                "word": np.asarray(word),
                "emo": np.asarray(emo), "sem": np.asarray(sem),
                "id": np.asarray(vid), "trans": np.asarray(trans, np.float32)}

    def window(self, idx: int) -> Dict:
        """Sample -> Beat2WindowDataset-style window dict."""
        s = self[idx]
        pose = s["pose"].reshape(len(s["pose"]), -1)
        audio = s["audio"]
        if audio.ndim == 1:
            # cache built with a raw-wave audio_rep: recompute the 2-channel
            # onset+amplitude features WavEncoder expects (control_cond_feats=2)
            audio = onset_amplitude(np.asarray(audio, np.float32))
        win = {"pose": pose[:, :165], "facial": s["facial"], "trans": s["trans"],
               "audio": audio,
               "name": f"lmdb_{idx:05d}", "start": 0, "beta": s["beta"]}
        words: List[str] = []
        if self.vocab is not None:
            for wid in np.asarray(s["word"]).reshape(-1).tolist():
                w = self.vocab.get(int(wid))
                if w and w not in ("<pad>", "<unk>") and (not words or words[-1] != w):
                    words.append(w)
        win["words"] = words
        return win


def find_lmdb_cache(args: SimpleNamespace, split: str) -> Optional[str]:
    """Locate a pre-built reference cache dir for a split: the reference
    writes {root}{cache_path}{split}/{pose_rep}_cache (beat_motionx.py:94)."""
    cp = getattr(args, "cache_path", None)
    if not cp:
        return None
    for cand in (os.path.join(cp, split, f"{args.pose_rep}_cache"),
                 os.path.join(cp, f"{args.pose_rep}_cache"), cp):
        if os.path.isfile(os.path.join(cand, "data.mdb")):
            return cand
    return None
