"""Learned evaluator models, TPU-native.

- ActorAgnosticEncoder + DistilBERT text tower = the SMPL-X 322 contrastive
  evaluator (MC-Bench), reference mogen/models/rnns/t2m_bigru_smplx.py:65-437.
- T2MContrastiveModel (HumanML3D 263-d, Guo et al.): conv movement encoder +
  bidirectional GRU encoders + GloVe word vectors, reference t2m_bigru.py.

Each registered model is a host-side wrapper exposing ``encode_motion`` /
``encode_text`` over jitted flax modules; pretrained torch checkpoints are
converted by utils/torch_convert.py when an init_cfg Pretrained path exists
(torch-cpu is only used to deserialize the file).
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models.blocks import LayerNorm

from ..models.text_encoder import PostLNEncoderLayer
from ..registry import SUBMODULES


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    pe = np.zeros((max_len, d_model), np.float32)
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def lengths_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    return jnp.arange(max_len)[None, :] < lengths[:, None]


class ActorAgnosticEncoderModule(nn.Module):
    """Transformer + VAE mu/logvar tokens (t2m_bigru_smplx.py:65-198)."""

    nfeats: int
    vae: bool = True
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 4
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, motion, motion_length, train: bool = False):
        B, T, _ = motion.shape
        x = nn.Dense(self.latent_dim, name="skel_embedding")(motion)
        n_tok = 2 if self.vae else 1
        if self.vae:
            mu_token = self.param("mu_token", nn.initializers.normal(1.0), (self.latent_dim,))
            logvar_token = self.param("logvar_token", nn.initializers.normal(1.0),
                                      (self.latent_dim,))
            tokens = jnp.stack([mu_token, logvar_token])[None].repeat(B, axis=0)
        else:
            emb_token = self.param("emb_token", nn.initializers.normal(1.0),
                                   (self.latent_dim,))
            tokens = emb_token[None, None].repeat(B, axis=0)
        xseq = jnp.concatenate([tokens, x], axis=1)
        pe = jnp.asarray(sinusoidal_table(T + n_tok, self.latent_dim))
        xseq = xseq + pe[None]
        mask = jnp.concatenate(
            [jnp.ones((B, n_tok), bool), lengths_to_mask(motion_length, T)], axis=1)
        for i in range(self.num_layers):
            xseq = PostLNEncoderLayer(self.latent_dim, self.num_heads, self.ff_size,
                                      self.dropout, self.activation,
                                      name=f"layer_{i}")(xseq, train=train, key_mask=mask)
        if self.vae:
            return xseq[:, 0], xseq[:, 1]  # mu (dist.loc), logvar
        return xseq[:, 0], None


class DistilBertModule(nn.Module):
    """DistilBERT-base architecture (6 layers, 768 wide, learned positions,
    post-LN, GELU) — enough to host converted distilbert-base-uncased weights."""

    vocab_size: int = 30522
    dim: int = 768
    n_layers: int = 6
    n_heads: int = 12
    hidden_dim: int = 3072
    max_position: int = 512

    @nn.compact
    def __call__(self, input_ids, attention_mask, train: bool = False):
        B, T = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.dim, name="word_embeddings")(input_ids)
        pos = nn.Embed(self.max_position, self.dim, name="position_embeddings")(
            jnp.arange(T)[None].repeat(B, axis=0))
        x = LayerNorm(name="emb_ln")(tok + pos)
        for i in range(self.n_layers):
            x = PostLNEncoderLayer(self.dim, self.n_heads, self.hidden_dim, 0.0,
                                   "gelu", name=f"layer_{i}")(
                x, train=train, key_mask=attention_mask.astype(bool))
        return x


class DistilbertActorAgnosticModule(nn.Module):
    """DistilBERT -> ReLU+proj -> ActorAgnostic trunk (t2m_bigru_smplx.py:284-394)."""

    vae: bool = True
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 4
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    bert_cfg: Optional[dict] = None  # override DistilBERT dims (tests)

    @nn.compact
    def __call__(self, input_ids, attention_mask, train: bool = False):
        text = DistilBertModule(**(self.bert_cfg or {}),
                                name="text_model")(input_ids, attention_mask, train)
        text = jax.lax.stop_gradient(text)  # frozen language model
        x = nn.Dense(self.latent_dim, name="projection")(nn.relu(text))
        B, T, _ = x.shape
        n_tok = 2 if self.vae else 1
        mu_token = self.param("mu_token", nn.initializers.normal(1.0), (self.latent_dim,))
        logvar_token = self.param("logvar_token", nn.initializers.normal(1.0),
                                  (self.latent_dim,))
        tokens = jnp.stack([mu_token, logvar_token])[None].repeat(B, axis=0)
        xseq = jnp.concatenate([tokens, x], axis=1)
        xseq = xseq + jnp.asarray(sinusoidal_table(T + n_tok, self.latent_dim))[None]
        mask = jnp.concatenate([jnp.ones((B, n_tok), bool),
                                attention_mask.astype(bool)], axis=1)
        for i in range(self.num_layers):
            xseq = PostLNEncoderLayer(self.latent_dim, self.num_heads, self.ff_size,
                                      self.dropout, self.activation,
                                      name=f"layer_{i}")(xseq, train=train, key_mask=mask)
        return xseq[:, 0], xseq[:, 1]


class _WordPieceTokenizer:
    """Minimal BERT WordPiece tokenizer given a vocab.txt; hash fallback."""

    def __init__(self, vocab_path: Optional[str] = None, max_len: int = 64):
        self.max_len = max_len
        self.vocab = None
        if vocab_path and os.path.isfile(vocab_path):
            with open(vocab_path) as f:
                self.vocab = {w.strip(): i for i, w in enumerate(f)}

    def _ids(self, text: str) -> List[int]:
        words = text.lower().split()
        if self.vocab is None:
            import hashlib
            return [3 + int(hashlib.md5(w.encode()).hexdigest(), 16) % 30000
                    for w in words]
        ids = []
        for w in words:
            w = "".join(ch for ch in w if ch.isalnum() or ch in "'-")
            if not w:
                continue
            start, sub_ids = 0, []
            while start < len(w):
                end, cur = len(w), None
                while start < end:
                    piece = w[start:end] if start == 0 else "##" + w[start:end]
                    if piece in self.vocab:
                        cur = self.vocab[piece]
                        break
                    end -= 1
                if cur is None:
                    sub_ids = [self.vocab.get("[UNK]", 100)]
                    break
                sub_ids.append(cur)
                start = end
            ids.extend(sub_ids)
        return ids

    def __call__(self, texts: List[str]):
        cls = self.vocab.get("[CLS]", 101) if self.vocab else 101
        sep = self.vocab.get("[SEP]", 102) if self.vocab else 102
        seqs = [[cls] + self._ids(t)[: self.max_len - 2] + [sep] for t in texts]
        L = max(len(s) for s in seqs)
        ids = np.zeros((len(texts), L), np.int32)
        mask = np.zeros((len(texts), L), np.int32)
        for i, s in enumerate(seqs):
            ids[i, :len(s)] = s
            mask[i, :len(s)] = 1
        return ids, mask


@SUBMODULES.register_module()
class T2MContrastiveModel_SMPLX:
    """MC-Bench SMPL-X 322 contrastive evaluator (t2m_bigru_smplx.py:396-437).

    encode_motion / encode_text return the VAE distribution mean (.loc)."""

    def __init__(self, motion_encoder=None, text_encoder=None, init_cfg=None,
                 seed: int = 0):
        te = dict(text_encoder or {})
        modelpath = te.pop("modelpath", None)
        self.tokenizer = _WordPieceTokenizer(
            os.path.join(modelpath, "vocab.txt") if modelpath else None)
        self.motion_module = ActorAgnosticEncoderModule(**(motion_encoder or {"nfeats": 322}))
        self.text_module = DistilbertActorAgnosticModule(
            **{k: v for k, v in te.items() if k != "finetune"})

        key = jax.random.PRNGKey(seed)
        nfeats = (motion_encoder or {}).get("nfeats", 322)
        self.motion_params = self.motion_module.init(
            key, jnp.zeros((1, 8, nfeats)), jnp.full((1,), 8))
        ids, mask = self.tokenizer(["init"])
        self.text_params = self.text_module.init(key, jnp.asarray(ids), jnp.asarray(mask))
        self.pretrained_loaded = False
        if init_cfg and init_cfg.get("type") == "Pretrained":
            ckpt = init_cfg["checkpoint"]
            if os.path.isfile(ckpt):
                if ckpt.endswith(".npz"):
                    # native snapshot from tools/train_protocol_evaluator.py
                    # (motion/... and text/... prefixed flat leaves)
                    from ..utils.checkpoint import load_params
                    tree = load_params(ckpt)
                    self.motion_params = tree["motion"]
                    self.text_params = tree["text"]
                else:
                    from ..utils.torch_convert import load_smplx_evaluator_ckpt
                    self.motion_params, self.text_params = load_smplx_evaluator_ckpt(
                        ckpt, self.motion_params, self.text_params)
                self.pretrained_loaded = True
            else:
                print(f"[T2MContrastiveModel_SMPLX] checkpoint {ckpt} not found; "
                      "using random weights (metrics will not be meaningful)")
        self._encode_motion = jax.jit(
            lambda p, m, l: self.motion_module.apply(p, m, l)[0])
        self._encode_text = jax.jit(
            lambda p, i, a: self.text_module.apply(p, i, a)[0])

    def encode_motion(self, motion, motion_length=None, motion_mask=None, **kwargs):
        motion = jnp.asarray(motion, jnp.float32)
        if motion_length is None:
            motion_length = jnp.full((motion.shape[0],), motion.shape[1])
        motion_length = jnp.asarray(motion_length).reshape(-1)
        return self._encode_motion(self.motion_params, motion, motion_length)

    def encode_text(self, text, token=None, **kwargs):
        ids, mask = self.tokenizer(list(text))
        return self._encode_text(self.text_params, jnp.asarray(ids), jnp.asarray(mask))


class MovementConvEncoderModule(nn.Module):
    """Two stride-2 conv1d blocks + linear (t2m_bigru.py:218-238)."""

    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.hidden_size, (4,), strides=(2,), padding=[(1, 1)], name="conv1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.output_size, (4,), strides=(2,), padding=[(1, 1)], name="conv2")(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Dense(self.output_size, name="out_net")(x)


class BiGRUCoModule(nn.Module):
    """Bidirectional GRU over embedded inputs; concat of final hidden states
    -> 2-layer output net (t2m_bigru.py:171-274)."""

    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, inputs, lengths):
        B, T, _ = inputs.shape
        x = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        h0 = self.param("hidden", nn.initializers.normal(1.0), (2, self.hidden_size))

        fwd = nn.RNN(nn.GRUCell(self.hidden_size, name="gru_fwd"), return_carry=True)
        bwd = nn.RNN(nn.GRUCell(self.hidden_size, name="gru_bwd"), return_carry=True,
                     reverse=True, keep_order=True)
        carry_f, _ = fwd(x, seq_lengths=lengths,
                         initial_carry=jnp.broadcast_to(h0[0], (B, self.hidden_size)))
        carry_b, _ = bwd(x, seq_lengths=lengths,
                         initial_carry=jnp.broadcast_to(h0[1], (B, self.hidden_size)))
        h = jnp.concatenate([carry_f, carry_b], axis=-1)
        h = nn.Dense(self.hidden_size, name="out1")(h)
        h = nn.leaky_relu(LayerNorm(name="out_ln")(h), 0.2)
        return nn.Dense(self.output_size, name="out2")(h)


@SUBMODULES.register_module()
class T2MContrastiveModel:
    """HumanML3D 263-d contrastive evaluator (Guo et al. BiGRU family,
    t2m_bigru.py:277-299).  Text side uses GloVe vectors + POS one-hots from
    ./data/glove when available; random-hash embeddings otherwise."""

    def __init__(self, motion_encoder=None, text_encoder=None, init_cfg=None,
                 seed: int = 0):
        me = dict(motion_encoder or {})
        te = dict(text_encoder or {})
        self.input_size = me.get("input_size", 263)
        self.max_text_len = te.get("max_text_len", 20)
        self.word_size = te.get("word_size", 300)
        self.pos_size = te.get("pos_size", 15)
        self.movement = MovementConvEncoderModule(
            me.get("movement_hidden_size", 512), me.get("movement_latent_size", 512))
        self.motion_gru = BiGRUCoModule(me.get("motion_hidden_size", 1024),
                                        me.get("motion_latent_size", 512))
        self.text_gru = BiGRUCoModule(te.get("hidden_size", 512),
                                      te.get("output_size", 512))
        from ..utils.word_vectorizer import WordVectorizer
        self.w_vectorizer = WordVectorizer("./data/glove", "our_vab",
                                           word_size=self.word_size,
                                           pos_size=self.pos_size)

        key = jax.random.PRNGKey(seed)
        self.movement_params = self.movement.init(key, jnp.zeros((1, 8, self.input_size - 4)))
        self.motion_params = self.motion_gru.init(
            key, jnp.zeros((1, 2, me.get("movement_latent_size", 512))), jnp.full((1,), 2))
        # text input = word_emb + pos projection
        self.text_pos_proj = nn.Dense(self.word_size, name="pos_emb")
        self.text_pos_params = self.text_pos_proj.init(key, jnp.zeros((1, self.pos_size)))
        self.text_params = self.text_gru.init(
            key, jnp.zeros((1, 2, self.word_size)), jnp.full((1,), 2))
        self.pretrained_loaded = False
        if init_cfg and init_cfg.get("type") == "Pretrained" and os.path.isfile(
                init_cfg["checkpoint"]):
            from ..utils.torch_convert import load_t2m_evaluator_ckpt
            (self.movement_params, self.motion_params, self.text_params,
             self.text_pos_params) = load_t2m_evaluator_ckpt(
                init_cfg["checkpoint"], self.movement_params, self.motion_params,
                self.text_params, self.text_pos_params)
            self.pretrained_loaded = True

        def _enc_motion(mp, gp, motion, length):
            moves = self.movement.apply(mp, motion[..., :-4])
            return self.motion_gru.apply(gp, moves, length // 4)

        self._encode_motion = jax.jit(_enc_motion)

        def _enc_text(pp, tp, word_emb, pos_onehot, lens):
            inputs = word_emb + self.text_pos_proj.apply(pp, pos_onehot)
            return self.text_gru.apply(tp, inputs, lens)

        self._encode_text = jax.jit(_enc_text)

    def encode_motion(self, motion, motion_length=None, motion_mask=None, **kwargs):
        motion = jnp.asarray(motion, jnp.float32)
        lengths = jnp.asarray(motion_length).reshape(-1)
        return self._encode_motion(self.movement_params, self.motion_params,
                                   motion, lengths)

    def encode_text(self, text, token=None, **kwargs):
        word_embs, pos_onehots, lens = [], [], []
        for i in range(len(text)):
            toks = (token[i].split(" ") if token and token[i]
                    else [f"{w}/OTHER" for w in str(text[i]).split(" ")])
            if len(toks) < self.max_text_len:
                toks = ["sos/OTHER"] + toks + ["eos/OTHER"]
                slen = len(toks)
                toks = toks + ["unk/OTHER"] * (self.max_text_len + 2 - slen)
            else:
                toks = ["sos/OTHER"] + toks[:self.max_text_len] + ["eos/OTHER"]
                slen = len(toks)
            we, po = zip(*[self.w_vectorizer[t] for t in toks])
            word_embs.append(np.stack(we))
            pos_onehots.append(np.stack(po))
            lens.append(slen)
        return self._encode_text(self.text_pos_params, self.text_params,
                                 jnp.asarray(np.stack(word_embs), jnp.float32),
                                 jnp.asarray(np.stack(pos_onehots), jnp.float32),
                                 jnp.asarray(lens))
