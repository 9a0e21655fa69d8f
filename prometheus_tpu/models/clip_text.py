"""CLIP text encoder (OpenCLIP ViT-H tower, as used by SD-2.1) + BPE tokenizer.

Replaces the reference's ``transformers.CLIPTextModel`` dependency
(``/root/reference/prometheus/models/mv_ldm.py:46-57,166-176``) with a flax
implementation: vocab 49408, width 1024, 16 heads, 23 transformer layers
(SD-2.1 ships the text tower truncated at the penultimate layer), causal
mask, final layer norm, context length 77.

The tokenizer is a dependency-free CLIP BPE: byte-level pre-encoding + merge
ranks loaded from a ``bpe_simple_vocab_16e6`` merges file (extracted when
converting a published checkpoint bundle). When no vocab file is available
(e.g. hermetic tests) a deterministic hash tokenizer stands in — wrong ids,
right shapes/specials — so every pipeline stage stays executable offline.
"""
from __future__ import annotations

import functools
import gzip
import html
import os
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import scaled_dot_product_attention

Dtype = Any

CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

@functools.lru_cache()
def _bytes_to_unicode():
    """GPT-2 reversible byte<->unicode map."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def _basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text).strip().lower()


class CLIPTokenizer:
    """CLIP BPE tokenizer (merges-file driven; hash fallback without one)."""

    # ASCII approximation of CLIP's \p{L}/\p{N} pattern (stdlib `re` has no
    # unicode property classes); identical on English prompts.
    PAT = re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
        re.IGNORECASE,
    )

    def __init__(self, bpe_path: str | None = None):
        self.byte_encoder = _bytes_to_unicode()
        self.sot = VOCAB_SIZE - 2  # 49406
        self.eot = VOCAB_SIZE - 1  # 49407
        self.bpe_ranks = None
        self.encoder = None
        if bpe_path and os.path.exists(bpe_path):
            opener = gzip.open if bpe_path.endswith(".gz") else open
            with opener(bpe_path, "rt", encoding="utf-8") as fp:
                merges = fp.read().split("\n")
            merges = [tuple(m.split()) for m in merges[1:49152 - 256 - 2 + 1] if m]
            vocab = list(_bytes_to_unicode().values())
            vocab = vocab + [v + "</w>" for v in vocab]
            vocab.extend("".join(m) for m in merges)
            vocab.extend(["<|startoftext|>", "<|endoftext|>"])
            self.encoder = {tok: i for i, tok in enumerate(vocab)}
            self.bpe_ranks = {m: i for i, m in enumerate(merges)}
            self._cache = {}
        elif bpe_path:
            raise FileNotFoundError(
                f"BPE merges file not found: {bpe_path} — refusing to fall "
                "back silently; omit bpe_path to opt into the hash fallback")
        else:
            import warnings

            warnings.warn(
                "CLIPTokenizer constructed WITHOUT a merges file: using the "
                "deterministic hash fallback (wrong token ids, right shapes)."
                " Converted real text-encoder weights need the exact BPE — "
                "pass bpe_path (bpe_simple_vocab_16e6.txt[.gz]).",
                stacklevel=2)

    @property
    def is_exact(self) -> bool:
        return self.bpe_ranks is not None

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word, i = [], 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        text = _basic_clean(text)
        ids: list[int] = []
        for tok in re.findall(self.PAT, text):
            tok_b = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            if self.is_exact:
                ids.extend(self.encoder[t] for t in self._bpe(tok_b).split(" "))
            else:
                # deterministic fallback: stable hash into the BPE id range
                ids.append(hash(tok_b) % (VOCAB_SIZE - 2))
        return ids

    def __call__(self, texts, max_length: int = CONTEXT_LENGTH) -> np.ndarray:
        """Tokenize to padded ``(B, max_length)`` int32 ids (sot ... eot pad=eot...
        CLIP pads with 0 in OpenCLIP; SD's CLIPTokenizer pads with eot). We pad
        with eot to match the HF tokenizer used by the reference."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), max_length), self.eot, dtype=np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot] + self.encode(t)[: max_length - 2] + [self.eot]
            out[i, : len(ids)] = ids
        return out


# ---------------------------------------------------------------------------
# Text transformer
# ---------------------------------------------------------------------------

class CLIPMLP(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(4 * x.shape[-1], dtype=self.dtype, name="fc1")(x)
        # SD-2.1's OpenCLIP ViT-H text tower uses hidden_act='gelu' (exact
        # erf form), unlike original OpenAI CLIP's quick_gelu
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)


class CLIPAttention(nn.Module):
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        b, t, c = x.shape
        d = c // self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, t, self.num_heads, d)
        k = k.reshape(b, t, self.num_heads, d)
        v = v.reshape(b, t, self.num_heads, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits * (d**-0.5) + causal_mask
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        x = x + CLIPAttention(self.num_heads, dtype=self.dtype, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln1")(x), causal_mask)
        x = x + CLIPMLP(dtype=self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="ln2")(x))
        return x


class CLIPTextModel(nn.Module):
    """Returns per-token hidden states ``(B, 77, width)`` (post final LN)."""

    vocab_size: int = VOCAB_SIZE
    width: int = 1024
    num_heads: int = 16
    num_layers: int = 23   # SD-2.1: penultimate-layer text tower
    context_length: int = CONTEXT_LENGTH
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        b, t = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = tok + pos[None, :t].astype(tok.dtype)
        mask = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)[None, None]
        for i in range(self.num_layers):
            x = CLIPLayer(self.num_heads, dtype=self.dtype, name=f"layer_{i}")(
                x, mask)
        return nn.LayerNorm(epsilon=1e-5, name="final_ln")(x)
