"""PHOC (Pyramidal Histogram Of Characters) descriptor, 604-d.

Three interchangeable implementations of the same bit-exact layout
(reference: pythia/utils/phoc/src/cphoc.c:12-113 and build_phoc.py:9-14):

  * `build_phoc_batch` / `build_phoc` — native C++ extension (fast host path,
    compiled on demand from vitxtgqa_tpu/native/cphoc.cpp)
  * `phoc_numpy` / `phoc_batch_numpy` — vectorised numpy (fallback + parity
    oracle in tests)
  * `phoc_jax` — jit-able batched version over padded char-id arrays for
    on-device preprocessing graphs

Layout: levels 2..5 over 36 unigrams [a-z0-9] (14 regions x 36 = 504), then
level 2 over 50 common bigrams (2 x 50 = 100).  A region bit is set when the
region covers >= 0.5 of the character (or bigram) span.
"""

from __future__ import annotations

import functools
from typing import Iterable, List, Optional

import numpy as np

PHOC_DIM = 604
UNIGRAMS = "abcdefghijklmnopqrstuvwxyz0123456789"
BIGRAMS = [
    "th", "he", "in", "er", "an", "re", "es", "on", "st", "nt",
    "en", "at", "ed", "nd", "to", "or", "ea", "ti", "ar", "te",
    "ng", "al", "it", "as", "is", "ha", "et", "se", "ou", "of",
    "le", "sa", "ve", "ro", "ra", "ri", "hi", "ne", "me", "de",
    "co", "ta", "ec", "si", "ll", "so", "na", "li", "la", "el",
]
_UNIGRAM_IDX = {c: i for i, c in enumerate(UNIGRAMS)}
_BIGRAM_IDX = {b: i for i, b in enumerate(BIGRAMS)}
# starting region offset (in units of 36) for each pyramid level
_LEVEL_START = {2: 0, 3: 2, 4: 5, 5: 9}
_BIGRAM_OFFSET = 14 * 36  # 504

# (level, region) pairs flattened: 2+3+4+5 = 14 regions
_LEVELS = np.concatenate([np.full(l, l) for l in (2, 3, 4, 5)]).astype(np.float32)
_REGIONS = np.concatenate([np.arange(l) for l in (2, 3, 4, 5)]).astype(np.float32)
_REGION_BASE = (
    np.concatenate([np.arange(l) + _LEVEL_START[l] for l in (2, 3, 4, 5)])
    .astype(np.int64)
)


def normalize_token(token: str) -> str:
    """Lowercase and keep only [a-z0-9]."""
    return "".join(c for c in token.lower() if c in _UNIGRAM_IDX)


def _occupancy(span0: np.ndarray, span1: np.ndarray) -> np.ndarray:
    """[K] spans x 14 regions -> bool [K, 14] occupancy per region."""
    r0 = _REGIONS / _LEVELS  # [14]
    r1 = (_REGIONS + 1.0) / _LEVELS
    lo = np.maximum(span0[:, None], r0[None, :])
    hi = np.minimum(span1[:, None], r1[None, :])
    return (hi - lo) / (span1 - span0)[:, None] >= 0.5


def phoc_numpy(token: str) -> np.ndarray:
    """Single-token PHOC, float32 [604]."""
    word = normalize_token(token)
    out = np.zeros(PHOC_DIM, dtype=np.float32)
    n = len(word)
    if n == 0:
        return out

    chars = np.array([_UNIGRAM_IDX[c] for c in word], dtype=np.int64)
    pos = np.arange(n, dtype=np.float32)
    occ = _occupancy(pos / n, (pos + 1) / n)  # [n, 14]
    ci, ri = np.nonzero(occ)
    out[_REGION_BASE[ri] * 36 + chars[ci]] = 1.0

    if n >= 2:
        bigram_ids = np.array(
            [_BIGRAM_IDX.get(word[i : i + 2], -1) for i in range(n - 1)],
            dtype=np.int64,
        )
        valid = bigram_ids >= 0
        if valid.any():
            pos2 = np.arange(n - 1, dtype=np.float32)
            occ2 = _occupancy(pos2 / n, (pos2 + 2) / n)[:, :2]  # level-2 only
            bi, ri2 = np.nonzero(occ2 & valid[:, None])
            out[_BIGRAM_OFFSET + ri2 * 50 + bigram_ids[bi]] = 1.0
    return out


def phoc_batch_numpy(tokens: Iterable[str]) -> np.ndarray:
    return np.stack([phoc_numpy(t) for t in tokens]) if tokens else np.zeros(
        (0, PHOC_DIM), np.float32
    )


# ---------------------------------------------------------------------------
# native extension dispatch
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def _native():
    try:
        from vitxtgqa_tpu.native.build import build_cphoc

        build_cphoc()
        from vitxtgqa_tpu.native import _cphoc  # type: ignore

        return _cphoc
    except Exception:
        return None


def build_phoc(token: str) -> np.ndarray:
    """[604] float32; native if available, numpy otherwise."""
    mod = _native()
    if mod is None:
        return phoc_numpy(token)
    return np.array(mod.build_phoc(token), dtype=np.float32)


def build_phoc_batch(tokens: List[str]) -> np.ndarray:
    """[N, 604] float32 over a token list (the 960-slot OCR grid hot path).

    Returns a READ-ONLY zero-copy view over the native extension's bytes
    output (consumers copy into their padded buffers anyway; the old
    defensive .copy() cost ~3 ms/sample on the host path)."""
    mod = _native()
    if mod is None:
        return phoc_batch_numpy(tokens)
    raw = mod.build_phoc_batch(tokens)
    return np.frombuffer(raw, dtype=np.float32).reshape(len(tokens), PHOC_DIM)


# ---------------------------------------------------------------------------
# jax on-device batch variant
# ---------------------------------------------------------------------------

def encode_tokens_for_jax(
    tokens: List[str], max_len: int = 24
) -> "tuple[np.ndarray, np.ndarray]":
    """Host-side prep: tokens -> (char ids [N, max_len] int32, lengths [N]).

    Char id = index into UNIGRAMS; padding slots are 0 and masked by length.
    """
    n = len(tokens)
    ids = np.zeros((n, max_len), dtype=np.int32)
    lengths = np.zeros((n,), dtype=np.int32)
    for i, t in enumerate(tokens):
        w = normalize_token(t)[:max_len]
        lengths[i] = len(w)
        for j, c in enumerate(w):
            ids[i, j] = _UNIGRAM_IDX[c]
    return ids, lengths


@functools.lru_cache(maxsize=1)
def _jax_tables():
    import jax.numpy as jnp

    bigram_table = -np.ones((36, 36), dtype=np.int32)
    for b, s in enumerate(BIGRAMS):
        bigram_table[_UNIGRAM_IDX[s[0]], _UNIGRAM_IDX[s[1]]] = b
    return (
        jnp.asarray(_LEVELS),
        jnp.asarray(_REGIONS),
        jnp.asarray(_REGION_BASE),
        jnp.asarray(bigram_table),
    )


def phoc_jax(char_ids, lengths):
    """Batched PHOC on device: ([N, L] int32, [N] int32) -> [N, 604] float32.

    Static shapes, pure jnp — safe under jit/vmap/pjit; suitable for the
    on-device preprocessing graph that replaces the reference's per-token C
    calls inside DataLoader workers (reference call site:
    pythia/datasets/processors.py:913-928).
    """
    import jax.numpy as jnp

    levels, regions, region_base, bigram_table = _jax_tables()
    n_tok, max_len = char_ids.shape
    n = jnp.maximum(lengths, 1).astype(jnp.float32)[:, None]  # [N,1]
    pos = jnp.arange(max_len, dtype=jnp.float32)[None, :]  # [1,L]
    valid = pos < lengths[:, None]  # [N,L]

    def occupancy(s0, s1, width):
        # s0/s1: [N,L]; returns [N,L,14] (or [:, :, :2] for bigrams)
        r0 = (regions / levels)[None, None, :]
        r1 = ((regions + 1.0) / levels)[None, None, :]
        lo = jnp.maximum(s0[..., None], r0)
        hi = jnp.minimum(s1[..., None], r1)
        return (hi - lo) / width[..., None] >= 0.5

    # unigrams: scatter-max occupancy bits into [N, 14*36]; invalid
    # contributions are routed to an overflow bucket that is sliced away
    c0, c1 = pos / n, (pos + 1.0) / n
    occ = occupancy(c0, c1, c1 - c0) & valid[..., None]  # [N,L,14]
    uni_idx = region_base[None, None, :] * 36 + char_ids[..., None]  # [N,L,14]
    flat_idx = jnp.where(occ, uni_idx, 14 * 36).reshape(n_tok, -1)
    uni = (
        jnp.zeros((n_tok, 14 * 36 + 1), dtype=jnp.float32)
        .at[jnp.arange(n_tok)[:, None], flat_idx]
        .max(jnp.ones_like(flat_idx, dtype=jnp.float32))[:, : 14 * 36]
    )

    # bigrams: pairs (i, i+1), level-2 regions only
    next_ids = jnp.concatenate(
        [char_ids[:, 1:], jnp.zeros((n_tok, 1), char_ids.dtype)], axis=1
    )
    pair_valid = (pos + 1) < lengths[:, None]  # [N,L] pair starts
    bids = bigram_table[char_ids, next_ids]  # [N,L]
    b0, b1 = pos / n, (pos + 2.0) / n
    occ2 = occupancy(b0, b1, b1 - b0)[..., :2]  # [N,L,2]
    ok = occ2 & (bids >= 0)[..., None] & pair_valid[..., None]
    big_idx = (
        jnp.arange(2, dtype=jnp.int32)[None, None, :] * 50
        + jnp.maximum(bids, 0)[..., None]
    )
    flat_bidx = jnp.where(ok, big_idx, 100).reshape(n_tok, -1)
    big = (
        jnp.zeros((n_tok, 101), dtype=jnp.float32)
        .at[jnp.arange(n_tok)[:, None], flat_bidx]
        .max(jnp.ones_like(flat_bidx, dtype=jnp.float32))[:, :100]
    )

    return jnp.concatenate([uni, big], axis=-1)
