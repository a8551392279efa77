"""Context matching: nearest-neighbor search over character context features.

The reference uses a sklearn BallTree on CPU, queried once per frame
(test_fullframework.py:293-296, 443).  On TPU an exact brute-force top-1
over the (clips x 23040) context matrix is a single matmul that fuses into
the frame step — faster than a tree for the few-thousand-entry databases
MOCHA uses, and it keeps the whole streaming loop on-device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def normalize_cnt(cnt, mean, std):
    """(x - mean) / std with cnt_norm statistics; works for single windows
    or batches."""
    return (cnt - mean) / std


def nn_index(query_flat: jnp.ndarray, database_flat: jnp.ndarray,
             db_sq_norms: jnp.ndarray = None) -> jnp.ndarray:
    """Exact top-1 Euclidean neighbor via the matmul expansion
    |q - x|^2 = |q|^2 - 2 q.x + |x|^2 (|q|^2 constant under argmin).

    query_flat: (..., D); database_flat: (M, D).  Returns int32 indices.
    """
    if db_sq_norms is None:
        db_sq_norms = jnp.sum(database_flat * database_flat, axis=-1)
    scores = query_flat @ database_flat.T  # (..., M)
    d2 = db_sq_norms - 2.0 * scores
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)


def nn_index_grouped(query_flat: jnp.ndarray, db_stack_flat: jnp.ndarray,
                     db_sq_stack: jnp.ndarray, group_ids: jnp.ndarray,
                     group_size: int) -> jnp.ndarray:
    """Exact top-1 neighbor of each query against ONLY its group's database
    block, at near-C-independent cost.

    query_flat: (..., S, D) queries for S streams; db_stack_flat: (C, M, D)
    per-character databases; db_sq_stack: (C, M) |x|^2 norms (+inf pad
    rows); group_ids: (S,) int32 character of each stream; group_size:
    static G >= max per-character stream count (callers pass
    ``bincount(group_ids).max()``).

    The masked full-stack form (one (..., S) x (C*M) matmul with other
    characters' rows masked to +inf) pays C*M*D FLOPs per query.  Here
    each stream's query is scattered into its character's row block of a
    (C, G, D) buffer (zero padding for uneven groups) and matched with one
    grouped einsum '...cgd,cmd->...cgm': C*G*M*D total, which is S*M*D —
    the C=1 cost — for an even distribution, and never worse than the
    masked form (G <= S).

    Returns GLOBAL stacked indices (character*M + row), shape (..., S).
    """
    C, M, D = db_stack_flat.shape
    S = group_ids.shape[0]
    G = int(group_size)
    # rank of each stream within its character group (0-based, stable)
    onehot = (group_ids[:, None] == jnp.arange(C, dtype=group_ids.dtype))
    rank = (jnp.cumsum(onehot.astype(jnp.int32), axis=0)
            [jnp.arange(S), group_ids] - 1)
    slot = group_ids.astype(jnp.int32) * G + rank               # (S,)
    lead = query_flat.shape[:-2]
    padded = jnp.zeros(lead + (C * G, D), query_flat.dtype)
    padded = padded.at[..., slot, :].set(query_flat)
    qg = padded.reshape(lead + (C, G, D))
    scores = jnp.einsum("...cgd,cmd->...cgm", qg, db_stack_flat)
    d2 = db_sq_stack[:, None, :].astype(jnp.float32) - 2.0 * scores
    local = jnp.argmin(d2, axis=-1).astype(jnp.int32)           # (..., C, G)
    global_idx = local + (jnp.arange(C, dtype=jnp.int32) * M)[:, None]
    # padded slots are never read back
    return global_idx.reshape(lead + (C * G,))[..., slot]


class ContextIndex:
    """Precomputed normalized context-feature index for one character.

    Equivalent to `BallTree(cha_cnt_nm.reshape(M, -1))`
    (test_fullframework.py:294) but stored as a device matrix; query is a
    jittable function usable inside the streaming scan.
    """

    def __init__(self, cha_cnt: np.ndarray, cnt_mean: np.ndarray,
                 cnt_std: np.ndarray, dtype=jnp.float32):
        nm = (cha_cnt - cnt_mean[None]) / cnt_std[None]
        self.flat = jnp.asarray(nm.reshape(nm.shape[0], -1), dtype)
        self.sq_norms = jnp.sum(self.flat * self.flat, axis=-1)
        self.cnt_mean = jnp.asarray(cnt_mean, dtype)
        self.cnt_std = jnp.asarray(cnt_std, dtype)

    def query(self, src_cnt: jnp.ndarray) -> jnp.ndarray:
        """src_cnt: (..., tokens, dim) raw context feature -> indices."""
        nm = normalize_cnt(src_cnt, self.cnt_mean, self.cnt_std)
        q = nm.reshape(nm.shape[:-2] + (-1,))
        return nn_index(q, self.flat, self.sq_norms)
