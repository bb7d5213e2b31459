"""Keyframe database: place-recognition queries as one matvec.

Replaces the reference KeyFrameDatabase inverted file
(src/KeyFrameDatabase.cc, include/KeyFrameDatabase.h:89 word->KF lists):
we keep a dense (max_kf, n_words) tf-idf matrix on device; a query is a
single (n_words,) x (n_words, max_kf) matvec — MXU-shaped, no
data-dependent list walking. Candidate splitting into loop vs merge
candidates by map/agent (KeyFrameDatabase.cc:712-730) is a mask the
caller applies to the returned score vector.

Shared across all agents on the server (one instance, rows tagged by
agent) — exactly the design that enables inter-agent loop detection
(ServerSystem.cc:49-63).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from multi_orbslam3_tpu.bow.vocabulary import Vocabulary, assign_words, bow_vector


class KeyframeDatabase(NamedTuple):
    bow: jnp.ndarray      # (max_kf, n_words) float32 normalized tf-idf rows
    active: jnp.ndarray   # (max_kf,) bool
    agent: jnp.ndarray    # (max_kf,) int32 owning agent of each row

    @classmethod
    def empty(cls, max_kf: int, n_words: int) -> "KeyframeDatabase":
        return cls(bow=jnp.zeros((max_kf, n_words), jnp.float32),
                   active=jnp.zeros((max_kf,), bool),
                   agent=jnp.zeros((max_kf,), jnp.int32))


@jax.jit
def add_keyframe_bow(db: KeyframeDatabase, voc: Vocabulary, slot,
                     desc: jnp.ndarray, valid: jnp.ndarray,
                     agent=0):
    """Insert/overwrite row `slot` with the BoW vector of a KF's descriptors.
    Returns (db, words (N,)) — words are reused for feature-level matching.
    """
    words = assign_words(voc, desc, valid)
    v = bow_vector(voc, words)
    return KeyframeDatabase(
        bow=db.bow.at[slot].set(v),
        active=db.active.at[slot].set(True),
        agent=db.agent.at[slot].set(jnp.int32(agent))), words


@jax.jit
def add_keyframes_bow_batch(db: KeyframeDatabase, voc: Vocabulary,
                            slots: jnp.ndarray, desc: jnp.ndarray,
                            valid: jnp.ndarray, agents: jnp.ndarray
                            ) -> KeyframeDatabase:
    """Batched row insert: slots (B,) with -1 for padding rows (routed to
    a sacrificial scatter slot); desc (B, N, 8); valid (B, N). One vmapped
    tree descent + one scatter per server comm cycle instead of per-KF
    dispatches."""
    max_kf = db.bow.shape[0]
    v = jax.vmap(lambda d, m: bow_vector(voc, assign_words(voc, d, m)))(
        desc, valid)
    ok = slots >= 0
    safe = jnp.where(ok, slots, max_kf)

    def scat(arr, vals):
        ext = jnp.concatenate([arr, jnp.zeros_like(arr[:1])], 0)
        return ext.at[safe].set(vals.astype(arr.dtype))[:max_kf]

    return KeyframeDatabase(
        bow=scat(db.bow, v),
        active=scat(db.active, ok),
        agent=scat(db.agent, agents))


@jax.jit
def erase_keyframe_bow(db: KeyframeDatabase, slot) -> KeyframeDatabase:
    return db._replace(bow=db.bow.at[slot].set(0.0),
                       active=db.active.at[slot].set(False))


@jax.jit
def query(db: KeyframeDatabase, voc: Vocabulary, desc: jnp.ndarray,
          valid: jnp.ndarray, exclude: jnp.ndarray) -> jnp.ndarray:
    """Score every database row against a frame's descriptors.

    exclude: (max_kf,) bool — rows to suppress (the query KF's covisible
    neighborhood, reference DetectNBestCandidates connected-KF exclusion).
    Returns (max_kf,) float32 cosine similarities (0 where inactive).
    """
    words = assign_words(voc, desc, valid)
    v = bow_vector(voc, words)
    scores = db.bow @ v
    return jnp.where(db.active & ~exclude, scores, 0.0)


@jax.jit
def query_vector(db: KeyframeDatabase, v: jnp.ndarray,
                 exclude: jnp.ndarray) -> jnp.ndarray:
    """Same as `query` but with a precomputed BoW vector."""
    scores = db.bow @ v
    return jnp.where(db.active & ~exclude, scores, 0.0)
