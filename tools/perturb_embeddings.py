"""Derive an all-DISTINCT embedding corpus from a replicated one.

scale_up.py keeps replica vectors byte-identical (ANN tie semantics),
which makes every scale_data SF replica-DENSE at vector grain — the
regime where the rule-7 collapse always wins. The collapse A/B
(BENCH_semdedup_collapse_sf1_r11.json) also needs the opposite
regime: same size, zero byte-duplicate vectors. This applies a
deterministic per-vector perturbation keyed on a 64-bit mix of
vec_id (splitmix64 finalizer) — component (mix % dim) gets
+= 1e-4 * (1 + (mix >> 32) % 997) — tiny against unit-norm-ish
vectors (cosine structure preserved to ~1e-4) but byte-distinct per
vec_id. The old (vec_id % dim, vec_id % 997) keying left replicas
byte-identical whenever their ids were congruent mod lcm(dim, 997)
(ADVICE r11); the hash keying removes the congruence channel, and
the script now REFUSES to write a corpus with any residual
byte-duplicates so a collided corpus can't feed a collapse A/B
unnoticed.

Usage: python tools/perturb_embeddings.py SRC.parquet DST.parquet
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — decorrelates vec_id so no modulus of the
    mixed value is congruent across replicas of different ids."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    t = pq.read_table(src)
    vec_id = t["vec_id"].to_numpy()
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    mix = _splitmix64(vec_id)
    idx = (mix % np.uint64(dim)).astype(int)
    # (idx, bump) space must beat the birthday bound over replica
    # families: dim*997 (~64k) collided once on the 20k-row sf1
    # corpus, so 10 extra fractional bits widen it to ~65M while the
    # 1e-4/1024 granularity stays above float32 ulp at the perturbed
    # component magnitudes (<~0.2). The post-write assert below is
    # the hard backstop either way.
    frac = ((mix >> np.uint64(12)) % np.uint64(1024)).astype(
        np.float64
    ) / 1024.0
    bump = (
        1e-4 * (1 + (mix >> np.uint64(32)) % np.uint64(997) + frac)
    ).astype(np.float32)
    emb[np.arange(len(emb)), idx] += bump
    dups = len(emb) - len({e.tobytes() for e in emb})
    if dups:
        raise SystemExit(
            f"REFUSING to write: {dups} byte-duplicate rows remain "
            "after perturbation — an 'all-distinct' corpus with "
            "residual duplicates would silently bias the collapse A/B"
        )
    out = pa.table(
        {
            "vec_id": t["vec_id"],
            "embedding": pa.array(
                list(emb), type=pa.list_(pa.float32())
            ),
            "label": t["label"],
        }
    )
    pq.write_table(out, dst)
    print(f"wrote {len(emb)} vectors (dim {dim}), byte-dup rows: {dups}")


if __name__ == "__main__":
    main()
