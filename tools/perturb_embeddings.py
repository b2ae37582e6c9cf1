"""Derive an all-DISTINCT embedding corpus from a replicated one.

scale_up.py keeps replica vectors byte-identical (ANN tie semantics),
which makes every scale_data SF replica-DENSE at vector grain — the
regime where the rule-7 collapse always wins. The collapse A/B
(BENCH_semdedup_collapse_sf1_r11.json) also needs the opposite
regime: same size, zero byte-duplicate vectors. This applies a
deterministic per-vector perturbation — component (vec_id % dim)
gets += 1e-4 * (1 + vec_id % 997) — tiny against unit-norm-ish
vectors (cosine structure preserved to ~1e-4) but byte-distinct per
vec_id.

Usage: python tools/perturb_embeddings.py SRC.parquet DST.parquet
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    t = pq.read_table(src)
    vec_id = t["vec_id"].to_numpy()
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    idx = (vec_id % dim).astype(int)
    bump = 1e-4 * (1 + (vec_id % 997)).astype(np.float32)
    emb[np.arange(len(emb)), idx] += bump
    dups = len(emb) - len({e.tobytes() for e in emb})
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
