"""Skew mitigation for hot-key equi-joins.

AQE's skew-join handling (enabled in the session factory) splits
oversized SORT-MERGE partitions at runtime, but it cannot help a
broadcast-replicated pattern the planner never sees, and it does not
apply when the skewed side feeds a window or a streaming stateful op.
``salted_join`` is the explicit form: spread one hot key over
``n_salts`` tasks by appending a salt to the big side's key and
replicating the small side once per salt value.

Cost model: the small side is materialized ``n_salts`` times (explode
is map-side, no shuffle added), the big side's shuffle keys gain
entropy, and the result is bit-identical to the plain join — worth it
exactly when one key's rows exceed what a single task should hold
(the 100 TB regime for power-law keys: users, domains, null-ish
defaults).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    hint: str | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted.

    The salt is ``pmod(hash(<all big columns>), n_salts)`` —
    deterministic per row (no rand(), so retries/speculative tasks
    agree) and uniform enough to split a hot key across tasks. The
    small side is exploded once per salt value, so every
    (key, salt) bucket finds its match.

    Supports ``inner`` and ``left`` joins (the semantics where
    row-level salting is sound; full/right would need the salt on the
    other side).

    ``hint`` (e.g. ``"shuffle_hash"`` / ``"merge"``) is applied to the
    replicated small side immediately below the join. Salting only
    changes anything on a *shuffled* join — if the small side is under
    the broadcast threshold Catalyst will broadcast it and the salt is
    dead weight — so callers forcing the shuffle regime (or testing
    it) pass the strategy here rather than relying on a hint surviving
    the explode/withColumn wrappers this function adds.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_big = big.withColumn(
        SALT, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    replicated = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    if hint is not None:
        replicated = replicated.hint(hint)
    return salted_big.join(replicated, [*keys, SALT], how).drop(SALT)
