"""Deduplication family: exact, fingerprint, n-gram Jaccard,
MinHash-LSH, SimHash.

Scale design: every variant is expressed so the expensive comparison
only happens inside a bucket (hash group, LSH band, shingle match) —
never all-pairs over the corpus. Exact/fingerprint dedup is one
shuffle on the hash; MinHash-LSH shuffles on (band, signature);
shingle-Jaccard shuffles on shingle then on pair.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pos_api_pipeline_spark.llm.text import spread_small_scan, tokens


def portable_hash64(c: Column) -> Column:
    """60-bit non-negative hash = first 15 hex chars of md5, as a
    long. Chosen over xxhash64 for the signature family (MinHash,
    SimHash) because every engine has md5, so a DuckDB oracle can
    reproduce signatures bit-for-bit:
    ``CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)``.
    Still JVM codegen on the Spark side (md5 + conv)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# Exact + fingerprint dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: hash-groupBy on the full text, keep the lowest id.

    One shuffle on md5(text) (fixed 32-byte key — never shuffles the
    documents themselves thanks to Spark's partial min aggregation).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def duplicate_groups(
    df: DataFrame, key: Column, id_col: str = "doc_id"
) -> DataFrame:
    """Groups with >1 member under an arbitrary canonical key
    (e.g. the fingerprint from llm.text.fingerprint)."""
    return (
        df.groupBy(key.alias("dup_key"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# N-gram (shingle) Jaccard near-dup — exact, bucket-joined
# ---------------------------------------------------------------------------


def _asc_seq(n: Column) -> Column:
    """sequence(1, n) that is EMPTY when n < 1 — Spark's sequence()
    runs backwards when start > stop, so an unguarded size-1 array
    would enumerate [1, 0] and hit element_at(…, 0)."""
    return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )





#: Default hot-bucket / replica-family cap for the bucket-pair
#: enumerators and doc-grain expansions below. A bucket (or family) of
#: b members emits b(b−1)/2 pairs — one pathological bucket (millions
#: of byte-identical boilerplate docs landing on the same band hash)
#: is quadratic in a single row. Above the cap, star pairs
#: (representative = smallest id, vs every other member) keep output
#: linear and lossless for connected components. 10k keeps exact
#: all-pairs semantics for every realistic near-dup bucket while
#: bounding the worst case.
DEFAULT_MAX_BUCKET = 10_000

#: Auto-switch threshold for the rule-7 exact-duplicate collapse: the
#: collapsed form wins when replicas are common enough that one
#: shingling/signaturing per DISTINCT text pays for the extra
#: groupBy(text) shuffle and the id-expansion joins. Measured on the
#: driver's sf0.1 corpus (0.16 % duplicates) collapse COSTS 1.4–1.7×
#: across all three text detectors (BENCH_collapse_ab_sf0.1_r10.json),
#: while on 10-way exact-replica corpora it WINS 3.5–4.7×
#: (BENCH_collapse_sf1_r09.json). Collapse turns on when the
#: estimated distinct-text ratio drops to/below this value
#: (≥ 25 % duplicates) — comfortably inside the win regime, and the
#: ~1.5× fixed overhead is roughly paid for by shingling savings
#: alone at that point.
COLLAPSE_AUTO_MAX_DISTINCT = 0.75

#: (applicationId, analyzed-plan semanticHash, text_col) →
#: (distinct ratio, full-probe (rows, hll_distinct) | None).
#: Keyed on the owning SparkContext's applicationId
#: so a session restart in the same process never serves a stale
#: ratio, and FIFO-bounded (r11, ADVICE) so a long-lived driver
#: building many distinct plans can't grow it without limit.
#: Repeated builds of the same query (bench runs each query 3×)
#: still probe the corpus once. Stale only if the files under an
#: identical plan change mid-session — same tradeoff as Spark's own
#: relation statistics cache.
_distinct_ratio_cache: dict = {}
_DISTINCT_RATIO_CACHE_MAX = 256

#: Sampled-probe geometry (r12): the full count+HLL probe reads the
#: whole corpus to pick a plan — at 100 TB that one pass costs more
#: than many of the queries it optimizes. The sampled probe instead
#: re-reads a deterministic stride-picked SUBSET of the corpus's
#: leaf parquet files (``df.inputFiles()``): file subsetting is the
#: only sampling that actually SKIPS bytes — ``df.sample(p)`` still
#: scans every row to flip its coin, saving nothing at the scan
#: level. Needs ≥ MIN_FILES leaf files to be a real subset (local
#: single-file fixtures fall back to the full probe, which is
#: correctly priced at their size anyway).
COLLAPSE_PROBE_MIN_FILES = 8
COLLAPSE_PROBE_MAX_FILES = 32
#: Decision rule on the sampled ratio. File subsampling can only
#: BREAK UP duplicate families (scattered replicas lose members),
#: never create duplicates, so the sampled distinct ratio is biased
#: UP vs the full ratio: a sampled ratio ≤ 0.75 is confident
#: evidence of dense duplication → collapse, no escalation. The
#: ambiguous band (0.75, ESCALATE_MAX] — where the bias could be
#: hiding a just-over-threshold corpus — escalates to the full
#: probe (exact, pays the pass only in the gray zone). Above
#: ESCALATE_MAX the sample is confidently distinct → uncollapsed,
#: the plan that is safe at every duplicate density. Residual risk,
#: documented not hidden: duplication CONCENTRATED in unsampled
#: files (e.g. whole-file copies landing between stride picks) can
#: read as distinct and cost the collapse win — a plan-choice
#: (speed) miss only, never a correctness miss, since collapse is
#: output-neutral. ``SPARK_GRAFT_COLLAPSE_PROBE=full`` pins the
#: exact full-corpus probe back.
COLLAPSE_ESCALATE_MAX = 0.95


def _probe_file_subset(files: list) -> list:
    """Deterministic stride pick of ``n//8`` (clamped to
    [MIN_FILES//2, MAX_FILES]) leaf files from the sorted listing —
    evenly spread so blocked layouts (replicas appended as whole
    file runs) still land picks inside every run longer than the
    stride."""
    files = sorted(files)
    if len(files) < COLLAPSE_PROBE_MIN_FILES:
        return files  # below the subsample gate: nothing to skip
    n_pick = min(
        COLLAPSE_PROBE_MAX_FILES,
        max(COLLAPSE_PROBE_MIN_FILES // 2, len(files) // 8),
    )
    if n_pick >= len(files):
        return files
    stride = len(files) / n_pick
    return [files[int(i * stride)] for i in range(n_pick)]


def _sampled_probe_frame(df: DataFrame, text_col: str):
    """The file-subset frame for the sampled probe, or None when the
    corpus isn't probe-able this way (non-file-backed, too few
    files, non-parquet leaves, or the probed column doesn't survive
    to the raw files — e.g. a derived/normalized text column). A
    transformed corpus (filters/joins above the scan) still probes:
    the RAW file ratio approximates the post-transform ratio, which
    is fine for an output-neutral plan choice."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if len(files) < COLLAPSE_PROBE_MIN_FILES:
        return None
    if not all(f.endswith(".parquet") for f in files):
        return None
    subset = _probe_file_subset(files)
    try:
        sampled = df.sparkSession.read.parquet(*subset)
    except Exception:
        return None
    if text_col not in sampled.columns:
        return None
    return sampled


def _distinct_stats(frame: DataFrame, text_col: str) -> tuple[int, int]:
    """(row count, HLL approx-distinct) of ``text_col`` in ONE
    aggregation — the probe pass every collapse decision rides on."""
    row = frame.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(text_col).alias("d"),
    ).head()
    return int(row["n"]), int(row["d"])


def _distinct_ratio(frame: DataFrame, text_col: str) -> float:
    n, d = _distinct_stats(frame, text_col)
    return (d / n) if n else 1.0


def _resolve_collapse(
    df: DataFrame, text_col: str, collapse_exact: bool | None
) -> bool:
    """Resolve a detector's ``collapse_exact=None`` (auto) via a
    distinct-ratio probe: count + HLL approx-distinct of the text
    column in a single aggregation (the 5 % default rsd is plenty
    against a 0.75 threshold). Explicit True/False pins the choice
    (replica-dense ingests know they're replica-dense;
    already-deduped frames skip the probe entirely).

    .. versionchanged:: round 12
       The probe is SAMPLED by default: a deterministic stride-picked
       subset of the corpus's leaf parquet files (≤
       ``COLLAPSE_PROBE_MAX_FILES``) is re-read and aggregated
       instead of the full corpus — O(32 files) probe cost at any
       corpus size, where the r11 full probe paid a whole corpus
       pass at plan-build time. Sampled ratio ≤ 0.75 → collapse
       (the file-subset ratio is biased up, so this is confident);
       ratio in (0.75, ``COLLAPSE_ESCALATE_MAX``] → escalate to the
       exact full probe (gray zone only); above → uncollapsed.
       Non-file-backed / single-file / non-parquet corpora fall back
       to the full probe. ``SPARK_GRAFT_COLLAPSE_PROBE=full`` pins
       the full probe for every corpus. Decision agreement vs the
       full probe is measured per corpus in
       BENCH_collapse_probe_r12.json.

    NOTE for latency-sensitive plan BUILDERS: the default still makes
    detector construction partially eager (one bounded probe action
    before any action on the returned frame). Set the env var
    ``SPARK_GRAFT_COLLAPSE_AUTO=0`` to keep construction fully lazy —
    ``collapse_exact=None`` then resolves to False (the
    uncollapsed plan, safe at every duplicate density) with no probe.
    See SCALE.md §public-API notes."""
    return _resolve_collapse_stats(df, text_col, collapse_exact)[0]


def _resolve_collapse_stats(
    df: DataFrame, text_col: str, collapse_exact: bool | None
) -> tuple[bool, tuple[int, int] | None]:
    """``_resolve_collapse`` plus the probe's FULL-corpus stats when
    an exact full pass contributed to the decision: returns
    ``(collapse, (row_count, hll_distinct) | None)``. The stats are
    ``None`` for pinned decisions, the kill switch, and sampled-only
    probes — a file-subset's distinct count is only a LOWER bound on
    the corpus's, so it can never certify a memory guard away (see
    ``_cap_guard_skippable``). Full stats come from the
    single-file/in-memory fallback, a gray-band escalation, or
    ``SPARK_GRAFT_COLLAPSE_PROBE=full``."""
    if collapse_exact is not None:
        return collapse_exact, None
    if os.environ.get("SPARK_GRAFT_COLLAPSE_AUTO", "1").lower() in (
        "0",
        "off",
        "false",
    ):
        return False, None
    probe_mode = os.environ.get(
        "SPARK_GRAFT_COLLAPSE_PROBE", "sampled"
    ).lower()
    try:
        key = (
            df.sparkSession.sparkContext.applicationId,
            df._jdf.queryExecution().analyzed().semanticHash(),
            text_col,
            probe_mode,
        )
    except Exception:  # non-JVM frames (tests' mocks): probe uncached
        key = None
    cached = _distinct_ratio_cache.get(key) if key is not None else None
    if cached is None:
        full_stats: tuple[int, int] | None = None
        sampled = (
            _sampled_probe_frame(df, text_col)
            if probe_mode != "full"
            else None
        )
        if sampled is not None:
            ratio = _distinct_ratio(sampled, text_col)
            if COLLAPSE_AUTO_MAX_DISTINCT < ratio <= COLLAPSE_ESCALATE_MAX:
                full_stats = _distinct_stats(df, text_col)
                n, d = full_stats
                ratio = (d / n) if n else 1.0
        else:
            full_stats = _distinct_stats(df, text_col)
            n, d = full_stats
            ratio = (d / n) if n else 1.0
        cached = (ratio, full_stats)
        if key is not None:
            while len(_distinct_ratio_cache) >= _DISTINCT_RATIO_CACHE_MAX:
                _distinct_ratio_cache.pop(
                    next(iter(_distinct_ratio_cache))
                )
            _distinct_ratio_cache[key] = cached
    ratio, full_stats = cached
    return ratio <= COLLAPSE_AUTO_MAX_DISTINCT, full_stats


#: Safety factor applied to the probe's HLL distinct estimate before
#: it may certify the over-cap guard away. With
#: approx_count_distinct's default rsd of 5 %, a k-sigma
#: underestimate means true distinct D = d / (1 − 0.05k), so a
#: factor f covers k ≤ (1 − 1/f)/0.05: 1.4 covers k ≤ 5.7 sigma
#: (1.25 would only cover 4). A wrong certification is not a wrong
#: answer — the in-array star cap still applies, output is
#: identical — it re-opens the unspillable members-array memory
#: regime the guard exists to bound, hence the generous margin.
_HLL_DISTINCT_SAFETY = 1.4


def _cap_guard_skippable(
    full_stats: tuple[int, int] | None,
    max_bucket: int | None,
    collapsed: bool,
) -> bool:
    """True when the collapse probe's exact FULL-corpus pass proves
    no bucket/cluster can exceed ``max_bucket``, so the vector
    family's over-cap stats guard (r12 row-grain star path) would be
    provably empty and its pre-aggregation pass — one extra
    evaluation of the bucket/assignment lineage, measured 1.32× on
    sf10 semantic_dedup (AB_sf10_semantic_dedup_r12.json) — can be
    skipped with bit-identical output. Uncollapsed buckets hold
    corpus ROWS (the exact row count bounds every bucket); collapsed
    buckets hold distinct GROUPS (the HLL distinct estimate bounds
    them, derated by ``_HLL_DISTINCT_SAFETY``). ``None`` stats
    (pinned / kill switch / sampled-only probe) never skip.

    CAVEAT — the stats ride the same applicationId-keyed probe cache
    as the collapse decision, whose documented staleness tradeoff
    ("files under an identical plan change mid-session") was
    output-neutral for the collapse choice but here gates a MEMORY
    guard: a long-lived driver that re-ingests a corpus mid-session
    under an identical plan can stale-certify the guard away while a
    bucket has grown past the cap (the output stays correct via the
    in-array star cap; the memory bound does not). Such drivers
    should set ``SPARK_GRAFT_CAP_GUARD_CERTIFY=0``, which disables
    certification entirely and keeps the guard in every plan."""
    if full_stats is None or max_bucket is None:
        return False
    if os.environ.get(
        "SPARK_GRAFT_CAP_GUARD_CERTIFY", "1"
    ).lower() in ("0", "off", "false"):
        return False
    n, d = full_stats
    bound = d * _HLL_DISTINCT_SAFETY if collapsed else n
    return bound <= max_bucket


def _cap_guard_needed(
    probe_stats: tuple[int, int] | None, max_bucket: int | None
):
    """The per-arm guard predicate the vector detectors share:
    ``needed(collapsed)`` is True when an over-cap stats guard must
    be built — i.e. a cap is configured and nothing certifies it
    empty (see ``_cap_guard_skippable``)."""

    def needed(collapsed: bool) -> bool:
        return max_bucket is not None and not _cap_guard_skippable(
            probe_stats, max_bucket, collapsed
        )

    return needed


def _grouped_by_text(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(_txt, ids) — one row per DISTINCT text with its sorted replica
    ids: the rule-7 exact-duplicate collapse surface shared by the
    jaccard / minhash / simhash near-dup paths. sort_array, NOT
    array_sort: array_sort carries an implicit lambda comparator and
    lambda-bearing plans never canonicalize — with it, every consumer
    of this aggregate plans its own full corpus scan instead of a
    ReusedExchange."""
    return (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        .groupBy("_txt")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
    )


def _expand_rep_pairs(
    rep_pairs: DataFrame,
    grouped: DataFrame,
    value_cols: list[str],
    max_bucket: int | None,
) -> DataFrame:
    """Doc-grain expansion of distinct-text-grain pair rows (rule-7
    collapse): join each side's sorted replica id list from
    ``grouped`` (whose subplan is lambda-free, so the two mapping
    joins reuse one exchange instead of rescanning the corpus), then
    explode within-group i<j pairs for self pairs and (least,
    greatest)-normalized cross products otherwise, carrying
    ``value_cols`` through untouched — replicas share one text, so
    every expanded pair inherits exactly the value the direct doc
    pair would compute.

    Linear expansion guard (``max_bucket``, None disables): a self
    group over the cap emits star id pairs (min id vs each other
    replica) and a cross pair whose fan-out |A|·|B| exceeds the cap
    emits the two stars (a0 × B) ∪ ((A∖a0) × b0) — output stays
    linear in replica-family size; connected components rejoin the
    family through the representative, exactly like the bucket-grain
    star cap."""
    map_a = grouped.select(
        F.element_at("ids", 1).alias("id_a"), F.col("ids").alias("_ids_a")
    )
    map_b = grouped.select(
        F.element_at("ids", 1).alias("id_b"), F.col("ids").alias("_ids_b")
    )
    # shuffle_hash-pinned mapping joins: Catalyst's STATIC size
    # estimate for the post-aggregate rep_pairs is a guess, and at
    # the sf10 probe it picked BuildLeft broadcast — an 8 GB
    # broadcast of 348M pairs that dies at any threshold. Neither
    # side is broadcastable in general (pairs can be billions, the
    # map is one row per distinct text), so pin the scale-safe
    # shuffle hash join with the map slices as build side.
    expanded = rep_pairs.join(map_a.hint("shuffle_hash"), "id_a").join(
        map_b.hint("shuffle_hash"), "id_b"
    )
    return _exploded_id_pairs(
        expanded, F.col("id_a") == F.col("id_b"), value_cols, max_bucket
    )


def _exploded_id_pairs(
    expanded: DataFrame,
    is_self: Column,
    value_cols: list[str],
    max_bucket: int | None,
) -> DataFrame:
    """Doc-grain (id_a, id_b, *value_cols) rows from frames carrying
    ``_ids_a``/``_ids_b`` replica-id arrays — the expansion tail
    shared by ``_expand_rep_pairs`` and the embedding family's
    collapsed pair paths. ``is_self`` marks within-family rows
    (identical id lists).

    TWO-STAGE (see _exploded_member_pairs): explode the LEFT replica
    index first, then emit only that member's pairs — a one-shot
    within/cross array materializes O(family²) structs inside one
    row (gigabytes near the cap). Self rows index the tails
    (1..|A|−1); cross rows index every left member (1..|A|), each
    pairing against B (≤ |B| resident)."""
    ia, ib = F.col("_ids_a"), F.col("_ids_b")
    na, nb = F.size(ia), F.size(ib)
    base = expanded.withColumn("_self", is_self)
    idx = F.when(F.col("_self"), _asc_seq(na - 1)).otherwise(_asc_seq(na))
    lefts = base.select(
        *value_cols,
        "_self",
        "_ids_a",
        "_ids_b",
        F.explode_outer(idx).alias("_i"),
    ).filter(F.col("_i").isNotNull())
    i = F.col("_i")
    ai = F.element_at(ia, i)
    a0, b0 = F.element_at(ia, 1), F.element_at(ib, 1)
    if max_bucket is None:
        self_big = cross_big = F.lit(False)
    else:
        mb = F.lit(max_bucket)
        self_big = na > mb
        cross_big = na.cast("long") * nb > mb
    # Over-cap forms stay linear: a self family emits (a0, each
    # other member) — one pair per index row; a cross pair emits
    # (a0 × B) on the i == 1 row and (ai, b0) singletons after —
    # connected components rejoin the family through the
    # representative, exactly like the bucket-grain star cap.
    self_pairs = F.when(
        self_big,
        F.array(
            F.struct(
                a0.alias("id_a"),
                F.element_at(ia, i + 1).alias("id_b"),
            )
        ),
    ).otherwise(
        F.transform(
            F.slice(ia, i + 1, na - i),
            lambda x: F.struct(ai.alias("id_a"), x.alias("id_b")),
        )
    )
    cross_pairs = F.when(
        cross_big & (i > 1),
        F.array(
            F.struct(
                F.least(ai, b0).alias("id_a"),
                F.greatest(ai, b0).alias("id_b"),
            )
        ),
    ).otherwise(
        F.transform(
            ib,
            lambda b: F.struct(
                F.least(ai, b).alias("id_a"),
                F.greatest(ai, b).alias("id_b"),
            ),
        )
    )
    idp = F.when(F.col("_self"), self_pairs).otherwise(cross_pairs)
    return (
        lefts.select(*value_cols, F.explode_outer(idp).alias("ip"))
        .filter(F.col("ip").isNotNull())
        .select(
            F.col("ip.id_a").alias("id_a"),
            F.col("ip.id_b").alias("id_b"),
            *value_cols,
        )
    )


def word_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column.

    Guarded for short docs: ``sequence(1, k)`` with k < 1 would
    generate a DESCENDING [1, 0] (Spark sequences run backwards when
    start > stop) and slice(…, 0, …) errors — docs with fewer than n
    tokens yield an empty shingle set instead.

    NOTE: as a single Column expression the token subtree is
    re-evaluated per shingle (CollapseProject inlines it) — fine for
    tests and small frames; hot paths should use ``with_shingles``,
    which materializes tokens once per row first (measured 4× faster
    at sf0.1)."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    k = F.size(toks) - (n - 1)
    return F.when(k >= 1, F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )).otherwise(F.array().cast("array<string>"))


def with_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    out_col: str = "shingles",
    hashed: bool = False,
    portable: bool = False,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, shingles) frame in the fast shape: tokens land in a real
    column first, so the shingle transform references an attribute
    instead of re-running split+filter per shingle. Shingle *strings*
    are byte-identical to ``word_shingles`` (whole-text lowercase vs
    per-token lowercase cannot differ across whitespace splits), so
    every downstream hash — Jaccard join keys, MinHash signatures —
    is unchanged.

    ``hashed=True`` emits ``array<long>`` shingle hashes built in the
    SAME projection — consumers that only need hashes must not bolt a
    ``transform(hash)`` on afterwards, because project collapse would
    splice the whole shingle tree into each referencing expression and
    re-evaluate it (measured 4× at sf0.1).

    ``portable`` picks the hash function: xxhash64 (default — fastest,
    right for pure join-key use like the Jaccard inverted index) or
    portable_hash64 (md5-prefix, ~1.3× slower scan, required when the
    hash VALUES must reproduce in the DuckDB oracle — MinHash
    signatures). ``keep_cols`` passes extra columns through untouched
    (e.g. a corpus label for cross-corpus sketches)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    tc = F.col("_toks")
    k = F.size(tc) - (n - 1)
    hash_fn = portable_hash64 if portable else F.xxhash64
    one = (
        (lambda i: hash_fn(F.array_join(F.slice(tc, i, n), " ")))
        if hashed
        else (lambda i: F.array_join(F.slice(tc, i, n), " "))
    )
    empty = F.array().cast("array<long>" if hashed else "array<string>")
    sh = F.when(
        k >= 1,
        F.array_distinct(F.transform(F.sequence(F.lit(1), k), one)),
    ).otherwise(empty)
    # r13: tokenize+shingle+hash is scan-stage work; spread a
    # low-split input across the cluster first (no-op at scale —
    # see text.spread_small_scan).
    base = spread_small_scan(
        df.select(F.col(id_col).alias("id"), F.col(text_col), *keep_cols),
        "id",
    )
    return (
        base
        .withColumn("_toks", toks)
        .withColumn(out_col, sh)
        .select("id", out_col, *keep_cols)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 1000,
    collapse_exact: bool | None = None,
    max_family: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1
    shingle, via the inverted index in bucket form.

    SCALE CONTRACT (r9, closing the one r8 `weak` grade): at
    replica-dense corpora the OUTPUT itself is quadratic in
    duplicate-family size — no index trick fixes that, so the doc-
    grain expansion is bounded by ``max_family`` (default
    ``DEFAULT_MAX_BUCKET``): a replica family (or cross-family
    fan-out) past the cap emits star pairs against the minimum-id
    representative — linear, and connected components (hence every
    dedup decision downstream) are unchanged. ``max_family=None``
    restores the exact all-pairs output for diagnostics. For corpora
    where even candidate generation must stay sub-quadratic, use
    ``minhash_confirmed_pairs`` (LSH + exact-Jaccard verify) — the
    100 TB default.

    Plan: explode (id, n_shingles, shingle-hash) rows → group by
    shingle into sorted member buckets → emit each bucket's i<j pairs
    with an array expression → count shared shingles per pair →
    Jaccard from the counts carried inside the pair. One evaluation
    of the tokenize→shingle tree and two shuffles, total.

    Why not the classic self-equi-join on shingle: lambda-bearing
    plans don't canonicalize, so Spark cannot plan a ReusedExchange
    for the two identical join sides (nor for the count frames joined
    back) — measured 4 full scans of the corpus per run. Bucketing
    pairs sideways keeps exactly one scan, and carrying (id, n) into
    the bucket makes the count join unnecessary.

    Hot-shingle guard: per-bucket pair fan-out is quadratic in the
    shingle's document frequency, and at web scale boilerplate
    shingles (headers, license blurbs) reach DF in the millions —
    O(m²) pairs inside one task. ``max_df`` drops buckets with more
    than that many members BEFORE pair expansion (collecting a hot
    bucket is O(m); only the filter sees it), the standard DF-cap
    from web-scale dedup pipelines (e.g. CCNet). The cost is exact
    recall for pairs whose ONLY overlap is capped shingles — pairs
    that at DF > 1000 have Jaccard ≈ 0 anyway. Pass ``max_df=None``
    for the exact inverted index, or use ``ngram_jaccard_pairs_prefix``
    which prunes hot shingles exactly (PPJoin) at the price of two
    extra shuffles.

    Join keys are 60-bit shingle hashes (portable_hash64): collisions
    are ~2^-60 — negligible. Jaccard is exact integer arithmetic —
    deterministic and oracle-checkable.

    ``collapse_exact=None`` (default) auto-picks via the one-pass
    distinct-ratio probe (``_resolve_collapse``): collapse wins
    3.5–4.7× on replica-dense corpora but costs ~1.4× where nothing
    collapses (both measured — see COLLAPSE_AUTO_MAX_DISTINCT).
    ``True`` groups byte-identical texts before
    shingling and runs the whole index at distinct-text grain —
    crawled corpora are full of exact replicas, and every replica
    multiplies the quadratic bucket fan-out. Output is BIT-IDENTICAL
    to the uncollapsed form while no family trips ``max_family``
    (which only exists at collapsed grain — the uncollapsed
    diagnostic form ignores it): the ``max_df`` cap weighs each bucket by
    its expanded doc count (sum of group sizes), so cap decisions —
    and therefore every pair's surviving-bucket ``shared`` count —
    are unchanged; replica self-pairs are counted per surviving
    bucket exactly like any other pair; and the groupBy(text) subplan
    is lambda-free, so the id-expansion joins at the end reuse its
    exchange instead of rescanning the corpus.
    """
    if _resolve_collapse(df, text_col, collapse_exact):
        return _ngram_jaccard_pairs_collapsed(
            df, text_col, id_col, n, threshold, max_df, max_family
        )
    shingled = with_shingles(df, text_col, id_col, n, hashed=True).withColumn(
        "n_shingles", F.size("shingles")
    )
    # explode_outer + post-filter, NOT explode: inner explode makes
    # InferFiltersFromGenerate synthesize `size(arr)>0 AND isnotnull`
    # and push it to the scan, inlining the whole tokenize→shingle
    # tree into the filter (measured 2× the stage). The outer variant
    # infers nothing; the null row from empty arrays is dropped by a
    # filter on the GENERATED column, which cannot be pushed down.
    exploded = shingled.select(
        "id", "n_shingles", F.explode_outer("shingles").alias("shingle")
    ).filter(F.col("shingle").isNotNull())
    bucket_ok = F.size("members") > 1
    if max_df is not None:
        bucket_ok = bucket_ok & (F.size("members") <= max_df)
    buckets = (
        exploded.groupBy("shingle")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("id"), F.col("n_shingles")))
            ).alias("members")
        )
        .filter(bucket_ok)
    )
    pairs = _exploded_member_pairs(buckets, fields=("n_shingles",))
    shared = pairs.groupBy(
        F.col("p.id_a").alias("id_a"),
        F.col("p.id_b").alias("id_b"),
        F.col("p.n_shingles_a").alias("na"),
        F.col("p.n_shingles_b").alias("nb"),
    ).agg(F.count(F.lit(1)).alias("shared"))
    jaccard = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        shared.withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "shared", "jaccard")
    )


def _ngram_jaccard_pairs_collapsed(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    threshold: float,
    max_df: int | None,
    max_family: int | None,
) -> DataFrame:
    """Distinct-text-grain inverted index (see ngram_jaccard_pairs
    ``collapse_exact``). Bit-parity with the doc-grain form rests on
    three invariants: (1) the DF cap weighs buckets by expanded doc
    count, so the same buckets are dropped; (2) a replica group
    contributes one self entry per surviving bucket, so its pairs'
    ``shared`` counts the same buckets the direct pairs would; (3)
    n_shingles of a group equals every replica's (identical text)."""
    grouped = _grouped_by_text(df, text_col, id_col)
    reps = _reps_of(grouped)
    shingled = with_shingles(
        reps, "_txt", "_rid", n, hashed=True, keep_cols=("grp",)
    ).withColumn("n_shingles", F.size("shingles"))
    exploded = shingled.select(
        "id", "grp", "n_shingles", F.explode_outer("shingles").alias("shingle")
    ).filter(F.col("shingle").isNotNull())
    m = F.col("members")
    # Expanded doc count, NOT distinct-text count: cap decisions (and
    # with them every pair's surviving-bucket shared count) must match
    # the uncollapsed index exactly. Long accumulator: a universal
    # boilerplate shingle can exceed 2^31 docs at the design scale,
    # and an int wrap would silently pass (or fail) the cap.
    weight = F.aggregate(
        m, F.lit(0).cast("long"), lambda acc, g: acc + g["grp"]
    )
    bucket_ok = weight > 1
    if max_df is not None:
        bucket_ok = bucket_ok & (weight <= max_df)
    buckets = (
        exploded.groupBy("shingle")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("id"), F.col("n_shingles"), F.col("grp"))
                )
            ).alias("members")
        )
        .filter(bucket_ok)
    )
    pairs = _exploded_member_pairs(
        buckets, fields=("n_shingles",), include_selfs=True
    )
    shared = pairs.groupBy(
        F.col("p.id_a").alias("id_a"),
        F.col("p.id_b").alias("id_b"),
        F.col("p.n_shingles_a").alias("na"),
        F.col("p.n_shingles_b").alias("nb"),
    ).agg(F.count(F.lit(1)).alias("shared"))
    jaccard = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    rep_pairs = (
        shared.withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "shared", "jaccard")
    )
    # Expand rep pairs back to doc grain (mapping joins reuse
    # grouped's exchange — the corpus is not rescanned), with the
    # linear expansion guard bounding replica-family fan-out.
    return _expand_rep_pairs(
        rep_pairs, grouped, ["shared", "jaccard"], max_family
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    order_by_frequency: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard pairs with PPJoin-style prefix filtering —
    output-equivalent to ``ngram_jaccard_pairs`` but prunes the
    candidate join exactly instead of meeting on every shared shingle.

    The filter (Chaudhuri et al. SSJoin; Bayardo et al. All-Pairs):
    order each doc's shingles by a global total order (ascending
    corpus frequency, rarest first) and keep only the first
    ``|x| − ⌈t·|x|⌉ + 1`` as its *prefix*. If J(A,B) ≥ t then the
    smallest common shingle lies in BOTH prefixes — were it outside
    A's prefix, the overlap could be at most ⌈t·|A|⌉ − 1 < t·|A|,
    contradicting J ≥ t. So equi-joining exploded prefixes loses no
    qualifying pair, while a hot shingle shared by many docs only
    enters the join from docs where it is prefix-rare. A size filter
    (t·|A| ≤ |B|) prunes further before verification; candidates are
    then verified exactly on the full shingle sets.

    Cost shape: one extra shuffle to count shingle frequencies and one
    to sort each doc's shingles, in exchange for a candidate stream
    that scales with *rare*-shingle collisions. On low-entropy corpora
    (the pathological case for the plain inverted index) this is the
    difference between quadratic blowup and near-linear work.
    """
    eps = 1e-9  # guard float ceil at exact multiples; longer prefix is safe
    # No eager size()>0 filter: pushing it below the projection would
    # inline the shingle tree into the scan filter. Empty docs flow
    # through harmlessly (their prefix explodes to a filtered null;
    # they can never appear in a candidate pair).
    shingled = with_shingles(df, text_col, id_col, n, hashed=True).withColumn(
        "n_shingles", F.size("shingles")
    )
    prefix_len = (
        F.col("n_shingles")
        - F.ceil(F.lit(threshold) * F.col("n_shingles") - F.lit(eps))
        + 1
    ).cast("int")
    if order_by_frequency:
        # Rarest-first global order (the PPJoin heuristic): two extra
        # shuffles (frequency count; per-doc sort) buy the smallest
        # possible candidate set — the right trade when collisions
        # dominate, i.e. big corpora with hot shingles.
        exploded = shingled.select(
            "id", "n_shingles", F.explode_outer("shingles").alias("shingle")
        ).filter(F.col("shingle").isNotNull())
        freq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
        ordered = (
            exploded.join(freq, on="shingle")
            .groupBy("id", "n_shingles")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("df_"), F.col("shingle")))
                ).alias("ord")
            )
        )
        pref = ordered.select(
            "id",
            "n_shingles",
            F.explode_outer(
                F.transform(
                    F.slice("ord", F.lit(1), prefix_len), lambda s: s["shingle"]
                )
            ).alias("shingle"),
        ).filter(F.col("shingle").isNotNull())
    else:
        # Hash-value order: any fixed total order keeps the filter
        # exact; sorting each doc's hashes is pure codegen — no
        # frequency shuffle — at the cost of a larger candidate set.
        pref = shingled.select(
            "id",
            "n_shingles",
            F.explode_outer(
                F.slice(F.array_sort("shingles"), F.lit(1), prefix_len)
            ).alias("shingle"),
        ).filter(F.col("shingle").isNotNull())
    a, b = pref.alias("a"), pref.alias("b")
    min_b = F.ceil(F.lit(threshold) * F.col("a.n_shingles") - F.lit(eps))
    min_a = F.ceil(F.lit(threshold) * F.col("b.n_shingles") - F.lit(eps))
    cand = (
        a.join(b, on="shingle")
        .filter(
            (F.col("a.id") < F.col("b.id"))
            & (F.col("b.n_shingles") >= min_b)
            & (F.col("a.n_shingles") >= min_a)
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    full = shingled.select("id", "shingles", "n_shingles")
    ver = cand.join(
        full.select(
            F.col("id").alias("id_a"),
            F.col("shingles").alias("sa"),
            F.col("n_shingles").alias("na"),
        ),
        on="id_a",
    ).join(
        full.select(
            F.col("id").alias("id_b"),
            F.col("shingles").alias("sb"),
            F.col("n_shingles").alias("nb"),
        ),
        on="id_b",
    )
    shared = F.size(F.array_intersect("sa", "sb")).cast("long")
    out = ver.withColumn("shared", shared).withColumn(
        "jaccard", F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    )
    return out.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "shared", "jaccard"
    )


def apply_pair_dedup(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop the higher-id member of every near-dup pair.

    ``pairs`` is any (id_a, id_b) frame from the detectors in this
    module (id_a < id_b by construction). Keep-lowest-id is the
    standard greedy policy: it needs no connected components and one
    anti-join applies it. Chains (a~b, b~c but not a~c) keep only the
    lowest member — see ``connected_components`` for the exact
    group structure when cluster identity matters.
    """
    drop_ids = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop_ids, on=id_col, how="left_anti")


def connected_components(
    pairs: DataFrame, max_iterations: int = 10, strict: bool = True
) -> DataFrame:
    """Connected components over a near-dup pair graph by iterative
    label propagation: every node's label converges to the minimum id
    reachable from it. Returns (id, component).

    Each round is two shuffles (propagate labels across edges, take
    the min per node) and advances labels ONE edge-hop, so convergence
    takes O(diameter) rounds — near-dup clusters are shallow (a hub
    doc connecting its variants), so the default bound is generous.
    Iteration stops early at fixpoint (checked with a cheap count).
    If the fixpoint is NOT reached within ``max_iterations`` the
    labels are wrong for some nodes (one component would get several
    representatives downstream), so ``strict=True`` raises; pass
    strict=False to get the partial labels plus a warning. For deep
    graphs raise max_iterations, or use the large-star/small-star
    algorithm (Kiveris et al.) / GraphFrames-Pregel for O(log n)
    rounds.

    Each round's labels are localCheckpointed (after the convergence
    count has materialized them): DataFrame actions never reuse
    earlier actions' shuffle output, so without the cut each
    convergence check would recompute EVERY previous round from the
    pair detector on up — O(k^2) total work and a plan that deepens
    per round (measured 2.5x on the survivors query). The checkpoint
    both caches the ~node-count rows and truncates the lineage so
    round k's plan is one round deep regardless of k.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=False)
    )
    converged = False
    for _ in range(max_iterations):
        # Each node adopts min(own label, neighbors' labels).
        neighbor_labels = (
            edges.join(labels, edges.dst == labels.id)
            .select(F.col("src").alias("id"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        msg = (
            f"connected_components did not converge within "
            f"{max_iterations} iterations; labels are partial (some "
            f"components carry multiple representatives). Raise "
            f"max_iterations or use a large-star/small-star variant."
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def connected_components_star(
    pairs: DataFrame, max_iterations: int = 20, strict: bool = True
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond"): converges in O(log n) rounds instead of label
    propagation's O(diameter) — the documented scale path for DEEP
    pair graphs (long chains of pairwise near-dups), where
    ``connected_components`` needs one round per hop.

    large-star: every node u sends its strictly-larger neighbors to
    m = min(N(u) ∪ {u}); small-star: edges oriented high→low, every
    node sends ALL its (smaller) neighbors — and itself — to its
    minimum neighbor. Both steps are two shuffles (a min-aggregate
    and a join back), no collect_list, so one hub of any size is
    linear work. On convergence the edge set is a star forest
    (node → component root).

    Convergence is detected by an order-independent edge-set
    checksum (count + two independent hash sums); each round is
    localCheckpointed for the same lineage reasons as
    ``connected_components``. Output: (id, component) for every node
    in ``pairs``, component = minimum id in the component — identical
    labels to ``connected_components`` (property-tested)."""
    # ONE eager checkpoint of the raw pair stream: the pair DETECTOR
    # subtree (LSH banding, bucket expansion, ...) is typically the
    # expensive part, and both derivations below need it — separate
    # eager checkpoints of all_nodes and e each re-ran the detector
    # from the scan up (measured: one full detector pass of the two
    # removed, near_dup_components_star 4.8 -> 3.6 s at sf0.1).
    raw = pairs.select(
        F.col("id_a").cast("long").alias("a"),
        F.col("id_b").cast("long").alias("b"),
    ).localCheckpoint(eager=True)
    # all_nodes from the RAW pairs — a node appearing only in a
    # self-pair (a == a) must still come back as its own singleton
    # component, exactly like connected_components. Lazy: consumed
    # exactly once (the final roots anti-join), so it rides the
    # output action as one cheap scan of the raw checkpoint.
    all_nodes = (
        raw.select(F.col("a").alias("id"))
        .union(raw.select(F.col("b").alias("id")))
        .distinct()
    )
    # Lazy checkpoint: the initial checksum below materializes it —
    # checkpoint-then-checksum as two actions would pay one extra
    # job latency per materialization for nothing.
    e = (
        raw.filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def checksum(edges: DataFrame) -> tuple:
        # XOR-fold: order-independent, overflow-free under ANSI mode
        # (a sum of xxhash64 longs overflows); two independent hash
        # streams make a colliding edge-set change negligible.
        row = edges.select(
            F.xxhash64(F.least("a", "b"), F.greatest("a", "b")).alias("h1"),
            F.xxhash64(
                F.greatest("a", "b"), F.least("a", "b"), F.lit(7)
            ).alias("h2"),
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(h1)").alias("x1"),
            F.expr("bit_xor(h2)").alias("x2"),
        ).first()
        return (row.n, row.x1, row.x2)

    def large_star(edges: DataFrame) -> DataFrame:
        bi = edges.union(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mn = (
            bi.groupBy("a")
            .agg(F.min("b").alias("mb"))
            .select("a", F.least("a", "mb").alias("m"))
        )
        return (
            bi.join(mn, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def small_star(edges: DataFrame) -> DataFrame:
        o = edges.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        mn = o.groupBy("a").agg(F.min("b").alias("m"))
        to_min = (
            o.join(mn, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        self_edge = mn.select("a", F.col("m").alias("b"))
        return to_min.union(self_edge).distinct()

    prev = checksum(e)
    converged = False
    for _ in range(max_iterations):
        # eager=False: the convergence checksum is the action that
        # materializes each round's checkpoint — one Spark job per
        # round instead of checkpoint-job + checksum-job (the same
        # fold connected_components uses for its labels frames).
        e = small_star(large_star(e)).localCheckpoint(eager=False)
        cur = checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        msg = (
            f"connected_components_star did not converge within "
            f"{max_iterations} rounds (pathological for O(log n) — "
            f"check the pair graph)."
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    # Star forest: every non-root points at its root; roots appear
    # only on the b side (or not at all for 2-node components whose
    # root has the self-referencing edge removed).
    labels = e.select(F.col("a").alias("id"), F.col("b").alias("component"))
    if not converged:
        # A non-star edge set can carry several (id, component) rows
        # per node; reduce to the minimum label so downstream
        # consumers (dedupe_corpus_cc) never over-drop on duplicate
        # ids. Labels may still be coarser than true components —
        # the warning above flags that — but output stays one row
        # per node.
        labels = labels.groupBy("id").agg(F.min("component").alias("component"))
    roots = all_nodes.join(
        labels.select("id"), "id", "left_anti"
    ).select("id", F.col("id").alias("component"))
    return labels.union(roots)


def dedupe_corpus_cc(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    algorithm: str = "label_prop",
) -> DataFrame:
    """Exact-group dedup: keep the minimum-id representative of each
    connected component (vs the greedy pairwise policy).

    ``algorithm``: 'label_prop' (O(diameter) rounds — cheapest for
    the shallow clusters near-dup graphs produce) or 'star'
    (large-star/small-star, O(log n) rounds — the deep-chain scale
    path; identical labels, both oracle-checked)."""
    if algorithm == "star":
        comps = connected_components_star(pairs)
    elif algorithm == "label_prop":
        comps = connected_components(pairs)
    else:
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    drop = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, on=id_col, how="left_anti")


def dedupe_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "exact",
    **kwargs,
) -> DataFrame:
    """End-to-end corpus dedup: detect with the chosen method, keep
    one representative per duplicate group/pair.

    methods: 'exact' (byte-identical), 'fingerprint' (token-set),
    'jaccard' (exact n-gram similarity), 'minhash' (LSH candidates —
    the 100 TB path), 'minhash_confirmed' (LSH candidates + exact
    Jaccard verify — the precision-preserving 100 TB path),
    'simhash' (hamming blocks).
    """
    if method == "exact":
        keep = df.groupBy(F.md5(F.col(text_col)).alias("_h")).agg(
            F.min(id_col).alias(id_col)
        )
        return df.join(keep.select(id_col), on=id_col, how="left_semi")
    if method == "fingerprint":
        from pos_api_pipeline_spark.llm.text import fingerprint

        fp = fingerprint(df, text_col, out_col="_fp")
        keep = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
        return df.join(keep.select(id_col), on=id_col, how="left_semi")
    if method == "jaccard":
        pairs = ngram_jaccard_pairs(df, text_col, id_col, **kwargs)
    elif method == "minhash":
        pairs = minhash_lsh_candidates(df, text_col, id_col, **kwargs)
    elif method == "minhash_confirmed":
        pairs = minhash_confirmed_pairs(df, text_col, id_col, **kwargs)
    elif method == "simhash":
        pairs = simhash_near_dups(df, text_col, id_col, **kwargs)
    else:
        raise ValueError(f"unknown dedup method: {method}")
    return apply_pair_dedup(df, pairs, id_col)


# ---------------------------------------------------------------------------
# MinHash + LSH banding — the sub-quadratic scale path
# ---------------------------------------------------------------------------

# Deterministic affine hash family over the Mersenne prime 2^31−1 —
# small enough that a*h+b stays far below int64 overflow (ANSI mode
# errors on overflow), explicit constants so results are reproducible
# across runs/engines (no seeded-model opacity).
_MERSENNE = (1 << 31) - 1
_HASH_A = [3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59,
           61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127,
           131, 137]
_HASH_B = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096,
           8192, 16384, 32768, 65536, 131072, 262144, 524288, 1048576,
           2097152, 4194304, 8388608, 16777216, 33554432, 67108864,
           134217728, 268435456, 536870912, 1073741824, 2147483648]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document MinHash signatures as columns s0..s{k-1}.

    Shape matters for scale: explode shingles to rows, hash each
    shingle ONCE (portable_hash64, JVM codegen), then one groupBy computing
    all k affine mins as map-side-combinable partial aggregates. The
    naive alternative — k array_min(transform(...)) expressions over
    a shared shingle array — re-evaluates the tokenize→shingle→hash
    tree k times per row (measured 8× slower end-to-end at sf0.1).
    The shuffle carries only k minima per (doc, partition).

    Documents with no shingles (fewer than n tokens) drop out.

    ``keep_cols`` rides id-functional extra columns through the
    aggregate (e.g. the replica-group size of the rule-7 collapse).
    """
    # hashed=True: shingle hashes are built inside the shingle
    # projection, so the explode carries 8-byte longs instead of
    # n-gram strings that would be re-hashed row-by-row afterwards.
    # portable=True: signature VALUES must match the DuckDB oracle.
    shingled = with_shingles(
        df, text_col, id_col, n, hashed=True, portable=True,
        keep_cols=keep_cols,
    ).select(
        "id", *keep_cols, F.explode_outer("shingles").alias("h64")
    ).filter(F.col("h64").isNotNull())
    # pmod: defensive vs hash-sign changes (portable_hash64 is already
    # non-negative); reduces into [0, p) before the affine map.
    hashed = shingled.select(
        "id", *keep_cols, F.pmod(F.col("h64"), F.lit(_MERSENNE)).alias("h")
    )
    return hashed.groupBy("id", *keep_cols).agg(
        *[
            F.min(
                F.pmod(
                    F.lit(_HASH_A[j]) * F.col("h") + F.lit(_HASH_B[j]),
                    F.lit(_MERSENNE),
                )
            ).alias(f"s{j}")
            for j in range(num_hashes)
        ]
    )


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, band, bhash) — one row per (document, band), where bhash
    is the md5 of that band's signature rows. This is the LSH join-key
    surface shared by self-dedup (``minhash_lsh_candidates``) and
    cross-corpus dedup (``cross_corpus_near_dups``): two documents are
    near-dup candidates iff they agree on any full band."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes, keep_cols)
    band_struct = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"s{i * rows_per_band + k}")
                            for k in range(rows_per_band)
                        ],
                    )
                ).alias("bhash"),
            )
            for i in range(bands)
        ]
    )
    return sigs.select("id", *keep_cols, F.explode(band_struct).alias("b")).select(
        "id",
        *keep_cols,
        F.col("b.band").alias("band"),
        F.col("b.bhash").alias("bhash"),
    )


def _capped_bucket_pairs(m, all_pairs, star_pairs, max_bucket):
    """all-pairs below the cap, star pairs above (see
    DEFAULT_MAX_BUCKET). ``m`` is the sorted members array column."""
    if max_bucket is None:
        return all_pairs
    return F.when(F.size(m) <= F.lit(max_bucket), all_pairs).otherwise(
        star_pairs
    )


def _pair_struct(
    a: Column, b: Column, fields: tuple[str, ...] = ()
) -> Column:
    """(id_a, {f}_a…, id_b, {f}_b…) struct of two member structs."""
    cols = [a["id"].alias("id_a")]
    cols += [a[f].alias(f"{f}_a") for f in fields]
    cols.append(b["id"].alias("id_b"))
    cols += [b[f].alias(f"{f}_b") for f in fields]
    return F.struct(*cols)


#: Stage-2 window width for the bucket-pair enumerator: member i's
#: tail is sliced into windows of at most this many members, so a
#: generated row never carries more than PAIR_CHUNK member structs
#: (plus the left member) and the per-row pair-array evaluation —
#: the ~2 GB/core local-mode transient on dense-distinct clusters
#: near the 10k cap (r9 residual; worst for the embedding family,
#: whose members carry whole vectors and whose pair_builder runs a
#: d-wide cosine per element) — is bounded by the window, not the
#: bucket. The windows PARTITION the tail (each member lands in
#: exactly one window), so total work and output are unchanged.
PAIR_CHUNK = 1_024


def _exploded_member_pairs(
    buckets: DataFrame,
    fields: tuple[str, ...] = (),
    max_bucket: int | None = None,
    include_selfs: bool = False,
    pair_filter=None,
    pair_builder=None,
    self_entries=None,
    chunk: int | None | str = "default",
) -> DataFrame:
    """One row per bucket pair — the ONE enumerator behind every
    struct-member bucket-pair path (doc-grain jaccard/minhash/
    simhash and the three collapsed detectors). ``buckets`` must
    have a sorted ``members`` array of structs carrying ``id`` plus
    ``fields``; the result has a single ``p`` struct column with
    ``id_a``/``id_b`` plus ``{f}_a``/``{f}_b``.

    TWO-STAGE expansion, not one flattened array: the left index
    explodes first (one row per member i, carrying the members
    array), then each row emits only member i's tail pairs
    ``slice(members, i+1, …)``. A one-shot
    ``flatten(transform(…))`` materializes the whole b(b−1)/2 pair
    array INSIDE ONE ROW — ~50M structs (gigabytes) for a bucket
    near the 10k cap, which is exactly how the sf10 simhash probe
    killed a 48 GB heap (r9). Two-stage keeps resident memory
    O(bucket) while streaming the same total pair count; the star
    cap becomes simply truncating the index sequence to [1] (member
    1's tail IS the star set).

    ``include_selfs`` additionally emits one (g, g) self pair per
    member with ``grp`` > 1 on the i == 1 row, OUTSIDE the cap
    switch: a collapsed replica group owes its within-group pairs
    once per bucket no matter how crowded the bucket is (they expand
    linearly under the ``_expand_rep_pairs`` guard anyway). Requires
    members to carry ``grp``; singleton buckets kept for their self
    entries (grp > 1) get the i == 1 row with an empty tail.

    ``pair_filter`` (a pair-struct → boolean lambda, e.g. the
    simhash hamming predicate) is applied INSIDE the pair array,
    before the explode: a candidate that fails verification must
    never reach the exploded rows or the downstream distinct. On
    the sf10 probe this is the difference between shuffling ~10⁹
    block-collision candidates into distinct (OOM at 48 GB) and
    shuffling only the true near-dups (r9).

    ``pair_builder`` (two member structs → pair struct) overrides
    the default id+fields projection — the embedding family computes
    the pair COSINE inside the builder. ``self_entries`` (members
    array → self-pair array) overrides the default grp-based self
    pairs the same way; passing it implies ``include_selfs``.

    ``chunk`` (r10, default ``PAIR_CHUNK``): member i's tail is
    enumerated in at-most-``chunk``-member windows — the left index
    explodes (i, window) pairs instead of bare i, and each generated
    row slices + evaluates only its window. The windows partition
    the tail, so every pair is still emitted exactly once, and for
    buckets with tails under ``chunk`` (the overwhelming majority)
    the (i, 0) row is byte-for-byte the old two-stage row — zero
    extra rows, one extra int (measured: a separate window-explode
    stage cost 22–28 % at sf0.1; this form is noise-level). What it
    bounds is the per-row pair-array EVALUATION: O(bucket) pair
    structs × a d-wide cosine per element for the embedding family
    ≈ the ~2 GB/core task transient that kept the sf10 simhash
    probe on a 48 GB heap. ``chunk=None`` restores the unwindowed
    tail; the string sentinel ``"default"`` reads the module's
    PAIR_CHUNK at call time (so probes/tests can patch it)."""
    if chunk == "default":
        chunk = PAIR_CHUNK
    m = F.col("members")
    n = F.size(m)
    one = F.sequence(F.lit(1), F.lit(1))
    if self_entries is not None:
        include_selfs = True
    if pair_builder is None:
        pair_builder = lambda a, b: _pair_struct(a, b, fields)  # noqa: E731
    idx = _asc_seq(n - 1)
    if max_bucket is not None:
        idx = F.when(n > F.lit(max_bucket), one).otherwise(idx)
    if include_selfs:
        idx = F.when(n == 1, one).otherwise(idx)
    # Effective per-row window width: capped (star) buckets widen to
    # the whole tail. A star row emits only n−1 pairs (linear), so
    # windowing buys nothing there — but each extra window row copies
    # the FULL members array, i.e. ceil(b/chunk) copies of a b-member
    # array = O(b²/chunk) member copies for a mega-star bucket (the
    # r10 ROADMAP residual). Width = n routes star rows through the
    # cast-only fast path below: one row, one members copy, same
    # pairs. Uncapped large buckets keep chunk-wide windows — their
    # pair work is quadratic and genuinely needs the bound.
    if chunk is not None and max_bucket is not None:
        ck = F.when(n > F.lit(max_bucket), n).otherwise(F.lit(chunk))
    else:
        ck = F.lit(chunk) if chunk is not None else None
    if chunk is None:
        codes = idx
    else:
        # (i, window) codes packed in one long (w·2³² + i): a bucket
        # whose every tail fits one window (n ≤ chunk — the
        # overwhelming majority) takes the cast-only fast path, so
        # its exploded rows are bit-identical to the unwindowed
        # form; only genuinely large buckets pay the nested
        # enumeration, amortized against their quadratic pair work.
        # ceil((n−i)/chunk) windows per member, min 1 so the n == 1
        # self row survives with an empty slice. ``ck`` is the
        # per-row width computed above (= n on capped star rows, so
        # they always satisfy n ≤ ck and take the fast path).
        windowed = F.flatten(
            F.transform(
                idx,
                lambda i: F.transform(
                    F.sequence(
                        F.lit(0),
                        F.greatest(
                            F.lit(0),
                            F.ceil((n - i) / ck).cast("int") - 1,
                        ),
                    ),
                    lambda w: i.cast("long")
                    + w.cast("long") * F.lit(4294967296).cast("long"),
                ),
            )
        )
        codes = F.when(n <= ck, idx.cast("array<bigint>")).otherwise(
            windowed
        )
    # explode_outer + generated-column filter, NOT inner explode:
    # InferFiltersFromGenerate would push size(codes)>0 beneath the
    # aggregate boundary — harmless here (codes is cheap) but kept
    # consistent with the repo-wide discipline.
    lefts = buckets.select(
        "members", F.explode_outer(codes).alias("_c")
    ).filter(F.col("_c").isNotNull())
    c = F.col("_c")
    if chunk is None:
        i, w = c, F.lit(0)
        start, length = i + 1, n - i
    else:
        # Decode to ATTRIBUTES in a projection before the pair
        # transform: the lambda body below evaluates `i` once PER
        # PAIR ELEMENT (element_at(m, i)), so leaving the
        # bitop/cast decode inline re-ran it per pair — measured
        # ~10 % on the sf0.1 detectors.
        lefts = lefts.select(
            "members",
            c.bitwiseAND(F.lit(4294967295)).cast("int").alias("_i"),
            F.shiftright(c, 32).cast("int").alias("_w"),
        )
        i, w = F.col("_i"), F.col("_w")
        # length re-derives the per-row width (star rows: whole
        # tail; others: chunk) — ``ck`` only references
        # size(members), still present in ``lefts``. w is always 0
        # on star rows, so start stays correct under either width.
        start, length = i + 1 + w * F.lit(chunk), ck
    pairs = F.transform(
        F.slice(m, start, length),
        lambda other: pair_builder(F.element_at(m, i), other),
    )
    if include_selfs:
        if self_entries is not None:
            selfs = self_entries(m)
        else:
            selfs = F.transform(
                F.filter(m, lambda g: g["grp"] > 1),
                lambda g: pair_builder(g, g),
            )
        # Self pairs attach to the FIRST window of the i == 1 row
        # only — exactly once per bucket, cap or no cap.
        pairs = F.when(
            (i == 1) & (w == 0), F.concat(pairs, selfs)
        ).otherwise(pairs)
    if pair_filter is not None:
        pairs = F.filter(pairs, pair_filter)
    return lefts.select(F.explode_outer(pairs).alias("p")).filter(
        F.col("p").isNotNull()
    )


def _reps_of(grouped: DataFrame) -> DataFrame:
    """(_rid, grp, _txt) representative frame of a ``_grouped_by_text``
    result: smallest replica id, family size, the distinct text."""
    return grouped.select(
        F.element_at("ids", 1).alias("_rid"),
        F.size("ids").alias("grp"),
        F.col("_txt"),
    )


def lsh_bucket_stats(
    keyed: DataFrame,
    key_cols: list[str],
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """One-row skew audit of an LSH bucket surface (minhash bands,
    simhash blocks, hyperplane buckets): bucket count, largest
    bucket, over-cap bucket count, and the pair count the star cap
    saves vs all-pairs. Run it per round next to the candidate query
    so hot-bucket truncation is observable, not silent."""
    sizes = (
        keyed.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") > 1)
    )
    over = F.col("sz") > max_bucket
    saved = (F.col("sz") * (F.col("sz") - 1)) / 2 - (F.col("sz") - 1)
    return sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("sz").alias("max_bucket_size"),
        F.sum(F.when(over, 1).otherwise(0)).cast("long").alias("n_over_cap"),
        F.sum(F.when(over, saved).otherwise(F.lit(0)))
        .cast("long")
        .alias("pairs_dropped"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    bands_df: DataFrame | None = None,
    collapse_exact: bool | None = None,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` bands of
    ``num_hashes/bands`` rows; docs agreeing on any full band become a
    candidate pair. Pass precomputed ``bands_df`` (``minhash_bands``
    output) to share one signature pass with other consumers.

    The join key is (band_idx, band_hash) — candidates meet in tiny
    buckets; nothing is ever all-pairs. Output: (id_a, id_b,
    n_matching_bands).

    Buckets larger than ``max_bucket`` emit star pairs (smallest id
    vs each other member) instead of all pairs — linear in bucket
    size, so one hot bucket of identical boilerplate can't go
    quadratic. ``max_bucket=None`` restores exact all-pairs. Audit
    truncation with ``lsh_bucket_stats``.

    ``collapse_exact=None`` (default) auto-picks via the one-pass
    distinct-ratio probe (``_resolve_collapse``; measured: collapse
    wins 3.5× on replica-dense corpora, costs 1.6× where nothing
    collapses). ``True`` groups byte-identical texts FIRST
    and runs signaturing + banding + pair enumeration at
    distinct-text grain — crawled corpora are full of exact replicas,
    and each replica re-shingles, re-hashes (num_hashes affine maps
    per shingle), and re-pairs identically. Replicas share one
    signature, so every expanded doc pair inherits exactly the
    ``n_matching_bands`` the direct pair would compute (within-group
    pairs agree on all bands) — BIT-PARITY with the uncollapsed form
    whenever no bucket trips ``max_bucket``. Under the cap, the
    collapse counts DISTINCT texts per bucket (a mega-bucket of
    replicas collapses to one member instead of tripping it) and a
    linear guard applies at expansion grain instead — see
    ``_expand_rep_pairs``. Ignored when ``bands_df`` is passed (a
    precomputed band surface is doc-grain); pass
    ``collapse_exact=False`` to pin exact doc-grain cap semantics
    (e.g. the skew_hot_bucket_star_cap demonstration query).
    """
    if bands_df is None and _resolve_collapse(df, text_col, collapse_exact):
        return _minhash_lsh_candidates_collapsed(
            df, text_col, id_col, n, num_hashes, bands, max_bucket
        )
    banded = (
        bands_df
        if bands_df is not None
        else minhash_bands(df, text_col, id_col, n, num_hashes, bands)
    )
    # Bucket-pair form instead of a self-join on (band, bhash): the
    # lambda-free but multi-stage signature pipeline would be fully
    # recomputed for each join side (lambda-bearing subtrees upstream
    # defeat exchange reuse). One evaluation, two shuffles.
    buckets = (
        banded.groupBy("band", "bhash")
        .agg(
            F.array_sort(F.collect_list(F.struct("id"))).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    pairs = _exploded_member_pairs(buckets, max_bucket=max_bucket)
    return pairs.groupBy(
        F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b")
    ).agg(F.count(F.lit(1)).alias("n_matching_bands"))


def _minhash_lsh_candidates_collapsed(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    num_hashes: int,
    bands: int,
    max_bucket: int | None,
) -> DataFrame:
    """Distinct-text-grain LSH banding (see minhash_lsh_candidates
    ``collapse_exact``). Parity with the doc-grain form rests on:
    (1) replicas share one signature, hence one band row per band —
    a rep pair's bucket count IS every expanded pair's
    n_matching_bands; (2) a replica group meets itself in all
    ``bands`` of its buckets, so one self entry per bucket gives
    within-group pairs the count ``bands`` the doc-grain form
    produces; (3) a lone-group bucket (every replica of one text,
    nothing else) still owes its within-group pairs, so singleton
    buckets with grp > 1 are kept."""
    grouped = _grouped_by_text(df, text_col, id_col)
    reps = _reps_of(grouped)
    banded = minhash_bands(
        reps, "_txt", "_rid", n, num_hashes, bands, keep_cols=("grp",)
    )
    buckets = (
        banded.groupBy("band", "bhash")
        .agg(
            F.array_sort(F.collect_list(F.struct("id", "grp"))).alias(
                "members"
            )
        )
        .filter(
            (F.size("members") > 1)
            | F.exists("members", lambda g: g["grp"] > 1)
        )
    )
    pairs = _exploded_member_pairs(
        buckets, max_bucket=max_bucket, include_selfs=True
    )
    rep_pairs = pairs.groupBy(
        F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b")
    ).agg(F.count(F.lit(1)).alias("n_matching_bands"))
    return _expand_rep_pairs(
        rep_pairs, grouped, ["n_matching_bands"], max_bucket
    )


# ---------------------------------------------------------------------------
# SimHash — 64-bit fingerprint, hamming-distance near-dup
# ---------------------------------------------------------------------------


def simhash(text_col: str, bits: int = 64) -> Column:
    """SimHash over lowercase tokens: for each bit, sum ±1 across
    token hashes; bit set iff the sum is positive. Expressed as an
    aggregate over the token array per bit — stays in codegen.

    NOTE: per-bit F.aggregate re-walks the token array ``bits`` times
    per row — fine for tests/small frames; hot paths use
    ``simhash_table`` (explode + branchless partial-agg bit sums,
    identical output). Token hashes are portable_hash64 (60 effective
    bits — bits 60..63 always clear, on both engines alike)."""
    toks = F.transform(tokens(text_col), lambda t: portable_hash64(F.lower(t)))
    bit_cols = []
    for i in range(bits):
        # +1 when bit i of the token hash is set, else −1; bit i of
        # the simhash = (sum > 0).
        vote = F.aggregate(
            toks,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit_cols.append(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out.bitwiseOR(c)
    return out


def simhash_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    keep_cols: tuple[str, ...] = (),
    _force_perbit: bool = False,
) -> DataFrame:
    """(id, sh) simhash table in the scale shape: explode token
    hashes to rows, one groupBy computing the bit-vote sums as
    partial aggregates, then assemble the fingerprint. Same
    rationale as minhash_signatures — the per-bit aggregate over a
    shared token array re-hashes every token ``bits`` times.

    For the default ``bits=64`` the vote sums are SWAR-packed: word
    g holds the counts of bits g, g+16, g+32, g+48 as four 16-bit
    lanes (``(h >> g) & 0x0001000100010001`` per token), so the
    aggregate carries 16 longs instead of 64 and the per-token work
    is 16 shift+ANDs instead of 64 conditional sums. Output is
    BIT-IDENTICAL to the per-bit form (parity-tested). Contract:
    **< 32768 tokens per document** — lane 3 of a packed word sums
    ``count << 48``, so 2^15 tokens could overflow the signed long
    (and 2^16 would carry between lanes); the assembled fingerprint
    raises a clear error for any doc at or past the limit (docs big
    enough to overflow mid-aggregate fail the ANSI sum check
    instead — either way no silent corruption). Other ``bits``
    values keep the per-bit path.

    Documents with zero tokens drop out."""
    from pos_api_pipeline_spark.llm.exprcache import memo_expr

    toks = F.transform(tokens(text_col), lambda t: portable_hash64(F.lower(t)))
    # r13: token hashing is scan-stage work — spread low-split inputs
    # (no-op at scale; see text.spread_small_scan).
    base = spread_small_scan(
        df.select(F.col(id_col).alias("id"), *keep_cols, F.col(text_col)),
        "id",
    )
    tok_rows = base.select(
        "id", *keep_cols, F.explode_outer(toks).alias("h")
    ).filter(F.col("h").isNotNull())
    if bits == 64 and not _force_perbit:
        return _simhash_swar(tok_rows, keep_cols, memo_expr)
    return _simhash_perbit(tok_rows, bits, keep_cols, memo_expr)


def _simhash_perbit(
    tok_rows: DataFrame, bits: int, keep_cols, memo_expr
) -> DataFrame:
    """Per-bit vote sums (simhash_table's general-``bits`` path, and
    the parity reference for the SWAR fast path)."""
    # Pure bit arithmetic in the aggregate: sum bit i directly (0/1,
    # no conditional) plus one token count; the ±1 vote is recovered
    # as 2·ones > n, which is branchless and measured 3.5× faster
    # than 64 CASE-WHEN sums at sf0.1. Tie (2·ones == n) leaves the
    # bit clear, exactly like vote sum 0 under the ±1 formulation.
    # The 64 vote columns and the fingerprint assembly are memoized
    # per context (llm.exprcache): rebuilding them per call measured
    # ~2.7 s of driver-side construction, more than the execution.
    vote_cols = [
        memo_expr(
            ("simhash_vote", i),
            lambda i=i: F.sum(
                F.shiftright("h", i).bitwiseAND(F.lit(1))
            ).alias(f"v{i}"),
        )
        for i in range(bits)
    ]
    votes = tok_rows.groupBy("id", *keep_cols).agg(
        F.count(F.lit(1)).alias("_n"), *vote_cols
    )

    def build_sh():
        sh = F.lit(0).cast("long")
        for i in range(bits):
            sh = sh.bitwiseOR(
                F.when(
                    F.col(f"v{i}") * 2 > F.col("_n"),
                    F.shiftleft(F.lit(1).cast("long"), i),
                ).otherwise(F.lit(0).cast("long"))
            )
        return sh

    sh = memo_expr(("simhash_sh", bits), build_sh)
    return votes.select("id", *keep_cols, sh.alias("sh"))


# Four 16-bit lanes per packed word; <2^15 tokens/doc keeps lane 3's
# ``count << 48`` inside a signed long (see simhash_table docstring).
_SWAR_LANE_MASK = 0x0001_0001_0001_0001
_SWAR_TOKEN_LIMIT = 1 << 15


def _simhash_swar(tok_rows: DataFrame, keep_cols, memo_expr) -> DataFrame:
    """64-bit SimHash fingerprints from exploded token-hash rows via
    SWAR-packed vote sums (simhash_table's bits=64 fast path).

    ``(h >> g) & 0x0001000100010001`` places bits g, g+16, g+32,
    g+48 of token hash ``h`` into the four lane slots of word g in
    one shift+AND; summing the packed words accumulates all four bit
    counts at once. Arithmetic shiftright is safe: for g ≤ 15 every
    surviving lane bit position maps to a real bit of ``h`` (48+g ≤
    63), and sign-extension only reaches positions the mask clears."""
    word_cols = [
        memo_expr(
            ("simhash_swar_word", g),
            lambda g=g: F.sum(
                F.shiftright("h", g).bitwiseAND(F.lit(_SWAR_LANE_MASK))
            ).alias(f"w{g}"),
        )
        for g in range(16)
    ]
    votes = tok_rows.groupBy("id", *keep_cols).agg(
        F.count(F.lit(1)).alias("_n"), *word_cols
    )

    def build_sh():
        n = F.col("_n")
        sh = F.lit(0).cast("long")
        for g in range(16):
            for j in range(4):
                lane = F.shiftright(F.col(f"w{g}"), 16 * j).bitwiseAND(
                    F.lit(0xFFFF)
                )
                sh = sh.bitwiseOR(
                    F.when(
                        lane * 2 > n,
                        F.shiftleft(F.lit(1).cast("long"), g + 16 * j),
                    ).otherwise(F.lit(0).cast("long"))
                )
        return F.when(n < F.lit(_SWAR_TOKEN_LIMIT), sh).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "simhash SWAR packing requires < "
                        f"{_SWAR_TOKEN_LIMIT} tokens per document; doc "
                    ),
                    F.col("id").cast("string"),
                    F.lit(" has "),
                    n.cast("string"),
                    F.lit(" — chunk the document or use bits != 64"),
                )
            ).cast("long")
        )

    sh = memo_expr(("simhash_swar_sh", 64), build_sh)
    return votes.select("id", *keep_cols, sh.alias("sh"))


def _simhash_blocked(
    base: DataFrame, bits: int, blocks: int, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Explode an (id, sh[, carry…]) fingerprint table into one row
    per (doc, block): (id, sh, carry…, blk, bval)."""
    block_bits = bits // blocks
    mask = (1 << block_bits) - 1
    return base.select(
        "id",
        "sh",
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        (
                            F.shiftright("sh", i * block_bits).bitwiseAND(
                                F.lit(mask)
                            )
                        ).alias("bval"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("b"),
    ).select(
        "id",
        "sh",
        *carry,
        F.col("b.blk").alias("blk"),
        F.col("b.bval").alias("bval"),
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bits: int = 64,
    blocks: int = 4,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    collapse_exact: bool | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, block-bucketed
    (Manku et al., WWW'07): split the fingerprint into ``blocks``
    equal blocks and join on (block_idx, block value); by pigeonhole
    any pair with hamming < ``blocks`` MUST agree exactly on at least
    one block, so recall is guaranteed up to blocks−1 differing bits
    and opportunistic beyond that. Hamming distance is then verified
    exactly on the candidates only.

    ``collapse_exact=None`` (default) auto-picks via the one-pass
    distinct-ratio probe (``_resolve_collapse``; measured: collapse
    wins 4.7× on replica-dense corpora, costs 1.7× where nothing
    collapses). ``True`` groups byte-identical texts FIRST
    and fingerprints + pairs at distinct-text grain (rule-7 collapse,
    see minhash_lsh_candidates): replicas share one fingerprint, so
    every expanded doc pair inherits exactly the hamming distance the
    direct pair would compute (within-group pairs are hamming 0) —
    BIT-PARITY with the uncollapsed form whenever no block bucket
    trips ``max_bucket``. Under the cap, the collapse counts DISTINCT
    texts per bucket and applies the linear guard at expansion grain
    instead (``_expand_rep_pairs``).

    ``blocks`` trades recall against sieve strength: the chance two
    RANDOM fingerprints collide on some block is
    ~blocks·2^-(bits/blocks) — 4 blocks of 16 bits ≈ 6e-5 (candidates
    stay near-linear in corpus size), 8 blocks of 8 bits ≈ 3%
    (measured 3× the runtime at sf0.1: the candidate verify, not the
    fingerprinting, dominates). Default 4; raise to 8 only when the
    use case needs guaranteed recall at hamming 4–7 and the corpus is
    small or pre-blocked.

    Blocks larger than ``max_bucket`` emit star pairs (smallest id vs
    each other member) instead of all pairs — see
    minhash_lsh_candidates; identical docs (hamming 0) still pair via
    the representative. ``max_bucket=None`` restores all-pairs."""
    if _resolve_collapse(df, text_col, collapse_exact):
        return _simhash_near_dups_collapsed(
            df, text_col, id_col, max_hamming, bits, blocks, max_bucket
        )
    base = simhash_table(df, text_col, id_col, bits)
    blocked = _simhash_blocked(base, bits, blocks)
    # Bucket-pair form (see minhash_lsh_candidates): the simhash table
    # behind both sides of the would-be self-join is a full token
    # explode + 64-sum aggregate — recomputing it per side doubles the
    # dominant cost. Carrying sh into the bucket also removes any need
    # to join fingerprints back for the hamming check.
    buckets = (
        blocked.groupBy("blk", "bval")
        .agg(
            F.array_sort(F.collect_list(F.struct("id", "sh"))).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    # Hamming verification runs INSIDE the bucket pair array (see
    # _exploded_member_pairs pair_filter): only true near-dups reach
    # the dedup-across-blocks distinct.
    cand = (
        _exploded_member_pairs(
            buckets,
            fields=("sh",),
            max_bucket=max_bucket,
            pair_filter=lambda p: F.bit_count(
                p["sh_a"].bitwiseXOR(p["sh_b"])
            )
            <= max_hamming,
        )
        .select("p.id_a", "p.id_b", "p.sh_a", "p.sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", hamming).select(
        "id_a", "id_b", "hamming"
    )


def _simhash_near_dups_collapsed(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int,
    bits: int,
    blocks: int,
    max_bucket: int | None,
) -> DataFrame:
    """Distinct-text-grain SimHash blocking (see simhash_near_dups
    ``collapse_exact``). Replicas share one fingerprint, so the
    candidate set and hamming distances at rep grain expand verbatim
    to doc grain; within-group pairs (hamming 0, always ≤
    max_hamming) come from one self entry per bucket, deduped with
    the cross candidates before the hamming check. Lone-group buckets
    with grp > 1 are kept for exactly those self entries."""
    grouped = _grouped_by_text(df, text_col, id_col)
    reps = _reps_of(grouped)
    base = simhash_table(reps, "_txt", "_rid", bits, keep_cols=("grp",))
    blocked = _simhash_blocked(base, bits, blocks, carry=("grp",))
    buckets = (
        blocked.groupBy("blk", "bval")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("id", "sh", "grp"))
            ).alias("members")
        )
        .filter(
            (F.size("members") > 1)
            | F.exists("members", lambda g: g["grp"] > 1)
        )
    )
    cand = (
        _exploded_member_pairs(
            buckets,
            fields=("sh",),
            max_bucket=max_bucket,
            include_selfs=True,
            pair_filter=lambda p: F.bit_count(
                p["sh_a"].bitwiseXOR(p["sh_b"])
            )
            <= max_hamming,
        )
        .select("p.id_a", "p.id_b", "p.sh_a", "p.sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    rep_pairs = cand.withColumn("hamming", hamming).select(
        "id_a", "id_b", "hamming"
    )
    return _expand_rep_pairs(rep_pairs, grouped, ["hamming"], max_bucket)


# ---------------------------------------------------------------------------
# Cross-corpus dedup (incremental crawl vs existing corpus)
# ---------------------------------------------------------------------------


def cross_corpus_exact_dedup(
    new: DataFrame,
    old: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    old_text_col: str | None = None,
) -> DataFrame:
    """Drop from ``new`` every document whose exact text already
    exists in ``old`` — the first pass of incremental-crawl ingestion
    (dedupe the delta against the lake, never the lake against
    itself).

    Shape: left-anti join on md5(text). Both sides shuffle on a
    fixed 32-byte key, never the text; the old side reduces to
    DISTINCT hashes first, so at 100 TB it can also be a precomputed
    hash manifest instead of a rescan."""
    oc = old_text_col or text_col
    old_hashes = old.select(F.md5(F.col(oc)).alias("_h")).distinct()
    return (
        new.withColumn("_h", F.md5(F.col(text_col)))
        .join(old_hashes, "_h", "left_anti")
        .drop("_h")
    )


def cross_corpus_near_dups(
    new: DataFrame,
    old: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Flag documents in ``new`` that are MinHash-LSH near-duplicates
    of ANY document in ``old``: ids sharing at least one full
    signature band with the old corpus. Returns the flagged id frame
    (one column, distinct); compose with a left-anti join to drop, or
    join back for review.

    Shape: both corpora reduce to (band, bhash) band rows; the old
    side further reduces to DISTINCT band keys (its ids never travel);
    a LEFT SEMI join flags new ids. Nothing is all-pairs and the old
    side's band table is reusable across every future delta — the
    standing index of the lake."""
    nb = minhash_bands(new, text_col, id_col, n, num_hashes, bands)
    ob = (
        minhash_bands(old, text_col, id_col, n, num_hashes, bands)
        .select("band", "bhash")
        .distinct()
    )
    return (
        nb.join(ob, ["band", "bhash"], "left_semi")
        .select(F.col("id").alias(id_col))
        .distinct()
    )


def build_band_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> None:
    """Materialize the corpus's MinHash band table to parquet — the
    standing near-dup index. Computing signatures is the expensive
    part of LSH dedup; at 100 TB you pay it once per corpus, not once
    per incremental delta. Partitioned by ``band`` so a delta probe
    prunes to the band partitions it actually hits."""
    minhash_bands(df, text_col, id_col, n, num_hashes, bands).write.mode(
        "overwrite"
    ).partitionBy("band").parquet(path)


def update_band_index(
    delta: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    bands_df: DataFrame | None = None,
) -> None:
    """Append a delta's band rows to the standing index (idempotent
    per delta only if the caller dedups ids first — band rows are
    append-only facts keyed by (id, band)). Pass precomputed
    ``bands_df`` (from ``minhash_bands``) to avoid re-signaturing a
    delta that was already banded this tick."""
    nb = (
        bands_df
        if bands_df is not None
        else minhash_bands(delta, text_col, id_col, n, num_hashes, bands)
    )
    nb.write.mode("append").partitionBy("band").parquet(path)


def near_dups_against_index(
    delta: DataFrame,
    spark,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    bands_df: DataFrame | None = None,
) -> DataFrame:
    """Flag delta documents near-duplicating anything in the standing
    index WITHOUT recomputing the corpus's signatures: the delta's
    band rows LEFT SEMI join the parquet index on (band, bhash).
    Band partitioning means each delta band row only scans its band's
    files. Returns distinct flagged ids. Pass precomputed ``bands_df``
    to avoid re-signaturing an already-banded delta."""
    nb = (
        bands_df
        if bands_df is not None
        else minhash_bands(delta, text_col, id_col, n, num_hashes, bands)
    )
    idx = spark.read.parquet(path).select("band", "bhash")
    return (
        nb.join(idx, ["band", "bhash"], "left_semi")
        .select(F.col("id").alias(id_col))
        .distinct()
    )


def keep_best_duplicate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    score: Column | None = None,
    method: str = "exact",
) -> DataFrame:
    """Survivor selection by QUALITY: within each duplicate group keep
    the highest-scoring member (ties → lowest id) instead of the
    blanket lowest-id rule in ``dedupe_corpus``. This is how web-scale
    pipelines actually dedup — when a page exists in five crawls you
    keep the longest / highest-quality capture, not the smallest id.

    ``score`` is any Column (default: text length); plug in
    ``quality_score`` outputs or model scores. ``method``: 'exact'
    (byte-identical md5 groups) or 'fingerprint' (order-insensitive
    token-set groups, catches shuffled boilerplate).

    Shape: one row_number window partitioned by the group hash —
    a single shuffle on a fixed-width key, same cost as the dedup
    itself; no join, no collect. Deterministic for any score
    expression both engines can evaluate, so it oracle-checks.
    """
    if score is None:
        score = F.length(F.col(text_col))
    if method == "exact":
        key = F.md5(F.col(text_col))
    elif method == "fingerprint":
        key = F.md5(
            F.array_join(
                F.array_sort(
                    F.array_distinct(
                        F.transform(tokens(text_col), lambda t: F.lower(t))
                    )
                ),
                " ",
            )
        )
    else:
        raise ValueError(f"unknown keep_best method: {method}")
    from pyspark.sql import Window

    w = Window.partitionBy("_grp").orderBy(
        F.desc("_score"), F.asc(id_col)
    )
    return (
        df.withColumn("_grp", key)
        .withColumn("_score", score)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_grp", "_score", "_rn")
    )


def minhash_confirmed_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """The full production near-dup pipeline in one plan: MinHash-LSH
    candidate generation followed by EXACT n-gram Jaccard
    confirmation of only the candidate pairs. LSH keeps the pair
    space sub-quadratic; confirmation removes its false positives, so
    the output has the precision of ``ngram_jaccard_pairs`` at the
    cost profile of ``minhash_lsh_candidates`` — what you actually
    run at 100 TB.

    Shape: candidates from the banded bucket-pair form (two shuffles,
    never all-pairs), then ONE shingle materialization joined twice
    by id (no text re-tokenization per side — the shingle frame is a
    plain column pipeline, so both joins reuse it), intersection via
    ``array_intersect`` inside the row. Cost is linear in candidate
    count, not corpus size.

    Output: (id_a, id_b, n_matching_bands, jaccard), jaccard ≥
    ``threshold``.
    """
    cands = minhash_lsh_candidates(
        df, text_col, id_col, n, num_hashes, bands
    )
    sh = with_shingles(
        df, text_col=text_col, id_col=id_col, n=n, out_col="_sh",
        hashed=True, portable=True,
    ).select("id", "_sh")
    joined = (
        cands.join(sh.withColumnRenamed("id", "id_a"), "id_a")
        .withColumnRenamed("_sh", "_sh_a")
        .join(sh.withColumnRenamed("id", "id_b"), "id_b")
        .withColumnRenamed("_sh", "_sh_b")
    )
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size("_sh_a") + F.size("_sh_b") - inter
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(
        F.lit(0.0)
    )
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_matching_bands", "jaccard")
    )


def apply_pair_dedup_best(
    df: DataFrame,
    pairs: DataFrame,
    score: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware pair dedup: for every near-dup pair drop the
    LOWER-scoring member (ties → higher id drops), instead of
    ``apply_pair_dedup``'s blanket higher-id rule. Pair-local, like
    the greedy rule it replaces: a document is dropped if it loses
    ANY of its pairs, so a chain a~b~c with scores 1<2<3 keeps only c
    — conservative pruning (never keeps a near-dup pair intact; may
    drop more than a per-cluster argmax would). Use
    ``connected_components`` + ``keep_best_duplicate``-style argmax
    when exact one-per-cluster survivors matter.

    Shape: one join of pairs to the (id, score) frame per side (the
    score frame is derived once), one anti join. No new shuffle class
    beyond apply_pair_dedup.
    """
    scores = df.select(F.col(id_col).alias("_sid"), score.alias("_score"))
    a = scores.select(
        F.col("_sid").alias("id_a"), F.col("_score").alias("_sa")
    )
    b = scores.select(
        F.col("_sid").alias("id_b"), F.col("_score").alias("_sb")
    )
    scored_pairs = pairs.join(a, "id_a").join(b, "id_b")
    loser = F.when(F.col("_sa") < F.col("_sb"), F.col("id_a")).otherwise(
        F.when(F.col("_sb") < F.col("_sa"), F.col("id_b")).otherwise(
            # tie: the higher id loses (matches apply_pair_dedup)
            F.greatest(F.col("id_a"), F.col("id_b"))
        )
    )
    losers = scored_pairs.select(loser.alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def kmv_corpus_jaccard(
    df: DataFrame,
    corpus_expr: Column,
    label_a,
    label_b,
    k: int = 256,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt_buckets: int = 32,
) -> DataFrame:
    """Corpus-overlap estimation with a k-minimum-values sketch
    (Bar-Yossef et al. 2002): estimate the shingle-set Jaccard and
    containment between two corpora from the k smallest distinct
    shingle hashes per corpus — the cheap "how much does my new crawl
    overlap the training set" probe, next to the pairwise dedup
    family which answers the per-document question.

    Estimator: with K = the (at most) k smallest hashes of A∪B
    (union of the two sketches), J(A,B) ≈ |K ∩ A ∩ B| / |K| and
    C(A⊆B) ≈ |K ∩ A ∩ B| / |K ∩ A|. |K| — not the constant k — is
    the denominator so that when the union is smaller than k the
    estimate collapses to the exact Jaccard instead of being biased
    low by k/|union|. The exact hash-set Jaccard is computed
    alongside (one flag-aggregate over distinct hashes) so the sketch
    error is observable in the same row.

    Scale shape (r12): EVERYTHING derives from one ``flags`` frame —
    ``groupBy(hash) → (ia, ib)`` presence flags, partial-aggregated
    map-side, ONE corpus-scale exchange. The exact row sums the
    flags; the pool is the k smallest flag rows via a salted
    two-stage rank (WindowGroupLimit keeps per-task state at ≤k
    rows), because for h among the k smallest of A∪B, membership in
    the per-corpus k-min sketch is equivalent to plain membership
    (rank_A(h) ≤ rank_{A∪B}(h) ≤ k) — so the pooled union of the two
    per-corpus sketches IS the top-k of flags, and the former
    per-corpus sketches + FULL OUTER pool join are algebra, not work.
    The pre-r12 form paid 3 corpus scans (exact, sketch A, sketch B —
    the lambda-bearing shingle tree defeats ReusedExchange), 6
    corpus-grain exchanges and a SortMergeJoin; this form pays 2
    scans (exact + pool, same non-canonicalizing reason) and 3.
    At 100 TB drop the exact-flags aggregate (comment in code)
    and the plan touches the corpus exactly once.

    Determinism: hashes are portable md5-prefix values, so a DuckDB
    twin reproduces the sketch bit-for-bit. Ratios rounded to 6 dp.

    Output one row: (k, n_hashes_a, n_hashes_b, n_common,
    exact_jaccard, kmv_jaccard, exact_containment_a, kmv_containment_a).
    """
    from pyspark.sql import Window

    labeled = df.withColumn("_corpus", corpus_expr).filter(
        F.col("_corpus").isin([label_a, label_b])
    )
    sh = with_shingles(
        labeled,
        text_col=text_col,
        id_col=id_col,
        n=n,
        hashed=True,
        portable=True,
        keep_cols=("_corpus",),
    )
    flags = (
        sh.select("_corpus", F.explode_outer("shingles").alias("h"))
        .filter(F.col("h").isNotNull())
        .groupBy("h")
        .agg(
            F.max(
                F.when(F.col("_corpus") == label_a, 1).otherwise(0)
            ).alias("ia"),
            F.max(
                F.when(F.col("_corpus") == label_b, 1).otherwise(0)
            ).alias("ib"),
        )
    )
    # The exact-overlap aggregate: drop at extreme scale, the sketch
    # row is self-sufficient.
    exact = flags.agg(
        F.sum("ia").alias("n_hashes_a"),
        F.sum("ib").alias("n_hashes_b"),
        F.sum(F.col("ia") * F.col("ib")).alias("n_common"),
    )
    # Pool = the k smallest distinct hashes of A∪B, with ia/ib saying
    # whether each pool hash is in the per-corpus k-min sketch — which
    # for pool members is plain corpus membership (see docstring), so
    # the flags row carries it already. Salted first stage for
    # parallelism; both stages are rank-limit-pushed
    # (WindowGroupLimit), so per-task state is ≤ k rows.
    w1 = Window.partitionBy("_salt").orderBy("h")
    wp = Window.orderBy("h")  # <= salt_buckets*k survivors
    pool = (
        flags.withColumn("_salt", F.pmod("h", F.lit(salt_buckets)))
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("_rp", F.row_number().over(wp))
        .filter(F.col("_rp") <= k)
    )
    # Denominator is the POOL ROW COUNT, not the constant k: when the
    # union holds fewer than k distinct hashes (small corpora) the
    # sketch IS the union and the estimator reduces to the exact
    # Jaccard — dividing by k would bias it low by k/|union|
    # (e.g. |union|=100, k=256 → ~2.5× under-estimate).
    est = pool.agg(
        F.sum(F.col("ia") * F.col("ib")).alias("_n_both"),
        F.sum("ia").alias("_n_pool_a"),
        F.count(F.lit(1)).alias("_n_pool"),
    )
    return (
        exact.crossJoin(F.broadcast(est))
        .select(
            F.lit(k).alias("k"),
            "n_hashes_a",
            "n_hashes_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (
                    F.col("n_hashes_a")
                    + F.col("n_hashes_b")
                    - F.col("n_common")
                ),
                6,
            ).alias("exact_jaccard"),
            F.round(
                F.col("_n_both").cast("double") / F.col("_n_pool"), 6
            ).alias("kmv_jaccard"),
            F.round(
                F.col("n_common").cast("double") / F.col("n_hashes_a"), 6
            ).alias("exact_containment_a"),
            F.round(
                F.col("_n_both").cast("double") / F.col("_n_pool_a"), 6
            ).alias("kmv_containment_a"),
        )
    )
