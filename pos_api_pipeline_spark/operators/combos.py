"""Combo operators: the UDTF-shaped combo explode and choice analyses.

The hardest operator surface in the reference (SURVEY.md §7.4.1),
re-expressed entirely with Spark higher-order array functions —
split / filter / transform / posexplode / arrays_zip — so the 1-row →
N-rows fan-out runs partition-local inside codegen with zero Python.

Semantic quirks preserved exactly from the reference:

- ``explode_combo_items`` (reference:
  reporting/data_preparation.py:116-198): combos are rows whose
  item_name contains 'combo' (case-insensitive); combos with null
  modifiers are dropped; main items are the ';'-parts containing
  'hamburguesa' or 'refresco'; the i-th mayo part pairs with the
  main item at overall index i (only when that main is a
  hamburguesa); rename rules here are 'smash'→Smash Burger,
  'chiken'→Chicken Burger (note: NOT 'chicken' in this variant),
  case-SENSITIVE 'Coca'→'Coca Cola'; parts without '(...)' are
  skipped; new rows zero price/cost.
- ``analyze_combo_choices`` (reference:
  reporting/cumulative_report.py:162-218): choice parts are those
  whose prefix before '(' contains hamburguesa/refresco/papas/
  malteada; standardization differs from the explode: 'chicken' IS
  matched, and 'coca' (case-insensitive) → 'Coca-Cola'.
- ``analyze_combo_choices_with_mayo`` (reference:
  reporting/cumulative_report.py:220-289): mains are whole-part
  matches; burgers (standardized name containing 'burger') collected
  in order; i-th mayo part pairs with i-th burger.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PAREN_RE = r"\((.*?)\)"


def _is_combo(item_col: str) -> Column:
    # str.contains(..., case=False, na=False): null -> not a combo
    return F.coalesce(F.lower(F.col(item_col)).contains("combo"), F.lit(False))


def _has_parens(part: Column) -> Column:
    return part.rlike(r"\(.*\)")


def _extract_parens(part: Column) -> Column:
    return F.trim(F.regexp_extract(part, _PAREN_RE, 1))


def _explode_rename(raw: Column) -> Column:
    """Rename rules of the explode variant — 'chiken' only, 'Coca'
    case-sensitive (reference: data_preparation.py:163-171)."""
    lc = F.lower(raw)
    return (
        F.when(lc.contains("smash"), F.lit("Smash Burger"))
        .when(lc.contains("chiken"), F.lit("Chicken Burger"))
        .when(raw.contains("Coca"), F.lit("Coca Cola"))
        .otherwise(raw)
    )


def _standard_name(raw: Column) -> Column:
    """Standardization of the analysis variants — 'chicken' matched,
    'coca' case-insensitive → 'Coca-Cola' (reference:
    cumulative_report.py:189-195)."""
    lc = F.lower(raw)
    return (
        F.when(lc.contains("smash"), F.lit("Smash Burger"))
        .when(
            lc.contains("chiken") | lc.contains("chicken"),
            F.lit("Chicken Burger"),
        )
        .when(lc.contains("coca"), F.lit("Coca-Cola"))
        .otherwise(raw)
    )


def _main_items(arr: Column) -> Column:
    return F.filter(
        arr,
        lambda x: F.lower(x).contains("hamburguesa")
        | F.lower(x).contains("refresco"),
    )


def _mayo_items(arr: Column) -> Column:
    return F.filter(arr, lambda x: F.lower(x).contains("mayonesa"))


def explode_combo_items(
    df: DataFrame,
    item_col: str = "item_name",
    modifiers_col: str = "modifiers",
    price_col: str = "price",
    cost_col: str = "cost",
) -> DataFrame:
    """U1 — explode combo rows into one row per main item
    (reference: reporting/data_preparation.py:116-198).

    Plan shape: filter-split into combo/non-combo branches of the same
    scan, a generate (posexplode) on the combo branch, then
    unionByName. No shuffle at all — the fan-out is partition-local,
    which is exactly what makes this safe at 100 TB.

    The reference's "no rows parsed → return only non-combos" special
    case needs no code: an empty exploded branch unions to the same
    result.
    """
    is_combo = _is_combo(item_col)
    non_combo = df.filter(~is_combo)
    combos = df.filter(is_combo).filter(F.col(modifiers_col).isNotNull())

    arr = F.split(F.col(modifiers_col), ";")
    combos = combos.withColumn("_mains", _main_items(arr)).withColumn(
        "_mayos", _mayo_items(arr)
    )
    exploded = combos.select(
        "*", F.posexplode("_mains").alias("_i", "_item_mod")
    )
    # Parts without '(...)' are skipped, but their index still counts
    # for mayo pairing (the reference enumerates before the skip).
    exploded = exploded.filter(_has_parens(F.col("_item_mod")))
    raw_name = _extract_parens(F.col("_item_mod"))
    mayo = F.when(
        F.lower(F.col("_item_mod")).contains("hamburguesa")
        & (F.col("_i") < F.size("_mayos")),
        F.element_at("_mayos", F.col("_i") + 1),
    )
    new_rows = (
        exploded.withColumn(item_col, _explode_rename(raw_name))
        .withColumn(modifiers_col, mayo)
        .withColumn(price_col, F.lit(0.0))
        .withColumn(cost_col, F.lit(0.0))
        .drop("_mains", "_mayos", "_i", "_item_mod")
    )
    return non_combo.unionByName(new_rows)


def analyze_combo_choices(
    df: DataFrame,
    item_col: str = "item_name",
    modifiers_col: str = "modifiers",
) -> DataFrame:
    """A14 — per-combo counts of standardized choices
    (reference: reporting/cumulative_report.py:162-218).

    Output: (item_name, choice, n) — the DataFrame form of the
    reference's ``{combo: Counter(choices)}``; a report layer can
    pivot driver-side.
    """
    choice_keys = ["hamburguesa", "refresco", "papas", "malteada"]
    combos = df.filter(_is_combo(item_col)).filter(
        F.col(modifiers_col).isNotNull()
    )

    def is_choice(part: Column) -> Column:
        key = F.lower(F.split(part, r"\(").getItem(0))
        cond = F.lit(False)
        for k in choice_keys:
            cond = cond | key.contains(k)
        return cond

    arr = F.split(F.col(modifiers_col), ";")
    choices = F.transform(
        F.filter(arr, lambda x: is_choice(x) & _has_parens(x)),
        lambda x: _standard_name(_extract_parens(x)),
    )
    return (
        combos.select(
            F.col(item_col), F.explode_outer(choices).alias("choice")
        )
        .filter(F.col("choice").isNotNull())
        .groupBy(item_col, "choice")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def analyze_combo_choices_with_mayo(
    df: DataFrame,
    item_col: str = "item_name",
    modifiers_col: str = "modifiers",
) -> DataFrame:
    """A15 — positional burger↔mayo association counts
    (reference: reporting/cumulative_report.py:220-289).

    Output: (item_name, burger, mayo_type, n) — the reference's
    nested ``sub_choices`` counters flattened to a tidy table. The
    i-th mayo part pairs with the i-th *burger* choice (arrays_zip
    pads the shorter side with null; those pairs are filtered, which
    reproduces the reference's bounds check). Mayo parts without
    parens consume their pairing slot but emit nothing, as in the
    reference.
    """
    combos = df.filter(_is_combo(item_col)).filter(
        F.col(modifiers_col).isNotNull()
    )
    arr = F.split(F.col(modifiers_col), ";")
    mains = _main_items(arr)
    # Standardized names of paren-valid mains, in order.
    named = F.transform(
        F.filter(mains, _has_parens), lambda x: _standard_name(_extract_parens(x))
    )
    burgers = F.filter(named, lambda x: F.lower(x).contains("burger"))
    mayos = _mayo_items(arr)
    pairs = F.arrays_zip(mayos.alias("mayo"), burgers.alias("burger"))
    out = combos.select(
        F.col(item_col), F.explode_outer(pairs).alias("p")
    ).filter(F.col("p").isNotNull()).select(
        item_col,
        F.col("p.burger").alias("burger"),
        F.col("p.mayo").alias("_mayo_part"),
    )
    out = out.filter(
        F.col("burger").isNotNull()
        & F.col("_mayo_part").isNotNull()
        & _has_parens(F.col("_mayo_part"))
    ).withColumn("mayo_type", _extract_parens(F.col("_mayo_part")))
    return out.groupBy(item_col, "burger", "mayo_type").agg(
        F.count(F.lit(1)).alias("n")
    )


def combo_main_choice_counts(
    df: DataFrame,
    item_col: str = "item_name",
    modifiers_col: str = "modifiers",
) -> DataFrame:
    """A15 main_choices counter as a table: standardized counts of all
    paren-valid mains per combo (reference:
    cumulative_report.py:262-272)."""
    combos = df.filter(_is_combo(item_col)).filter(
        F.col(modifiers_col).isNotNull()
    )
    arr = F.split(F.col(modifiers_col), ";")
    named = F.transform(
        F.filter(_main_items(arr), _has_parens),
        lambda x: _standard_name(_extract_parens(x)),
    )
    return (
        combos.select(
            F.col(item_col), F.explode_outer(named).alias("choice")
        )
        .filter(F.col("choice").isNotNull())
        .groupBy(item_col, "choice")
        .agg(F.count(F.lit(1)).alias("n"))
    )
