"""Golden tests for the combo explode + choice analyses.

The canonical fixture and expectations are transcribed from the
reference spec (reference: tests/reporting/test_reporting.py:24-38,
66-101 — via FIXTURES.md §3).
"""

from __future__ import annotations

import pytest

from pos_api_pipeline_spark.operators.combos import (
    analyze_combo_choices,
    analyze_combo_choices_with_mayo,
    combo_main_choice_counts,
    explode_combo_items,
)

COMBO_MODS = (
    "Hamburguesa 1(Hamburguesa Smash 1);Hamburguesa 2(Hamburguesa Chiken 2);"
    "Mayonesa(Ajo);Mayonesa(Chipotle);Refresco Sabor(Agua Natural)"
)


@pytest.fixture(scope="module")
def combo_data(spark):
    rows = [
        ("1-1696", "Combo Pa' Dos", 240.0, 129.0, COMBO_MODS),
        ("1-1696", "Malteada Chocolate", 60.0, 19.0, "Tipo de Leche(Leche Entera)"),
        ("1-1695", "Doble Chicken", 115.0, 54.0, "Mayonesa(Ajo)"),
    ]
    return spark.createDataFrame(
        rows,
        "receipt_number string, item_name string, price double,"
        "cost double, modifiers string",
    )


def test_explode_combo_golden(combo_data):
    out = explode_combo_items(combo_data)
    rows = out.collect()
    # 5 rows: 2 originals + 3 exploded (2 burgers + 1 drink); combo row gone.
    assert len(rows) == 5
    names = {r.item_name for r in rows}
    assert "Combo Pa' Dos" not in names
    assert {"Smash Burger", "Chicken Burger", "Agua Natural"} <= names
    by_name = {r.item_name: r for r in rows}
    # Positional mayo association: 1st mayo → 1st burger, 2nd → 2nd.
    assert by_name["Smash Burger"].modifiers == "Mayonesa(Ajo)"
    assert by_name["Chicken Burger"].modifiers == "Mayonesa(Chipotle)"
    assert by_name["Agua Natural"].modifiers is None  # refresco gets no mayo
    # Prices/costs belong to the combo, zeroed on new rows.
    for n in ("Smash Burger", "Chicken Burger", "Agua Natural"):
        assert by_name[n].price == 0.0 and by_name[n].cost == 0.0
        assert by_name[n].receipt_number == "1-1696"  # receipt meta carried
    # Non-combo rows untouched.
    assert by_name["Doble Chicken"].price == 115.0


def test_explode_null_modifiers_drops_combo(spark):
    df = spark.createDataFrame(
        [("r1", "Combo X", 100.0, 50.0, None),
         ("r2", "Papas", 30.0, 10.0, None)],
        "receipt_number string, item_name string, price double,"
        "cost double, modifiers string",
    )
    out = explode_combo_items(df).collect()
    # Combo with null modifiers silently dropped; non-combo kept.
    assert [r.item_name for r in out] == ["Papas"]


def test_explode_rename_is_variant_specific(spark):
    # This variant renames only 'chiken' (typo), not 'chicken', and
    # 'Coca' case-sensitively (reference: data_preparation.py:163-171).
    df = spark.createDataFrame(
        [("r1", "combo t", 10.0, 5.0,
          "Hamburguesa(Pollo chicken);Refresco(coca light)")],
        "receipt_number string, item_name string, price double,"
        "cost double, modifiers string",
    )
    names = {r.item_name for r in explode_combo_items(df).collect()}
    assert names == {"Pollo chicken", "coca light"}


def test_analyze_combo_choices(combo_data):
    out = {
        (r.item_name, r.choice): r.n
        for r in analyze_combo_choices(combo_data).collect()
    }
    # 'chicken'/'chiken' and case-insensitive 'coca' ARE standardized here.
    assert out == {
        ("Combo Pa' Dos", "Smash Burger"): 1,
        ("Combo Pa' Dos", "Chicken Burger"): 1,
        ("Combo Pa' Dos", "Agua Natural"): 1,
    }


def test_analyze_combo_choices_with_mayo(combo_data):
    out = {
        (r.item_name, r.burger, r.mayo_type): r.n
        for r in analyze_combo_choices_with_mayo(combo_data).collect()
    }
    assert out == {
        ("Combo Pa' Dos", "Smash Burger", "Ajo"): 1,
        ("Combo Pa' Dos", "Chicken Burger", "Chipotle"): 1,
    }
    mains = {
        (r.item_name, r.choice): r.n
        for r in combo_main_choice_counts(combo_data).collect()
    }
    assert mains[("Combo Pa' Dos", "Smash Burger")] == 1


def test_mayo_pairing_skips_refresco_position(spark):
    # Main order: burger, refresco, burger. Explode pairing is by overall
    # index over mains: burger@0→mayo[0]; refresco@1 none; burger@2 needs
    # mayo[2] which doesn't exist → None (reference index quirk).
    mods = (
        "Hamburguesa A(Smash uno);Refresco(Coca);Hamburguesa B(Chiken dos);"
        "Mayonesa(Ajo);Mayonesa(Chipotle)"
    )
    df = spark.createDataFrame(
        [("r1", "Combo raro", 10.0, 5.0, mods)],
        "receipt_number string, item_name string, price double,"
        "cost double, modifiers string",
    )
    by_name = {r.item_name: r for r in explode_combo_items(df).collect()}
    assert by_name["Smash Burger"].modifiers == "Mayonesa(Ajo)"
    assert by_name["Chicken Burger"].modifiers is None  # index 2 > 2 mayos
    # But the mayo ANALYSIS pairs mayos with burgers-in-order instead:
    pairs = {
        (r.burger, r.mayo_type): r.n
        for r in analyze_combo_choices_with_mayo(df).collect()
    }
    assert pairs == {
        ("Smash Burger", "Ajo"): 1,
        ("Chicken Burger", "Chipotle"): 1,
    }
