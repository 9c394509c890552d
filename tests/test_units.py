"""tests for the unit-string algebra (pint replacement)"""

import pytest

from newton_krylov_ooc_tpu.utils.units import (
    unit_conversion_factor,
    units_equal,
    units_str_format,
)


# canonical-format cases pinned to the behavior the reference's test suite
# requires of pint-based formatting (tests/test_utils.py:32-55 in the reference)
@pytest.mark.parametrize(
    "units_str, expected",
    [
        ("years m", "years m"),
        ("mmol / m^3 m", "mmol / m^2"),
        ("mmol / m^3 / d m", "mmol / m^2 / d"),
        ("1 / d m", "m / d"),
        ("mol / m^3 m", "mol / m^2"),
        ("(years) (m)", "years m"),
        ("(mmol / m^3) (m)", "mmol / m^2"),
        ("(mmol / m^3 / d) (m)", "mmol / m^2 / d"),
        ("(1 / d) (m)", "m / d"),
        ("(mol / m^3) (m)", "mol / m^2"),
        ("m years", "years m"),
        ("m mmol / m^3", "mmol / m^2"),
        ("m mmol / m^3 / d", "mmol / m^2 / d"),
        ("m 1 / d", "m / d"),
        ("m mol / m^3", "mol / m^2"),
        ("(mmol / m^3) (m) (m)", "mmol / m"),
        ("1 / s", "1 / s"),
        ("mmol / m^3 / s", "mmol / m^3 / s"),
    ],
)
def test_units_str_format(units_str, expected):
    assert units_str_format(units_str) == expected


@pytest.mark.parametrize(
    "units_from, units_to, factor",
    [
        ("mol / m^3", "mmol / m^3", 1000.0),
        ("mmol / m^3", "mol / m^3", 1.0e-3),
        ("m / d", "m / s", 1.0 / 86400.0),
        ("km", "m", 1000.0),
        ("years", "d", 365.0),
        ("mmol / m^2", "mol / m^2", 1.0e-3),
    ],
)
def test_unit_conversion_factor(units_from, units_to, factor):
    assert unit_conversion_factor(units_from, units_to) == pytest.approx(
        factor, rel=1e-14
    )


def test_incompatible_units_raise():
    with pytest.raises(ValueError):
        unit_conversion_factor("m", "s")


def test_units_equal():
    assert units_equal("mmol / m^3", "mmol / m^3")
    assert units_equal("m / d / m^3", "1 / d / m^2")
    assert not units_equal("mol / m^3", "mmol / m^3")
