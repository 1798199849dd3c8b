"""Value repair options: clamp/repair transforms for KGTK values.

Reference: kgtk/value/kgtkvalueoptions.py:28-105 — the repair-flag
family the reference's KgtkValue applies while validating. The lax
regexes in kgtk_spark.values already ACCEPT these shapes; this
operator REWRITES them, as the reference does when the corresponding
repair/clamp flag is set:

- repair_month_or_day_zero: ^1990-00-00… → ^1990-01-01…
- end_of_day_as_next_day (allow_end_of_day repair form): T24:00:00
  rolls to 00:00:00 of the next calendar day
- clamp_minimum_year / clamp_maximum_year (defaults 1583 / 2100)
- clamp lat to [-90, 90], lon to [-180, 180]; modulo_repair_lon wraps
  longitude into range instead of clamping
- repaired coordinates re-serialize as %011.6f/%011.6f, the
  reference's canonical lat/lon formatting

All transforms are Catalyst expressions applied to the requested
string columns; non-matching values pass through untouched.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MINIMUM_VALID_YEAR = 1583
MAXIMUM_VALID_YEAR = 2100


@dataclass
class ValueRepairOptions:
    repair_month_or_day_zero: bool = False
    end_of_day_as_next_day: bool = False
    clamp_minimum_year: bool = False
    clamp_maximum_year: bool = False
    minimum_valid_year: int = MINIMUM_VALID_YEAR
    maximum_valid_year: int = MAXIMUM_VALID_YEAR
    clamp_minimum_lat: bool = False
    clamp_maximum_lat: bool = False
    clamp_minimum_lon: bool = False
    clamp_maximum_lon: bool = False
    modulo_repair_lon: bool = False


_DATE_SIGIL = r"^\^"
_LOCATION = r"^@(-?[0-9.eE+]+)/(-?[0-9.eE+]+)$"


def _repair_date(c: Column, o: ValueRepairOptions) -> Column:
    is_date = c.rlike(_DATE_SIGIL)
    out = c
    if o.repair_month_or_day_zero:
        # month 00 → 01, then day 00 → 01 (kgtkvalueoptions.py:31-33)
        out = F.when(
            is_date, F.regexp_replace(out, r"^(\^[0-9]{4})-00", "$1-01")
        ).otherwise(out)
        out = F.when(
            is_date,
            F.regexp_replace(out, r"^(\^[0-9]{4}-[0-9]{2})-00", "$1-01"),
        ).otherwise(out)
    if o.end_of_day_as_next_day:
        ymd = F.regexp_extract(out, r"^\^([0-9]{4}-[0-9]{2}-[0-9]{2})T24:00(:00)?", 1)
        rolled = F.date_format(F.date_add(F.try_to_date(ymd), 1), "yyyy-MM-dd")
        # rolled.isNotNull(): shape-valid but calendar-invalid dates
        # (^2020-02-30T24:00) pass through unchanged instead of nulling
        out = F.when(
            is_date & (ymd != "") & rolled.isNotNull(),
            F.concat(
                F.lit("^"),
                rolled,
                F.lit("T00:00:00"),
                F.regexp_extract(out, r"T24:00(?::00)?(.*)$", 1),
            ),
        ).otherwise(out)
    year = F.regexp_extract(out, r"^\^([0-9]{4})", 1)
    has_year = year != ""
    if o.clamp_minimum_year:
        out = F.when(
            is_date & has_year & (year.cast("int") < o.minimum_valid_year),
            F.regexp_replace(
                out, r"^\^[0-9]{4}", "^" + f"{o.minimum_valid_year:04d}"
            ),
        ).otherwise(out)
    if o.clamp_maximum_year:
        out = F.when(
            is_date & has_year & (year.cast("int") > o.maximum_valid_year),
            F.regexp_replace(
                out, r"^\^[0-9]{4}", "^" + f"{o.maximum_valid_year:04d}"
            ),
        ).otherwise(out)
    return out


def _repair_location(c: Column, o: ValueRepairOptions) -> Column:
    lat = F.regexp_extract(c, _LOCATION, 1)
    lon = F.regexp_extract(c, _LOCATION, 2)
    is_loc = lat != ""
    latd = lat.cast("double")
    lond = lon.cast("double")
    changed = F.lit(False)
    if o.clamp_minimum_lat:
        changed = changed | (latd < -90.0)
        latd = F.greatest(latd, F.lit(-90.0))
    if o.clamp_maximum_lat:
        changed = changed | (latd > 90.0)
        latd = F.least(latd, F.lit(90.0))
    if o.modulo_repair_lon:
        changed = changed | (lond < -180.0) | (lond > 180.0)
        lond = ((lond + 180.0) % 360.0 + 360.0) % 360.0 - 180.0
    else:
        if o.clamp_minimum_lon:
            changed = changed | (lond < -180.0)
            lond = F.greatest(lond, F.lit(-180.0))
        if o.clamp_maximum_lon:
            changed = changed | (lond > 180.0)
            lond = F.least(lond, F.lit(180.0))
    repaired = F.concat(
        F.lit("@"),
        F.format_string("%011.6f", latd),
        F.lit("/"),
        F.format_string("%011.6f", lond),
    )
    return F.when(is_loc & changed, repaired).otherwise(c)


def repair_values(
    df: DataFrame,
    options: ValueRepairOptions,
    columns: tuple[str, ...] = ("node2",),
) -> DataFrame:
    """Apply the enabled repair transforms to the given value columns."""
    out = df
    for col in columns:
        c = F.col(col)
        c = _repair_date(c, options)
        if (
            options.clamp_minimum_lat
            or options.clamp_maximum_lat
            or options.clamp_minimum_lon
            or options.clamp_maximum_lon
            or options.modulo_repair_lon
        ):
            c = _repair_location(c, options)
        out = out.withColumn(col, c)
    return out
