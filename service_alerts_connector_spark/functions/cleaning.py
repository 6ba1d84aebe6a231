"""Cleaning/typing column expressions (reference Fixer scalars F1-F8, F13-F16).

Each function returns a pyspark Column built only from built-in functions, so
the whole Fixer chain folds into a single ProjectExec under whole-stage
codegen — the Spark-idiomatic replacement for the reference's row-at-a-time
``DataFrame.apply(axis=1)`` loops (ServiceAlertFixer.py:54-80).

Reference cites are into /root/reference/src/cct_connector/.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference ServiceAlertFixer.py:17-19.
REQUEST_NUMBER_PATTERN = r"^[0-9]{10}$"
TIME_PATTERN = r"^[0-9]{2}:[0-9]{2}$"


def clean_notification_number(col: Column) -> Column:
    """F1 — validate ``^\\d{10}$`` then zero-pad to 12 digits.

    Reference ServiceAlertFixer.py:17-18, 27-29 (``f"{int(val):012d}"``).
    Invalid/blank references null out.
    """
    trimmed = F.trim(col)
    return F.when(
        trimmed.rlike(REQUEST_NUMBER_PATTERN),
        F.format_string("%012d", trimmed.cast("long")),
    )


def planned_flag(col: Column) -> Column:
    """F2 — categorical {"Planned","Unplanned"} → boolean.

    Reference ServiceAlertFixer.py:31.  Unknown strings null out rather than
    silently mapping (the reference's dict.get would KeyError-to-NaN).
    """
    return (
        F.when(col == "Planned", F.lit(True))
        .when(col == "Unplanned", F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def parse_sast_timestamp(col: Column) -> Column:
    """F3 — parse ISO timestamp strings and normalize to SAST wall-clock.

    Reference ServiceAlertFixer.py:33-35 parses then ``tz_convert('+02:00')``.
    In Spark, TimestampType is an instant; we parse the ISO string (honouring
    any offset/Z suffix) and store the instant.  Rendering in SAST is a
    serving-time concern (session tz or date_format with tz).
    """
    return F.to_timestamp(col)


def expiry_plus_one_day(col: Column) -> Column:
    """F4 — alert expiry is pushed out by one day on clean.

    Reference ServiceAlertFixer.py:37-39.
    """
    return parse_sast_timestamp(col) + F.expr("INTERVAL 1 DAY")


def duration(expiry: Column, publish: Column) -> Column:
    """F5 — ``duration = expiry_date - publish_date`` as a day-time interval.

    Reference ServiceAlertFixer.py:41.
    """
    return expiry - publish


def repair_time_string(col: Column) -> Column:
    """F6 — repair dirty ``HH:MM`` strings, null anything unparseable.

    Reference ServiceAlertFixer.py:19, 43-52: ``"60"→"59"`` (e.g. "24:60"),
    ``"Select..."→"00"``-style garbage, then a strict HH:MM gate.
    Output: a clean ``HH:mm`` string or null.
    """
    repaired = F.regexp_replace(
        F.regexp_replace(F.trim(col), ":60$", ":59"), r"^Select.*$", "00:00"
    )
    return F.when(repaired.rlike(TIME_PATTERN), repaired)


def combine_date_time(date_col: Column, time_str: Column) -> Column:
    """F7 — ``datetime.combine(date, time)``: date part of one timestamp +
    a repaired ``HH:mm`` string → new timestamp.

    Reference ServiceAlertFixer.py:54-65.  Built from make_timestamp so the
    whole thing stays codegen'd.  Hours "24" roll over via modular arithmetic
    exactly like the reference's repaired strings (24:59 → parse failure in
    pandas too, so we gate to 00-23 and null otherwise).
    """
    clean = repair_time_string(time_str)
    hh = F.substring(clean, 1, 2).cast("int")
    mm = F.substring(clean, 4, 2).cast("int")
    valid = (hh >= 0) & (hh <= 23) & (mm >= 0) & (mm <= 59)
    return F.when(
        date_col.isNotNull() & clean.isNotNull() & valid,
        F.make_timestamp(
            F.year(date_col),
            F.month(date_col),
            F.dayofmonth(date_col),
            hh,
            mm,
            F.lit(0),
        ),
    )


def rollover_end_timestamp(start_ts: Column, end_ts: Column) -> Column:
    """F4b — if a forecast end lands at/before the start, it means "next day".

    Reference ServiceAlertFixer.py:83-88.
    """
    return F.when(
        end_ts.isNotNull() & start_ts.isNotNull() & (end_ts <= start_ts),
        end_ts + F.expr("INTERVAL 1 DAY"),
    ).otherwise(end_ts)


def coalesce_location(
    address_location: Column, description: Column, all_location_selected: Column
) -> Column:
    """F8 — conditional coalesce with a prefix-overlap test.

    Reference ServiceAlertFixer.py:66-80: prefer the free-text address
    location *unless* it is just a prefix-duplicate of the description (one
    is a prefix of the other), in which case fall back to the controlled
    ``All Location Selected`` value.
    """
    loc = F.trim(address_location)
    desc = F.trim(description)
    shorter = F.least(F.length(loc), F.length(desc))
    left = loc.substr(F.lit(1), shorter)
    right = desc.substr(F.lit(1), shorter)
    is_prefix_dup = loc.isNotNull() & desc.isNotNull() & (left == right)
    return (
        F.when(loc.isNotNull() & ~F.coalesce(is_prefix_dup, F.lit(False)), loc)
        .when(F.trim(all_location_selected) != "", F.trim(all_location_selected))
        .otherwise(F.lit(None).cast("string"))
    )


def iso_format(col: Column) -> Column:
    """F14 — ``strftime('%Y-%m-%dT%H:%M:%S')`` (pre-LLM serialization).

    Reference ServiceAlertAugmenter.py:594-597.
    """
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")


def toot_from_tweet(tweet: Column, hashtag: Column) -> Column:
    """F16 — toot = tweet + "\\n" + hashtag + " #CapeTown".

    Reference ServiceAlertAugmenter.py:626-631.
    """
    return F.when(
        tweet.isNotNull(),
        F.concat_ws(
            "\n", tweet, F.concat_ws(" ", hashtag, F.lit("#CapeTown"))
        ),
    )
