"""Fast text-normalization column builders (r12).

Why this exists: in this Spark build (4.1.x), regex scalar functions
take a ~100× slow path when the pattern contains certain NEGATED
character classes — measured on 500k × 300-char rows, local[32]:

    regexp_replace(text, '[^a-z0-9 ]', '')    ~24 s
    rlike '[^a-z0-9 ]' / regexp_count / instr ~24 s
    regexp_extract_all(text, '[a-z0-9 ]+')     0.2 s   (positive class)
    split / translate / md5                    <0.6 s
    regexp_replace(text, 'xyz', '')            0.3 s   (literal)
    regexp_extract_all(text, '\\w+|[^\\w\\s]') 0.6 s   (alternation ok)

The corpus normalization used by the whole fingerprint/dedup family
(lowercase → strip non-[a-z0-9 ] → collapse space runs → trim) was
therefore regex-bound at ~85% of those queries' wall time (the r11
VERDICT's ×100 md5-fingerprint band, 17-22 s each). The builders here
produce BYTE-IDENTICAL strings from positive-class primitives only:
matches of the KEPT alphabet are extracted and re-joined, which is the
same string regexp_replace of the complement produces, on any input —
verified cell-for-cell against the negated-class form over every
fixture corpus plus NULL/empty/all-junk edges (tests/test_units.py).

NULL handling: regexp_replace propagates NULL, but concat_ws('') maps a
NULL array to '' — so every builder carries an explicit isNull guard to
stay NULL-preserving like the form it replaces.

The DuckDB oracles keep the negated-class regexp_replace spelling:
values are equal by construction, and keeping the oracle side in the
canonical SQL form preserves the differential check's independence.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _null_preserving(src: Column, out: Column) -> Column:
    return F.when(src.isNull(), F.lit(None).cast("string")).otherwise(out)


def keep_alphabet(col: Column, alphabet: str) -> Column:
    """``regexp_replace(col, '[^<alphabet>]', '')`` via the fast path:
    concatenated matches of the positive class ``[<alphabet>]+``."""
    joined = F.concat_ws(
        "", F.regexp_extract_all(col, F.lit(f"[{alphabet}]+"), F.lit(0))
    )
    return _null_preserving(col, joined)


def normalized_text(col: Column) -> Column:
    """The corpus fingerprint normalization — byte-identical to
    ``trim(regexp_replace(regexp_replace(lower(col), '[^a-z0-9 ]', ''),
    ' +', ' '))``: lowercase, strip everything outside [a-z0-9 ],
    collapse space runs, trim. Splitting the junk-stripped string on
    single spaces, dropping empty tokens, and re-joining with one space
    IS collapse+trim."""
    stripped = F.concat_ws(
        "",
        F.regexp_extract_all(F.lower(col), F.lit("[a-z0-9 ]+"), F.lit(0)),
    )
    joined = F.array_join(
        F.filter(F.split(stripped, " "), lambda t: t != F.lit("")), " "
    )
    return _null_preserving(col, joined)


def alnum_lower(col: Column) -> Column:
    """``regexp_replace(lower(col), '[^a-z0-9]', '')`` — the space-free
    char-gram normalization (winnowing / content-defined chunking)."""
    return keep_alphabet(F.lower(col), "a-z0-9")


def alnum(col: Column) -> Column:
    """``regexp_replace(col, '[^A-Za-z0-9]', '')`` — case-preserving
    alphanumeric projection (readability / quality-ratio scores)."""
    return keep_alphabet(col, "A-Za-z0-9")
