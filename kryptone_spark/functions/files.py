"""F13 filename/directory derivation as native Spark columns.

Column re-expressions of /root/reference/kryptone/utils/functions.py:12-79
(`directory_from_breadcrumbs`, `directory_from_url`, `create_filename`).
Everything stays in whole-stage codegen except the accent fold, which
reuses the slugify pattern: an ASCII guard keeps the pandas UDF off the
hot path semantically (ASCII dirs pass through unchanged).
"""

from __future__ import annotations

import re
import string

from pyspark.sql import Column
from pyspark.sql import functions as F

from kryptone_spark.functions.text import normalize_spaces, remove_accents

# string.punctuation with the underscore kept (functions.py:57 passes
# keep=['_'] — '-' is rewritten to '_' before the punctuation strip)
_PUNCT_KEEP_UNDERSCORE = string.punctuation.replace("_", "")


def directory_from_url(path: Column, exclude: tuple[str, ...] = ()) -> Column:
    """functions.py:41-62 — derive the logical media directory from a
    URL path: split on '/', drop empties and the `exclude` list (raw
    token match, pre-cleaning), per-token '-'→'_' + lower + punctuation
    strip (keep '_') + unaccent, drop the last segment (the page
    itself), join with '/'. The reference returns a pathlib.Path with
    no leading slash; the column returns the same string form."""
    toks = F.split(path, "/")
    kept = F.filter(
        toks,
        (lambda t: (t != "") & ~t.isin(*exclude)) if exclude else (lambda t: t != ""),
    )
    cleaned = F.transform(
        kept,
        lambda t: F.translate(
            F.lower(F.regexp_replace(t, "-", "_")), _PUNCT_KEEP_UNDERSCORE, ""
        ),
    )
    dirs = F.slice(cleaned, 1, F.greatest(F.size(cleaned) - 1, F.lit(0)))
    joined = F.concat_ws("/", dirs)
    # accent fold only off the ASCII fast path (slugify pattern —
    # functions/text.py); the reference unaccents per token, but
    # remove_accents is character-wise so folding the joined string is
    # equivalent ('/' is untouched)
    return F.when(joined.rlike("^[\\x00-\\x7F]*$"), joined).otherwise(
        remove_accents(joined)
    )


def directory_from_breadcrumbs(
    text: Column,
    separator: str = ">",
    remove_last: bool = True,
    exclude: tuple[str, ...] = (),
) -> Column:
    """functions.py:12-39 — breadcrumb trail to directory: lower +
    space-normalize, split on the separator, drop the last token (the
    current page), strip, drop `exclude` matches, strip ALL punctuation
    (no keep-list here — '_' goes too, matching the reference), spaces
    → '_', join with '/'. Accents are KEPT (the reference's docstring
    example preserves 'bébé_fille')."""
    clean = normalize_spaces(F.lower(text))
    toks = F.split(clean, re.escape(separator))
    if remove_last:
        toks = F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    # NOT F.transform(toks, F.trim): trim's optional second param makes
    # transform bind the element INDEX as the trim character set
    toks = F.transform(toks, lambda t: F.trim(t))
    if exclude:
        toks = F.filter(toks, lambda t: ~t.isin(*exclude))
    built = F.transform(
        toks,
        lambda t: F.lower(
            F.regexp_replace(F.translate(t, string.punctuation, ""), " ", "_")
        ),
    )
    return F.concat_ws("/", built)


def derived_filename(
    key: Column,
    length: int = 5,
    extension: str | None = None,
    suffix: str | None = None,
) -> Column:
    """functions.py:64-79 create_filename, made deterministic: the
    reference draws `length` random [a-z0-9] chars — unusable in a
    distributed engine (retries/speculative tasks must produce the same
    name), so the engine derives them from md5(key) (hex ⊂ [a-z0-9]).
    Same shape: optional '_suffix' and '.extension'. The date-suffix
    variant is the caller's composition (dates.current_date_str)."""
    name = F.substring(F.md5(key.cast("string")), 1, length)
    if suffix is not None:
        name = F.concat(name, F.lit("_" + suffix))
    if extension is not None:
        name = F.concat(name, F.lit("." + extension))
    return name
