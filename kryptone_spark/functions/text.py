"""Text scalar functions as native Spark columns.

Column re-expressions of /root/reference/kryptone/utils/text.py and the
SEO mixins (/root/reference/kryptone/contrib/seo.py). Only transliteration
(``remove_accents``/``unidecode``) needs Python — provided as an
Arrow-vectorized pandas UDF, never row-at-a-time.
"""

from __future__ import annotations

import string
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def normalize_spaces(text: Column) -> Column:
    """text.py:138-145 — collapse runs of spaces, trim."""
    return F.trim(F.regexp_replace(text, " +", " "))


def clean_text(text: Column) -> Column:
    """text.py:48-56 — \\n/\\t → space, NFKD normalize, collapse
    spaces. NFKD of the raw string is unicode normalization; Spark has
    no builtin, but for crawl text the observable effect on our corpus
    is compatibility-char folding — handled in `nfkd` below when exact
    parity is required; the native path covers whitespace semantics."""
    t = F.regexp_replace(text, "[\\n\\t]", " ")
    return normalize_spaces(t)


@pandas_udf(StringType())
def nfkd(s: pd.Series) -> pd.Series:
    """Exact NFKD fold (text.py:53) — Arrow-batched extension point."""
    return s.map(lambda x: unicodedata.normalize("NFKD", x) if x is not None else None)


# Latin letters unidecode maps but NFKD cannot (they do not decompose
# into base + combining mark) — the common European divergences; full
# unidecode additionally transliterates non-Latin scripts. Cyrillic and
# Greek are covered by the vendored table below; CJK remains a
# documented divergence (passed through unchanged — unidecode would
# romanize to pinyin etc.), pinned by test_remove_accents_cjk_passthrough.
_NON_DECOMPOSABLE = str.maketrans(
    {
        "ß": "ss", "ẞ": "SS", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
        "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
        "þ": "th", "Þ": "Th", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
        "ı": "i", "ĸ": "k", "ŋ": "ng", "Ŋ": "NG", "ŧ": "t", "Ŧ": "T",
        # decompose into a base + a NON-combining mark (middle dot /
        # modifier apostrophe) that would survive the NFKD strip —
        # handled here so the ASCII invariant holds (the invariant is
        # pinned by test_remove_accents_ascii_invariant_for_covered_scripts)
        "ŀ": "l", "Ŀ": "L", "ŉ": "'n",
    }
)

_SCRIPT_TRANSLIT: dict[int, str] | None = None


def _script_translit() -> dict[int, str]:
    """Vendored Cyrillic (BGN/PCGN-derived) + Greek (classical)
    romanization table (data/translit_map.tsv), applied after the NFKD
    fold so precomposed accented forms (ё, ά, ΰ …) reduce to their base
    letter first. These are public standard romanizations in the style
    of the reference's unidecode (/root/reference/kryptone/utils/
    text.py:111-113); byte-exact unidecode parity for non-Latin scripts
    is NOT claimed — the table IS the engine contract, pinned by tests."""
    global _SCRIPT_TRANSLIT
    if _SCRIPT_TRANSLIT is None:
        import pathlib

        p = pathlib.Path(__file__).parent.parent / "data" / "translit_map.tsv"
        table: dict[int, str] = {}
        for line in p.read_text(encoding="utf-8").splitlines():
            if not line or line.startswith("#"):
                continue
            ch, _, ascii_ = line.partition("\t")
            table[ord(ch)] = ascii_
        _SCRIPT_TRANSLIT = table
    return _SCRIPT_TRANSLIT


_CJK_TRANSLIT: dict[int, str] | None = None


def _cjk_translit() -> dict[int, str]:
    """The CJK slice (codepoint ≥ U+3040) of the vendored table — the
    pre-NFKD pass. Only kana need translating BEFORE the NFKD fold
    (voiced kana are precomposed; NFKD splits them into base +
    combining voicing mark, and the mark strip would devoice が→ka);
    restricting the early pass to this range keeps the r3 Cyrillic/
    Greek contract byte-identical (e.g. precomposed ї still decomposes
    to і before the table fires)."""
    global _CJK_TRANSLIT
    if _CJK_TRANSLIT is None:
        _CJK_TRANSLIT = {
            cp: a for cp, a in _script_translit().items() if cp >= 0x3040
        }
    return _CJK_TRANSLIT


@pandas_udf(StringType())
def remove_accents(s: pd.Series) -> pd.Series:
    """text.py:111-113 — transliterate to ASCII. NFKD + combining-mark
    strip covers every composed Latin accent; _NON_DECOMPOSABLE covers
    the Latin letters with no decomposition — together unidecode-
    identical for European Latin text (guarantee pinned by
    test_remove_accents_european_corpus). Cyrillic/Greek/kana/Hangul/
    common hanzi romanize via the vendored table (r4 adds the CJK
    sections; rare hanzi outside the vendored set pass through — pinned
    divergence, test_remove_accents_cjk). The table applies TWICE:
    before the NFKD fold (voiced kana are precomposed; NFKD would split
    them into base + combining voicing mark and the mark strip would
    silently devoice が→ka) and after it (Hangul syllables only become
    table-mapped jamo, and ё-style precomposed Cyrillic only becomes a
    base letter, once NFKD has run). Table values are pure ASCII, so
    the second pass never re-touches first-pass output. The pre-pass is
    restricted to the CJK range so precomposed Cyrillic/Greek keep
    their r3 decompose-first behavior."""
    script = _script_translit()
    cjk = _cjk_translit()

    def _strip(x: str | None) -> str | None:
        if x is None:
            return None
        folded = x.translate(_NON_DECOMPOSABLE).translate(cjk)
        stripped = "".join(
            c
            for c in unicodedata.normalize("NFKD", folded)
            if not unicodedata.combining(c)
        )
        return stripped.translate(script)
    return s.map(_strip)


_PUNCT = string.punctuation


def remove_punctuation(text: Column, keep: str = "", email_exception: bool = False) -> Column:
    """text.py:96-108 — str.translate delete of string.punctuation,
    minus the keep-list / '@' for emails. Native via translate()."""
    punct = _PUNCT
    for ch in keep:
        punct = punct.replace(ch, "")
    if email_exception:
        punct = punct.replace("@", "")
    return F.translate(text, punct, "")


def slugify(text: Column) -> Column:
    """text.py:154-163 — spaces→'-', lower, unaccent. The accent strip
    is a pandas UDF; note Spark extracts Python UDFs into an
    ArrowEvalPython node evaluated for EVERY row before the CASE, so
    the ASCII branch only guards semantics (ASCII text is returned
    unchanged even if the unaccenter would alter it), not cost —
    callers with guaranteed-ASCII corpora should pre-filter."""
    base = F.lower(F.regexp_replace(text, " ", "-"))
    return F.when(base.rlike("^[\\x00-\\x7F]*$"), base).otherwise(remove_accents(base))


def parse_price(text: Column) -> Column:
    """text.py:20-45 — '4,4 €' → 4.4 and '4€4' → 4.4."""
    euro = F.regexp_extract(text, r"^(\d+)€(\d+)", 0) != ""
    euro_val = F.regexp_replace(F.regexp_extract(text, r"^(\d+€\d+)", 1), "€", ".")
    plain = F.regexp_extract(text, r"(\d+\,?\d+)", 1)
    picked = F.when(euro, euro_val).otherwise(
        F.when(plain != "", plain).otherwise(text)
    )
    # try_cast: Spark 4 defaults to ANSI mode, where a plain cast on a
    # price the regexes could not normalize would fail the whole stage
    # (the reference's float() raises a catchable per-call ValueError;
    # the engine's equivalent of "caught" is NULL)
    return F.replace(picked, F.lit(","), F.lit(".")).try_cast("double")


# ----- emails (seo.py:28, 587-643) -----

EMAIL_REGEX = r"\S+@\S+"


def tokenize(text: Column) -> Column:
    """Text.tokens: clean → lower → split on single space."""
    return F.split(F.lower(clean_text(text)), " ")


def extract_emails(text: Column) -> Column:
    """EmailMixin.find_emails_from_text: split cleaned text on spaces,
    keep tokens containing '@' that don't start with '@' (social
    handles skipped, seo.py:591-601), then validate \\S+@\\S+."""
    toks = F.split(clean_text(text), " ")
    return F.array_distinct(
        F.filter(
            toks,
            lambda t: t.contains("@") & ~t.startswith("@") & t.rlike(EMAIL_REGEX),
        )
    )


# ----- language/quality heuristics (training-data ops, engine-only) -----

STOPWORDS_EN = (
    "the", "of", "and", "a", "to", "in", "is", "it", "you", "that",
    "was", "for", "on", "are", "as", "with", "his", "they", "at",
)


def stopword_ratio(text: Column) -> Column:
    toks = F.split(F.lower(text), r"\s+")
    sw = F.lit(list(STOPWORDS_EN))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def token_count(text: Column) -> Column:
    """Whitespace token count — the BPE-ish proxy used for budget math.
    Empty/blank text counts 0 (split('') yields [''] — size 1 — which
    would inflate corpus budgets by one per empty doc)."""
    return F.when(
        F.length(F.trim(text)) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(text), r"\s+")))


def quality_score(text: Column) -> Column:
    """Composite length/punctuation/stopword quality heuristic in
    [0,1]; fully native so it runs at scan speed over 100 TB."""
    n_chars = F.length(text)
    punct_ratio = (
        n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    ).cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    len_score = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(text)
    sw_score = F.least(sw * 4.0, F.lit(1.0))
    return F.round(
        0.4 * len_score + 0.4 * sw_score + 0.2 * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))),
        6,
    )


def fingerprint64(text: Column) -> Column:
    """Deterministic 64-bit document fingerprint (xxhash64 of the
    space-normalized lowercase text) — rolling-hash stand-in."""
    return F.xxhash64(normalize_spaces(F.lower(text)))
