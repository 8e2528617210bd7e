"""HTML main-text extraction primitives (WET-style), built-ins only —
the stage-1 step of every web-corpus pipeline (CommonCrawl WET,
trafilatura-lite): strip script/style subtrees, strip tags, decode
the five standard XML character entities, collapse whitespace; plus
per-block link-density boilerplate classification (Kohlschütter-style
density heuristic reduced to its SQL-expressible core).

Everything here is a Column-level expression chain in the shared
Java-regex/RE2 subset (no backreferences, no lookaround, lazy
quantifiers only inside single-line fixtures), so the DuckDB oracles
replay extraction byte-for-byte. Whole-stage codegen, no UDFs, no
shuffle — at 100 TB this fuses into the scan exactly like
canonicalize_urls.

Reference twin: none — the reference (Idanconley123/advisoryDataPipeline)
has no web-corpus stage; north-star surface (SURVEY.md §2
beyond-reference block).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# decode order is part of the spec: named/numeric entities first,
# ampersand LAST so '&amp;lt;' decodes to the literal '&lt;', never
# to '<' (the classic double-decode bug)
HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def strip_script_style(col: Column) -> Column:
    """Remove <script>...</script> and <style>...</style> subtrees
    (their text is code, not content). Two passes — the shared regex
    subset has no backreferences to pair the tag names in one."""
    out = F.regexp_replace(col, "<script[^>]*>.*?</script>", " ")
    return F.regexp_replace(out, "<style[^>]*>.*?</style>", " ")


def strip_tags(col: Column) -> Column:
    return F.regexp_replace(col, "<[^>]*>", " ")


def decode_entities(col: Column) -> Column:
    out = col
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def collapse_ws(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, "\\s+", " "))


def html_to_text(col: Column) -> Column:
    """The full extraction chain: scripts/styles -> tags -> entities
    -> whitespace."""
    return collapse_ws(decode_entities(strip_tags(strip_script_style(col))))


def anchor_texts(col: Column) -> Column:
    """array<string> of <a ...>anchor text</a> contents (non-nested
    anchors, the HTML-sane case)."""
    return F.regexp_extract_all(col, F.lit("<a [^>]*>([^<]*)</a>"), F.lit(1))


def link_chars(col: Column) -> Column:
    """Total characters inside anchors — the numerator of the
    link-density boilerplate heuristic."""
    return F.aggregate(
        F.transform(anchor_texts(col), lambda t: F.length(t)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


# --- multiclass PII detection (r11) -----------------------------------
# patterns kept to the Java-regex/RE2 shared subset (no backrefs)

PHONE_RE = r"\+1-555-[0-9]{4}"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
CARD_RE = r"\b[0-9]{16}\b"


def luhn_valid(card: Column) -> Column:
    """REAL Luhn mod-10 check (ISO/IEC 7812) over a 16-digit string
    column, as pure integer expression arithmetic: from the right,
    every second digit doubles (minus 9 when it overflows a digit).
    For a 16-char string, from-right-even positions are from-left-odd
    (1-based)."""
    return (
        F.aggregate(
            F.sequence(F.lit(1), F.lit(16)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(
                i % 2 == 1,
                (F.ascii(card.substr(i, F.lit(1))) - 48) * 2
                - F.when(
                    F.ascii(card.substr(i, F.lit(1))) - 48 > 4, F.lit(9)
                ).otherwise(F.lit(0)),
            ).otherwise(F.ascii(card.substr(i, F.lit(1))) - 48),
        )
        % 10
        == 0
    )
