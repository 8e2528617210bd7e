"""HTML extraction primitives (operators/html.py) + the robots gate
tie-breaks. Full-corpus value gates: html_text_extract,
html_block_link_density, robots_txt_gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.html import (
    anchor_texts,
    html_to_text,
    link_chars,
)


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(html_to_text(F.col("h")).alias("t")).collect()[0].t


def test_script_style_content_never_leaks(spark):
    got = _extract(
        spark,
        "<p>keep</p><script>var a = 1 < 2; drop()</script>"
        "<style>p { color: red }</style><p>also</p>",
    )
    assert got == "keep also"


def test_entity_decode_order_no_double_decode(spark):
    # '&amp;lt;' must decode to the literal '&lt;', never to '<'
    got = _extract(spark, "<p>&amp;lt; &amp; &lt;x&gt; &quot;q&quot; &#39;s&#39;</p>")
    assert got == "&lt; & <x> \"q\" 's'"


def test_whitespace_collapse_and_trim(spark):
    got = _extract(spark, "  <div> a\t b </div>\n <p>c</p>  ")
    assert got == "a b c"


def test_anchor_texts_and_link_chars(spark):
    df = spark.createDataFrame(
        [('<a href="/">Home</a> x <a id="2" href="/b">About us</a>',)],
        "h string",
    )
    row = df.select(
        anchor_texts(F.col("h")).alias("a"),
        link_chars(F.col("h")).alias("n"),
    ).collect()[0]
    assert row.a == ["Home", "About us"]
    assert row.n == len("Home") + len("About us")


def test_robots_longest_match_and_allow_tie(spark):
    """RFC 9309 tie-breaks on hand-built paths via the registry
    entry's exact rule set."""
    from advisorydatapipeline_spark.queries.web_queries import ROBOTS_RULES

    def verdict(path: str):
        best = (0, None, None)  # (length, allow_rank, allow)
        for allow, prefix in ROBOTS_RULES:
            if path.startswith(prefix):
                key = (len(prefix), 1 if allow else 0)
                if key > (best[0], best[1] or 0):
                    best = (len(prefix), 1 if allow else 0, allow)
        return best[2] if best[2] is not None else True

    assert verdict("/cat1/page8") is False  # /cat1/ disallow
    assert verdict("/cat1/page15") is True  # /cat1/page1 PREFIX allow
    assert verdict("/cat3/page24") is False  # /cat3/page2 prefix
    assert verdict("/cat3/page3") is True  # no match -> allowed
    assert verdict("/cat6/page5") is True  # equal-length tie -> allow


def test_luhn_valid_real_mod10(spark):
    from advisorydatapipeline_spark.operators.html import luhn_valid
    from advisorydatapipeline_spark.queries.web_queries import PII_CARDS

    def luhn_py(s):
        tot = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d = d * 2 - (9 if d > 4 else 0)
            tot += d
        return tot % 10 == 0

    df = spark.createDataFrame([(c,) for c in PII_CARDS], "c string")
    got = {r.c: r.ok for r in df.select("c", luhn_valid(F.col("c")).alias("ok")).collect()}
    for c in PII_CARDS:
        assert got[c] == luhn_py(c), c
    assert sum(got.values()) == 4  # fixture invariant: 4 valid, 4 not
