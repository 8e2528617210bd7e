"""Round-13 scale points (same protocol as tools/r9-r12_scale_smoke):

- huff8: x1-x8 row for mp3_huffman_decode (documents) — a
  zero-shuffle mapInPandas hop (byte-build + genuine bitstream
  decode); done-criterion is a slope tracking input like the other
  per-doc codec hops (mp3_granule_synthesis 2.77, wav_dft_bands 1.04
  at x8).
- poly8: x1-x8 row for mp3_polyphase_synthesis (documents) — the
  final filterbank stage, same hop shape.
- kn8: x1-x8 row for kn_bigram_scores (documents) — the
  interpolated Kneser-Ney bigram LM filter; done-criterion is the
  lm_perplexity_scores shape (hash partial-aggs on n-gram keys).
- pref8: x1-x8 rows for dpo_pair_builder / self_consistency_vote /
  nucleus_topp_plan (events) — per-prompt bounded windows; ~flat.
- cal8: x1-x8 row for quant_calibration_absmax (embeddings) —
  channel-partitioned order statistics; tracks corpus rows.
- suffix8: x1-x8 row for suffix_dup_depths (documents) — the
  prefix-doubling suffix-rank dedup primitive; done-criterion is a
  near-linear slope (every shuffle is O(corpus chars) fixed-width
  rows; rounds are depth-logarithmic, constant in corpus size).

Usage: python tools/r13_scale_smoke.py [sf_dir] [sections]
  sections: comma list from {huff8, poly8, suffix8, kn8, pref8}; default ALL.
Prints markdown rows; SCALE.md sections are appended manually from
this output (scale_smoke.py owns the main table).
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from advisorydatapipeline_spark.registry import QUERIES  # noqa: E402
from advisorydatapipeline_spark.session import get_spark  # noqa: E402

from r11_scale_smoke import run_family  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sections = (
        set(sys.argv[2].split(","))
        if len(sys.argv) > 2
        else {"huff8", "poly8", "suffix8", "kn8", "pref8", "cal8"}
    )
    spark = get_spark("r13-scale-smoke")
    with tempfile.TemporaryDirectory(dir="/tmp") as base:
        if "huff8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "mp3_huffman_decode (documents)",
                ("mp3_huffman_decode",),
                ("documents",),
            )
        if "poly8" in sections and "mp3_polyphase_synthesis" in QUERIES:
            run_family(
                spark,
                sf_dir,
                base,
                "mp3_polyphase_synthesis (documents)",
                ("mp3_polyphase_synthesis",),
                ("documents",),
            )
        if "suffix8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "suffix_dup_depths (documents)",
                ("suffix_dup_depths",),
                ("documents",),
            )
        if "pref8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "dpo_pair_builder / self_consistency_vote / nucleus (events)",
                ("dpo_pair_builder", "self_consistency_vote", "nucleus_topp_plan"),
                ("events",),
            )
        if "cal8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "quant_calibration_absmax (embeddings)",
                ("quant_calibration_absmax",),
                ("embeddings",),
            )
        if "kn8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "kn_bigram_scores (documents)",
                ("kn_bigram_scores",),
                ("documents",),
            )


if __name__ == "__main__":
    main()
