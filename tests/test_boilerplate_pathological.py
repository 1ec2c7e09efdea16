"""Pathological-shape pin for boilerplate_scrub (VERDICT r2 ask #7).

The order-restoring reassembly costs one collect_list + array_sort per
doc, claimed bounded by DOC length, not corpus size. This test drives
the factored core with a single 10,000-segment document (40k words —
far beyond web-page p99) and checks (a) it completes, (b) survivors
come back in exact original order, (c) the boilerplate count is exact.
"""

from __future__ import annotations

from curator_spark.queries.dedupq import (
    BP_MIN_DOCS,
    BP_SEG_WORDS,
    boilerplate_scrub_frame,
)

N_SEGS = 10_000
BP_EVERY = 7  # every 7th segment of doc 0 is shared boilerplate


def _seg(tag: str, i: int) -> str:
    return " ".join(f"{tag}{i}w{j}" for j in range(BP_SEG_WORDS))


def test_boilerplate_scrub_10k_segment_doc(spark):
    shared = [_seg("bp", i) for i in range(N_SEGS // BP_EVERY + 1)]
    doc0_segs = []
    bp_positions = []
    si = 0
    for pos in range(N_SEGS):
        if pos % BP_EVERY == 0:
            doc0_segs.append(shared[si])
            bp_positions.append(pos)
            si += 1
        else:
            doc0_segs.append(_seg("u", pos))
    rows = [(0, " ".join(doc0_segs))]
    # enough supporting docs that every shared segment hits BP_MIN_DOCS
    for d in range(1, BP_MIN_DOCS):
        rows.append((d, " ".join(shared)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = {
        r["doc_id"]: r
        for r in boilerplate_scrub_frame(df).collect()
    }
    want_clean = " ".join(
        s for pos, s in enumerate(doc0_segs) if pos % BP_EVERY != 0
    )
    assert out[0]["n_removed"] == len(bp_positions)
    assert out[0]["clean_text"] == want_clean  # exact original order
    # the supporting docs are pure boilerplate
    for d in range(1, BP_MIN_DOCS):
        assert out[d]["clean_text"] == ""
        assert out[d]["n_removed"] == len(shared)
