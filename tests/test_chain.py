"""End-to-end composed-chain test: the full curation pipeline
(extract -> length gate -> line_dedup -> minhash near-dup -> decontaminate ->
pack_sequences -> sharded export) over a small deterministic corpus, inside
the session Ray fixture. Guards the cross-operator API contract the scale
cell (tools/chain_cell.py) measures at 200k docs."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_full_chain_small(ray_session):
    from chain_cell import run_chain

    timings, counts, (lo, hi) = run_chain(rows=2000, budget=512, num_files=4)

    assert counts["input_docs"] == 2000
    # the percentile gate keeps ~90%
    assert 0.85 * 2000 <= counts["after_length_gate"] <= 0.95 * 2000
    # every planted exact dup must be recovered (J=1.0 pairs) and dropped,
    # with zero false drops: survivors == pre-plant count
    assert counts["neardup_dropped"] == counts["after_plant"] - counts["after_length_gate"]
    assert counts["neardup_dropped"] > 0
    assert counts["after_neardup"] == counts["after_length_gate"]
    # the 200-doc benchmark slice contaminates exactly itself on random text
    assert counts["decontam_dropped"] == 200
    assert counts["final_docs"] == counts["after_neardup"] - 200
    # packing emits one row per surviving doc; export covers all shards
    assert counts["packed_rows"] == counts["final_docs"]
    assert counts["export_shards"] == 32
    assert 0 < lo < hi
