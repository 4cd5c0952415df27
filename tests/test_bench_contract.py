"""The bench stdout contract: the driver retains only a bounded tail
of stdout (~2000 chars, observed via BENCH_r0x.json "tail") and parses
the LAST JSON line. Rounds 5-10 silently lost their parsed bench
numbers because the single output line outgrew that window; these
tests pin the r11 fix.
"""

import json

import bench


def _lines():
    times = {name: 123.456 for name in [
        "generate_mixed_2m", "text_features", "dedup_minhash",
        "dedup_simhash", "ann_topk", "ann_lsh", "ann_ivf",
        "ann_ivf_index", "ann_quantized", "pricing_summary",
        "top_revenue", "events_sessionize", "user_running_value",
        "skew_salted_agg", "data_split", "corpus_vocab",
        "decontaminate", "pack_sequences", "curate", "events_asof",
        "events_range_join", "events_rollup", "events_gapfill",
        "events_percentiles", "dedup_semantic", "tfidf_keywords",
        "doc_chunks", "corpus_mix", "dedup_incremental",
        "stratified_sample", "duplicate_spans", "unigram_nll",
        "repetition_features", "events_funnel", "events_retention",
        "collocations", "token_divergence", "quality_band", "zipf_fit",
        "url_dedup", "language_confidence", "paragraph_dedup",
        "pack_order",
    ]}
    extra = {
        "calibration_sec": 124.245,
        "gen_rows_per_s": 879121,
        "gen_values_per_s": 7032967,
        "gen20m_sec": 11.315,
        "gen20m_values_per_s": 14140907,
        "shuffle_partitions": 1062,
        "gen2m_per_calib": 0.018,
        # the bulky dict fields that overflowed the tail in r05-r10
        "runs": {name: [123.456, 123.456, 123.456] for name in times},
        "queries_min": {name: 123.456 for name in times},
    }
    return bench.emit_lines(times, 0.1, extra)


def test_contract_line_is_last_and_parses():
    lines = _lines()
    parsed = json.loads(lines[-1])
    assert parsed["metric"].startswith("wall-clock")
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert len(parsed["queries"]) == 43
    assert parsed["value"] == round(123.456 * 43, 3)
    # every bench query name present (the driver diffs names across rounds)
    assert "generate_mixed_2m" in parsed["queries"]


def test_contract_line_fits_tail_window():
    lines = _lines()
    # 2000 is the observed driver tail; demand real headroom under it
    assert len(lines[-1]) < 1800, len(lines[-1])


def test_diagnostics_precede_contract_line():
    lines = _lines()
    diag = json.loads(lines[0])
    assert "runs" in diag["bench_diagnostics"]
    assert "queries_min" in diag["bench_diagnostics"]
    # nothing bulky leaks into the contract line's extra
    parsed = json.loads(lines[-1])
    assert all(not isinstance(v, dict) for v in parsed["extra"].values())
