"""Pin the bench's stdout artifact contract (rounds 4 and 10 both shipped
a final line the driver could not parse — first a giant single line that
outgrew the capture window, then a compact line that embedded whole probe
sub-objects). The contract: ONE JSON line, <= MAX_COMPACT_BYTES, flat
gates, no nested probe objects. These tests render `_compact` on a
synthetic fully-populated result (every optional section present, the
worst case for line growth) without touching Spark."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _full_result() -> dict:
    # every section populated — the fully-loaded shape a complete driver
    # run emits (sf1 + scale10m + fuzzy slope all present)
    gate_probe = {
        "minhash_recall_gate": True,
        "minhash_agreement_gate": True,
        "emb_agreement_gate": True,
        "emb_speed_gate": True,
        "emb_volume_gate": False,
    }
    return {
        "metric": "ann_search_1k_wall_sec",
        "value": 0.75,
        "sf": 0.1,
        "n_queries": 1000,
        "queries": {
            "index_build": 3.604,
            "ann_batch_1k": 2.17,
            "ann_batch_1k_bucketed": 1.788,
            "ann_search_engine_1k": 0.75,
            "knn_exact_fast_1k": 0.688,
        },
        "queries_spread": {"ann_search_engine_1k": [0.731, 1.328]},
        "engine_qps": 1333.3,
        "ivf_recall_at_k": 0.9715,
        "ivf_qps": 460.8,
        "host_gemm_sec": 0.129,
        "host_shuffle_sec": 0.614,
        "scale_probe": {
            "ivf_sec": 16.68,
            "brute_sec": 85.62,
            "ivf_recall_at_k": 0.9713,
            "recall_gate_0.9": True,
            "earlystop": {
                "recall_gate": True,
                "probe_saving_gate": True,
                "wall_parity_gate": True,
            },
            "seq_latency": {"adaptive_wins": True, "recall_gate": True},
            "kernel_ab": {"note": "detail-only blob " * 20},
        },
        "scale_probe_10m": {
            "ivf_sec": 26.73,
            "brute_sec": 175.12,
            "recall_at_k": 0.9581,
            "recall_gate_0.9": True,
            "ivf_2x_brute_gate": True,
            "fastscan_equal_gate": True,
        },
        "dedup_scale_probe": gate_probe,
        "dedup_scale_probe_10m": {
            "sec": 211.0,
            "docs_per_sec": 47398,
            "slope_vs_1m": 1.137,
            "recall_gate": True,
            "linear_gate": True,
        },
        "state_scale_probe": {"equal_gate": True, "peak_gate": True,
                              "eviction_gate": True},
        "slope_probe": {
            "duplicate_spans_slope_gate": True,
            "contamination_check_slope_gate": True,
            "neardup_ngram_slope_gate": True,
            "fuzzy_name_pairs_slope_gate": True,
        },
        "sf1": {"queries": {f"q{i}": 1.0 for i in range(160)}},
        "phases_done": [{"phase": f"p{i}", "t_sec": i} for i in range(12)],
        "phases_skipped": {},
    }


def test_compact_line_fits_budget():
    b = _bench()
    line = json.dumps(b._compact(_full_result()))
    assert len(line) <= b.MAX_COMPACT_BYTES, len(line)


def test_compact_is_flat():
    # no nested probe objects: the only dict-valued keys are the headline
    # queries map and the flat boolean gates map
    b = _bench()
    compact = b._compact(_full_result())
    dict_keys = {k for k, v in compact.items() if isinstance(v, dict)}
    assert dict_keys <= {"queries", "gates"}, dict_keys
    assert all(
        isinstance(v, bool) for v in compact["gates"].values()
    ), compact["gates"]
    # the r10 offenders must not ride along
    for k in ("earlystop", "seq_latency", "kernel_ab", "scale10m",
              "dedup10m", "phases_done"):
        assert k not in compact, k


def test_compact_carries_headline_and_gate_signals():
    b = _bench()
    compact = b._compact(_full_result())
    assert compact["value"] == 0.75
    assert compact["scale10m_ivf_sec"] == 26.73
    assert compact["dedup10m_slope"] == 1.137
    g = compact["gates"]
    assert g["scale10m_2x_brute"] is True
    assert g["dedup10m_linear"] is True
    assert g["emb_volume"] is False  # falsy gates survive (only None drops)
    assert g["state_equal"] is True  # state gates carry their probe prefix


def test_compact_drops_unrun_sections():
    b = _bench()
    compact = b._compact({"metric": "m", "value": None, "queries": {}})
    assert compact["value"] is None  # contract keys stay even when null
    assert "scale10m_ivf_sec" not in compact
    assert compact.get("gates", {}) == {}
