"""Distribution drift (D13): PSI / KS over merged KLL sketches.

The temporal analog of the reference's sub-schema compatibility gate
(util.clj:257-278; README.md:260-353): "is today's data still compatible
with the baseline snapshot" — answered from two merged KLL sketches, so the
comparison costs O(sketch) regardless of table size. Bin edges come from
the baseline sketch's quantiles; both sketches are rank-queried at those
edges; PSI and KS are computed driver-side over the resulting tiny vectors
(SURVEY.md §4.2: no Catalyst work, plain math).
"""

from __future__ import annotations

import json
import math
from typing import Dict, List, Optional

from .stats import kll_cdf, kll_quantiles

DEFAULT_BINS = 10
# conventional PSI thresholds: <0.1 stable, 0.1-0.25 moderate, >0.25 drifted
PSI_THRESHOLD = 0.25


def psi_ks_from_sketches(spark, baseline_kll: bytes, current_kll: bytes,
                         n_bins: int = DEFAULT_BINS) -> Dict[str, float]:
    """Population Stability Index + Kolmogorov-Smirnov statistic between two
    KLL quantile sketches. Edges = baseline deciles (interior), so the
    baseline bin mass is ~uniform and PSI is well-conditioned.
    """
    probs = [i / n_bins for i in range(1, n_bins)]
    edges = kll_quantiles(spark, baseline_kll, probs)
    # dedupe degenerate edges (constant-ish columns)
    uniq: List[float] = []
    for e in edges:
        if not uniq or e > uniq[-1]:
            uniq.append(e)
    if not uniq:
        return {"psi": 0.0, "ks": 0.0, "n_bins": 1}

    base_cdf = [0.0] + kll_cdf(spark, baseline_kll, uniq) + [1.0]
    cur_cdf = [0.0] + kll_cdf(spark, current_kll, uniq) + [1.0]

    eps = 1e-6
    psi = 0.0
    ks = 0.0
    for i in range(1, len(base_cdf)):
        p = max(base_cdf[i] - base_cdf[i - 1], eps)   # baseline bin mass
        q = max(cur_cdf[i] - cur_cdf[i - 1], eps)     # current bin mass
        psi += (q - p) * math.log(q / p)
        ks = max(ks, abs(base_cdf[i] - cur_cdf[i]))
    return {"psi": psi, "ks": ks, "n_bins": len(uniq) + 1}


def drift_violations(spark, snapshot_id: str,
                     baseline_stats: Dict[str, bytes],
                     current_stats: Dict[str, bytes],
                     threshold: float = PSI_THRESHOLD,
                     n_bins: int = DEFAULT_BINS) -> List[Dict]:
    """Compare every column present in both sketch registries; emit a
    drift_psi violation row (F5 shape) where PSI exceeds the threshold."""
    out: List[Dict] = []
    for col in sorted(set(baseline_stats) & set(current_stats)):
        b, c = baseline_stats[col], current_stats[col]
        if b is None or c is None:
            continue
        try:
            m = psi_ks_from_sketches(spark, b, c, n_bins)
        except Exception:
            # invalid/empty sketch (e.g. a column that lost KLL eligibility
            # between snapshots): not comparable, not a drift failure
            continue
        if m["psi"] > threshold:
            out.append({
                "snapshot_id": snapshot_id,
                "partition_id": -1,      # snapshot-level check
                "check_id": "drift_psi",
                "mgu_failure": None,
                "schema_1": None, "schema_2": None,
                "conv_id": None, "turn_idx": None,
                "payload": json.dumps(
                    {"column": col, "psi": round(m["psi"], 6),
                     "ks": round(m["ks"], 6), "threshold": threshold},
                    sort_keys=True),
            })
    return out


def schema_drift_violation(snapshot_id: str, column: str,
                           snapshot_schema: Dict, baseline_schema: Dict,
                           ) -> Optional[Dict]:
    """Sub-schema gate: snapshot column type must conform to the baseline
    type (the reference's protocol-conformance check, algo_w.clj:223-248).
    Returns a violation row or None."""
    from ..ir.schema_ir import schema_to_json
    from ..ir.subschema import sub_schema

    if sub_schema(snapshot_schema, baseline_schema):
        return None
    return {
        "snapshot_id": snapshot_id,
        "partition_id": -1,
        "check_id": "schema_compat",
        "mgu_failure": "non_equal",
        "schema_1": schema_to_json(snapshot_schema),
        "schema_2": schema_to_json(baseline_schema),
        "conv_id": None, "turn_idx": None,
        "payload": json.dumps({"column": column}, sort_keys=True),
    }


def transition_matrix(df, key_col: str = "conv_id", ts_col: str = "ts",
                      seq_col: str = "role", tiebreak_col: str = "turn_idx"
                      ) -> Dict:
    """Collect a snapshot's (prev -> cur) transition matrix as a driver
    dict — the aggregate is |roles|^2 rows (metadata-sized; the corpus
    shuffles once on the conversation key, same Exchange as every other
    per-key check). This is the STRUCTURE baseline the value-level KLL
    baseline cannot express."""
    from .conversations import transition_counts
    rows = transition_counts(df, key_col, ts_col, seq_col,
                             tiebreak_col).collect()
    return {(r.prev, r.cur): int(r.n) for r in rows}


def transition_drift_violation(snapshot_id: str, baseline: Dict,
                               current: Dict,
                               threshold: float = PSI_THRESHOLD
                               ) -> Optional[Dict]:
    """PSI between two transition matrices over the union of observed
    cells (eps-clamped like psi_ks_from_sketches). Emits ONE
    snapshot-level violation row when the matrix as a whole drifts,
    naming the largest-term cell — a role-protocol regression
    (assistant turns that stop following user turns) moves this matrix
    while every per-column value distribution stays flat."""
    cells = sorted(set(baseline) | set(current))
    if not cells:
        return None
    tb = sum(baseline.values()) or 1
    tc = sum(current.values()) or 1
    eps = 1e-6
    psi = 0.0
    top_cell, top_term = None, float("-inf")
    for cell in cells:
        p = max(baseline.get(cell, 0) / tb, eps)
        q = max(current.get(cell, 0) / tc, eps)
        term = (q - p) * math.log(q / p)
        psi += term
        if term > top_term:
            top_term, top_cell = term, cell
    if psi <= threshold:
        return None
    return {
        "snapshot_id": snapshot_id,
        "partition_id": -1,
        "check_id": "transition_drift",
        "mgu_failure": None,
        "schema_1": None, "schema_2": None,
        "conv_id": None, "turn_idx": None,
        "payload": json.dumps(
            {"psi": round(psi, 6), "threshold": threshold,
             "top_cell": list(top_cell), "top_term": round(top_term, 6)},
            sort_keys=True),
    }
