"""Machine-checked physical-plan assertions in CI (VERDICT r4 ask #6):
the scale-critical subset of `scripts/explain_audit.py`'s CHECKS runs
under pytest at sf0.001 so the plan shapes the 100 TB design depends on
(pushdown, broadcast direction, bucketing, no cartesian, Arrow-only
python) cannot silently rot between PLANS.md regenerations.

The FULL audit (all sections + the reviewable PLANS.md document) still
runs via `python scripts/explain_audit.py`; this file only pins the
sections whose regression would be a scale-killer.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

# the sections whose failure means a 100TB scale-killer shipped:
# corpus-side shuffles/broadcasts, cartesian candidate generation,
# per-row python on a hot path, unbucketed point lookups
SCALE_CRITICAL = [
    "fetch_bucketed",     # corpus rides its bucketing; 1 exchange only
    "seen_antijoin",      # anti-join, never cartesian
    "lsh_ann",            # banded buckets, corpus never shuffles
    "ivf_ann",            # cell-pruned probes, Arrow-only assignment
    "minhash_pairs",      # band join not all-pairs; screen below shingles
    "knn_join",           # query side broadcast, corpus streams
    "embedding_neardup",  # bucketed candidate generation
    "pack_sequences",     # distributed prefix sum, no global window
    "backlog_round",      # hot/cold split bounds per-round shuffles
    "pagerank_step",      # Pregel step: keyed join+agg, no cartesian
    "anchor_topk",        # salted two-phase top-k
]


@pytest.fixture(scope="module")
def audit():
    import explain_audit

    return explain_audit


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="sf0.001 testdata absent")
@pytest.mark.parametrize("name", SCALE_CRITICAL)
def test_scale_plan_assertions(spark, audit, name):
    import __spark_entry__ as entrymod

    assert name in audit.CHECKS, f"{name} dropped from explain_audit.CHECKS"
    if name in audit._BUILDERS:
        df = audit._BUILDERS[name](spark, SF_DIR)
    else:
        df = entrymod.queries_all()[name](spark, SF_DIR)
    df.collect()  # finalize AQE so the formatted plan is the real one
    plan = audit.formatted_plan(df)
    failed = [desc for desc, pred in audit.CHECKS[name] if not pred(plan)]
    assert not failed, f"{name}: failed plan assertions: {failed}"
