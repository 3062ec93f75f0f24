"""Differential fuzz of the memoized closure build (round 10).

``Dimension._compute_closure`` was rewritten in r10 from the reference's
per-ancestor recursive walk (``{**acc, **recurse}`` — exponential in DFS
path count on multi-parent DAGs) to a memoized bottom-up merge.  The
reference semantics are LAST-DFS-PATH-WINS: when a leaf is reachable
from an ancestor through several paths, the weight of the path the DFS
visits last survives.  This module pins the rewrite to a direct
reimplementation of the reference walk (reference ``dimension.py:815-827``)
on randomized small DAGs, where the exponential original is still
feasible.

Pure driver-side — no SparkSession.
"""

import random

import pytest

from tinyolap_spark.metadata import Dimension


def _reference_weighted_leaves(defs, parent_idx, base_weight):
    """The reference's exponential walk, verbatim semantics:
    ``out = {**out, **recurse}`` per child, leaves scaled along the path."""
    out = {}
    for cidx in defs[parent_idx].children:
        w = defs[cidx].parents[parent_idx]
        if defs[cidx].children:
            out = {
                **out,
                **_reference_weighted_leaves(defs, cidx, base_weight * w),
            }
        else:
            out[cidx] = base_weight * w
    return out


def _random_dag_dimension(seed):
    """A random multi-parent weighted DAG: members only parent members
    with a smaller index, so it is acyclic by construction; edge weights
    from a small set including negatives and fractions."""
    rng = random.Random(seed)
    n = rng.randint(4, 18)
    d = Dimension(f"fuzz{seed}").edit()
    names = [f"m{i}" for i in range(n)]
    for name in names:
        d.add_many(name)
    weights_pool = [1.0, 1.0, 0.5, -1.0, 0.25, 2.0]
    for i in range(1, n):
        # each member picks 1-3 parents among lower-index members
        for p in rng.sample(range(i), k=min(i, rng.randint(1, 3))):
            d.add_many(names[p], [names[i]], [rng.choice(weights_pool)])
    d.commit()
    return d


@pytest.mark.parametrize("seed", range(60))
def test_closure_matches_reference_walk(seed):
    d = _random_dag_dimension(seed)
    got = {}
    for (m, a, w) in d._closure:
        if m != a:
            got.setdefault(a, {})[m] = w
    for i in d._defs:
        if not d._defs[i].children:
            continue
        expected = _reference_weighted_leaves(d._defs, i, 1.0)
        assert got.get(i, {}) == pytest.approx(expected), (
            seed,
            d._defs[i].name,
        )


@pytest.mark.parametrize("seed", range(60))
def test_closure_identity_rows_and_leaf_coverage(seed):
    d = _random_dag_dimension(seed)
    rows = {(m, a): w for (m, a, w) in d._closure}
    for i in d._defs:
        assert rows[(i, i)] == 1.0
    # every aggregated member covers exactly its reference leaf set
    for i in d._defs:
        if d._defs[i].children:
            ref = _reference_weighted_leaves(d._defs, i, 1.0)
            mine = {m for (m, a) in rows if a == i and m != i}
            assert mine == set(ref), (seed, d._defs[i].name)
