"""Property-based invariant for the distributed IVF probe-list kernel
(operators/kmeans.py kmeans_transform_topn): on ARBITRARY small vector
sets - components drawn from a coarse grid precisely to force exact
distance TIES - the kernel's (dist, cid)-ordered top-n must equal a
pure-Python replay of the documented arithmetic (floor-scaled xd,
fold-order accumulation from 0.0, stable lowest-cid tie-break). The
fixture-based test in test_kmeans.py covers the realistic geometry;
this one hunts the tie-break and small-k edge cases fuzzing finds."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pipeline_mini_project_01_spark.operators.kmeans import (
    kmeans_transform_topn,
)

#: Coarse grid -> many exactly-equal squared distances, so the stable
#: tie-break is exercised constantly instead of never.
COMP = st.sampled_from([0.0, 0.25, 0.5, 1.0, -0.5])
DIM = 3
VEC = st.lists(COMP, min_size=DIM, max_size=DIM)

_SETTINGS = dict(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _replay(vecs, cents, n):
    out = []
    for vid, v in enumerate(vecs):
        xd = [math.floor(float(x) * (1 << 20)) / (1 << 20) for x in v]
        ds = []
        for cid, c in enumerate(cents):
            acc = 0.0
            for i in range(DIM):
                d = xd[i] - c[i]
                acc = acc + d * d
            ds.append((acc, cid))
        ds.sort()
        out += [(vid, rank, cid) for rank, (_, cid) in enumerate(ds[:n])]
    return sorted(out)


@given(vecs=st.lists(VEC, min_size=2, max_size=8),
       cents=st.lists(VEC, min_size=2, max_size=4),
       data=st.data())
@settings(**_SETTINGS)
def test_topn_matches_replay_on_arbitrary_vectors(spark, vecs, cents, data):
    n = data.draw(st.integers(min_value=1, max_value=len(cents)))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    got = sorted((r.vec_id, r.probe_rank, r.cluster) for r in
                 kmeans_transform_topn(emb, [list(map(float, c))
                                             for c in cents],
                                       DIM, n).collect())
    # float32 storage rounds the components before the kernel sees
    # them: replay from the SAME float32 values.
    import numpy as np
    vecs32 = [[float(np.float32(x)) for x in v] for v in vecs]
    assert got == _replay(vecs32, [list(map(float, c)) for c in cents], n)
