"""Property test for sim16's norm-augmentation reduction: for ANY finite
float corpus, ranking by augmented-space cosine must equal ranking by
raw inner product (the mathematical identity the query demonstrates on
the fixture — here fuzzed over adversarial float inputs, including the
max-norm vector whose augmented component is sqrt(~0)).

Pure numpy — mirrors the exact arithmetic sequence both engines run
(fold dot products, sqrt, divide), no Spark session needed.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _fold_dot(a, b):
    # sequential left fold, like F.aggregate / the oracle's fold
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-8, max_value=8, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=3,
        max_size=12,
    )
)
def test_augmented_cosine_ranking_equals_mips(vecs):
    corpus = [np.array(v, dtype=np.float64) for v in vecs]
    n2 = [_fold_dot(v, v) for v in corpus]
    m2 = max(n2)
    aug = [
        np.append(v, math.sqrt(max(m2 - nn, 0.0))) for v, nn in zip(corpus, n2)
    ]
    q = corpus[0]
    qa = np.append(q, 0.0)
    ips = []
    coss = []
    for i in range(1, len(corpus)):
        ip = _fold_dot(q, corpus[i])
        na = math.sqrt(_fold_dot(qa, qa))
        nb = math.sqrt(_fold_dot(aug[i], aug[i]))
        if na == 0.0 or nb == 0.0:
            return  # zero-norm: cosine undefined; the query's vectors are non-null embeddings
        cos = _fold_dot(qa, aug[i]) / (na * nb)
        ips.append((ip, i))
        coss.append((cos, i))
    # ranking by ip == ranking by augmented cos, ties broken by index.
    # The reduction divides every ip by the SAME positive constant
    # (|qa| * M), so order is preserved exactly up to fp rounding of
    # the division — assert the orders agree whenever the ips are
    # distinguishable at the cosine's resolution.
    by_ip = sorted(ips, key=lambda t: (-t[0], t[1]))
    by_cos = sorted(coss, key=lambda t: (-t[0], t[1]))
    ip_order = [i for _, i in by_ip]
    cos_order = [i for _, i in by_cos]
    if ip_order != cos_order:
        # only acceptable when the swapped neighbors' ips are within
        # fp noise of each other (sub-ulp-of-cosine ties)
        ip_of = dict((i, v) for v, i in ips)
        for a, b in zip(ip_order, cos_order):
            if a != b:
                scale = max(abs(ip_of[a]), abs(ip_of[b]), 1e-30)
                assert abs(ip_of[a] - ip_of[b]) / scale < 1e-12, (
                    f"reduction broke ranking: ip {ip_of[a]} vs {ip_of[b]}"
                )


def test_max_norm_vector_augment_is_zero():
    # the max-norm vector's augmented slot must be sqrt(0) = 0 exactly,
    # never NaN from a sub-ulp negative (the GREATEST(., 0) guard)
    v = np.array([3.0, 4.0])
    n2 = _fold_dot(v, v)
    assert math.sqrt(max(n2 - n2, 0.0)) == 0.0
