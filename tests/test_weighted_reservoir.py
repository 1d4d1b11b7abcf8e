"""WeightedReservoir: determinism, mergeability, weight-proportional bias."""

import numpy as np
import pyarrow as pa
import pytest

from raysketch.sketches.base import sketch_from_bytes
from raysketch.sketches.weighted_reservoir import WeightedReservoir


def _build_local(values, weights, k=16, seed=3):
    sk = WeightedReservoir(k=k, seed=seed)
    sk.update_columns(pa.array(values), np.asarray(weights, dtype=np.float64))
    return sk


def test_partition_and_order_independent_bitwise():
    rng = np.random.default_rng(2)
    vals = rng.permutation(np.arange(500)).astype(np.int64)
    w = rng.uniform(0.5, 9.0, size=500)
    whole = _build_local(vals, w)
    # 9 uneven chunks merged in scrambled order
    cuts = np.sort(rng.choice(np.arange(1, 500), size=8, replace=False))
    chunks = np.split(np.arange(500), cuts)
    parts = [_build_local(vals[c], w[c]) for c in chunks]
    order = rng.permutation(len(parts))
    acc = parts[order[0]]
    for i in order[1:]:
        acc.merge(parts[i])
    assert acc.items == whole.items
    assert acc.n_seen == whole.n_seen == 500
    rt = sketch_from_bytes(acc.to_bytes())
    assert rt.items == acc.items


def test_weight_proportional_inclusion_over_seeds():
    vals = np.arange(100, dtype=np.int64)
    w = np.where(vals < 50, 1.0, 10.0)  # second half 10x heavier
    heavy = light = 0
    for seed in range(60):
        sk = _build_local(vals, w, k=10, seed=seed)
        s = np.array(sk.sample())
        heavy += int((s >= 50).sum())
        light += int((s < 50).sum())
    assert heavy > 3 * light  # A-ES strongly favors 10x weights


def test_rejects_nonpositive_weights():
    with pytest.raises(ValueError):
        _build_local([1, 2], [1.0, 0.0])


@pytest.mark.usefixtures("ray_session")
def test_distributed_build_equals_local_bitwise():
    import ray.data as rd

    from raysketch.pipeline.build import build_sketch

    rng = np.random.default_rng(4)
    vals = np.arange(2000, dtype=np.int64)
    w = rng.uniform(0.1, 5.0, size=2000)
    t = pa.table({"v": vals, "w": w})
    ds = rd.from_arrow(t).repartition(7)
    sk = build_sketch(
        ds,
        ["v", "w"],
        lambda: WeightedReservoir(k=32, seed=11),
        update=lambda s, b: s.update_columns(
            b.column("v"), b.column("w").to_numpy(zero_copy_only=False)
        ),
    )
    local = WeightedReservoir(k=32, seed=11)
    local.update_columns(pa.array(vals), w)
    assert sk.items == local.items
    assert sk.n_seen == 2000


def test_k1_inclusion_matches_aes_theory():
    """For k=1, A-ES picks item x with probability w_x / Σw exactly (max of
    independent u^(1/w) keys). Empirical frequency over seeds must match."""
    vals = np.array([0, 1, 2], dtype=np.int64)
    w = np.array([1.0, 2.0, 7.0])
    counts = {0: 0, 1: 0, 2: 0}
    n_seeds = 400
    for seed in range(n_seeds):
        sk = _build_local(vals, w, k=1, seed=seed)
        counts[int(sk.sample()[0])] += 1
    freq = np.array([counts[i] / n_seeds for i in range(3)])
    theory = w / w.sum()  # [0.1, 0.2, 0.7]
    assert np.all(np.abs(freq - theory) < 0.08), (freq, theory)
