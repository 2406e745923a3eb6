import numpy as np
import pytest

from synthanatomy_tpu.models.ordering import (
    Ordering,
    gilbert2d,
    gilbert3d,
)


@pytest.mark.parametrize("w,h", [(1, 1), (1, 7), (8, 8), (5, 3), (16, 9), (13, 13), (2, 10)])
def test_gilbert2d_space_filling(w, h):
    coords = list(gilbert2d(w, h))
    assert len(coords) == w * h
    assert len(set(coords)) == w * h
    for (x, y) in coords:
        assert 0 <= x < w and 0 <= y < h
    # unit-step adjacency: the defining Hilbert-curve property
    for a, b in zip(coords, coords[1:]):
        assert abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1


@pytest.mark.parametrize(
    "w,h,d",
    [(1, 1, 1), (2, 2, 2), (4, 4, 4), (3, 5, 7), (10, 14, 10), (20, 28, 20), (8, 3, 2), (1, 6, 4)],
)
def test_gilbert3d_space_filling(w, h, d):
    coords = list(gilbert3d(w, h, d))
    assert len(coords) == w * h * d
    assert len(set(coords)) == w * h * d
    for (x, y, z) in coords:
        assert 0 <= x < w and 0 <= y < h and 0 <= z < d
    steps = [sum(abs(u - v) for u, v in zip(a, b)) for a, b in zip(coords, coords[1:])]
    if w % 2 == 0 or h % 2 == 0 or d % 2 == 0:
        # unit-step continuity holds whenever any dimension is even
        assert all(s == 1 for s in steps)
    else:
        # all-odd cuboids admit a few diagonal steps (inherent to the
        # generalized-Hilbert construction; the reference's vendored
        # gilbert3d shows the same behaviour)
        assert all(s <= 2 for s in steps)
        assert sum(s != 1 for s in steps) <= max(1, len(steps) // 10)


@pytest.mark.parametrize("otype", ["raster_scan", "s_curve", "random", "hilbert"])
def test_ordering_roundtrip_3d(otype):
    dims = (4, 6, 5)
    o = Ordering(otype, 3, dims)
    perm = o.get_sequence_ordering()
    rev = o.get_revert_sequence_ordering()
    flat = np.arange(np.prod(dims))
    seq = flat[perm]
    assert np.array_equal(seq[rev], flat)
    assert sorted(perm.tolist()) == list(range(np.prod(dims)))


@pytest.mark.parametrize("otype", ["raster_scan", "s_curve", "random", "hilbert"])
def test_ordering_roundtrip_2d(otype):
    dims = (6, 9)
    o = Ordering(otype, 2, dims)
    perm = o.get_sequence_ordering()
    rev = o.get_revert_sequence_ordering()
    flat = np.arange(np.prod(dims)) * 3 + 1
    assert np.array_equal(flat[perm][rev], flat)


def test_raster_is_identity_without_transforms():
    o = Ordering("raster_scan", 3, (3, 4, 5))
    assert np.array_equal(o.get_sequence_ordering(), np.arange(60))


def test_s_curve_adjacency():
    # 2D s-curve is fully unit-step adjacent.
    o2 = Ordering("s_curve", 2, (6, 9))
    c2 = np.stack(np.unravel_index(o2.get_sequence_ordering(), (6, 9)), axis=-1)
    assert (np.abs(np.diff(c2, axis=0)).sum(axis=1) == 1).all()
    # 3D (reference semantics): unit-step within each (row, col) sweep;
    # row→row transitions jump the depth axis because the depth
    # direction is keyed to the column *value* parity
    # (img2seq_ordering.py:166-168), so only assert adjacency away from
    # the row boundaries.
    dims = (3, 4, 5)
    o = Ordering("s_curve", 3, dims)
    coords = np.stack(np.unravel_index(o.get_sequence_ordering(), dims), axis=-1)
    steps = np.abs(np.diff(coords, axis=0)).sum(axis=1)
    row_len = dims[1] * dims[2]
    within = np.ones(len(steps), bool)
    within[row_len - 1 :: row_len] = False
    assert (steps[within] == 1).all()


def test_hilbert_adjacency_after_template_transform():
    dims = (4, 6, 4)
    o = Ordering(
        "hilbert",
        3,
        dims,
        transpositions_axes=[(0, 1)],
        rot90_axes=[(1, 2)],
        reflected_spatial_dims=(True, False, False),
    )
    perm = o.get_sequence_ordering()
    assert sorted(perm.tolist()) == list(range(int(np.prod(dims))))


def test_leading_singleton_dim_accepted():
    o = Ordering("raster_scan", 3, (1, 2, 3, 4))
    assert o.dimensions == (2, 3, 4)
    with pytest.raises(ValueError):
        Ordering("raster_scan", 3, (2, 2, 3, 4))


def test_random_ordering_deterministic_per_seed():
    a = Ordering("random", 2, (5, 5), seed=7).get_sequence_ordering()
    b = Ordering("random", 2, (5, 5), seed=7).get_sequence_ordering()
    c = Ordering("random", 2, (5, 5), seed=8).get_sequence_ordering()
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_call_reorders():
    o = Ordering("hilbert", 2, (4, 4))
    x = np.arange(16)
    assert np.array_equal(o(x), x[o.get_sequence_ordering()])


def test_invalid_args():
    with pytest.raises(ValueError):
        Ordering("zigzag", 3, (2, 2, 2))
    with pytest.raises(ValueError):
        Ordering("raster_scan", 4, (2, 2, 2, 2))
    with pytest.raises(ValueError):
        Ordering("raster_scan", 3, (2, 2, 2), transformation_order=("transpose", "transpose"))
