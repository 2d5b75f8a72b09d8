"""IntervalSet algebra vs. brute-force integer-set semantics."""

import numpy as np
import pytest

from laughter_detection_icsi_tpu.eval.intervals import IntervalSet, to_frames, to_sec


def as_set(iset: IntervalSet) -> set:
    out = set()
    for s, e in iset.pairs():
        out.update(range(s, e))
    return out


def test_basic_construction():
    s = IntervalSet.openclosed(1, 3)
    assert s.length() == 2
    assert list(s.pairs()) == [(1, 3)]
    assert IntervalSet.openclosed(5, 5).is_empty
    assert IntervalSet.openclosed(5, 4).is_empty


def test_adjacent_union_merges():
    # portion: openclosed(1,3) | openclosed(3,5) == openclosed(1,5)
    u = IntervalSet.openclosed(1, 3) | IntervalSet.openclosed(3, 5)
    assert list(u.pairs()) == [(1, 5)]
    assert u.length() == 4


def test_disjoint_union_length():
    # p_len(openclosed(1,3) | openclosed(10,11)) == 3 (reference
    # analysis/utils.py:28-37 example says 5 for (1,3)|(10,11)... it is 2+1=3;
    # the docstring there is wrong; semantics = element count)
    u = IntervalSet.openclosed(1, 3) | IntervalSet.openclosed(10, 11)
    assert u.length() == 3
    assert u.num_atoms() == 2


def test_closed_vs_openclosed_overlap():
    # closed(5,10) contains frame 5; openclosed(0,5) contains frame 5 too.
    assert IntervalSet.closed(5, 10).overlaps(IntervalSet.openclosed(0, 5))
    # openclosed(5,9)={6..9} overlaps closed(5,10)={5..10}
    assert IntervalSet.closed(5, 10).overlaps(IntervalSet.openclosed(5, 9))
    # no overlap case
    assert not IntervalSet.closed(11, 12).overlaps(IntervalSet.openclosed(0, 10))


@pytest.mark.parametrize("seed", range(20))
def test_randomized_against_bruteforce(seed):
    rng = np.random.default_rng(seed)

    def random_set():
        n = rng.integers(0, 8)
        pairs = []
        for _ in range(n):
            a = int(rng.integers(0, 100))
            b = a + int(rng.integers(0, 20))
            pairs.append((a, b))
        return IntervalSet.from_pairs(pairs)

    a, b = random_set(), random_set()
    sa, sb = as_set(a), as_set(b)

    assert as_set(a | b) == sa | sb
    assert as_set(a & b) == sa & sb
    assert as_set(a - b) == sa - sb
    assert (a | b).length() == len(sa | sb)
    assert a.overlaps(b) == bool(sa & sb)
    assert a.contains(b) == sb.issubset(sa)
    assert a.overlap_length(b) == len(sa & sb)


def test_canonical_form_after_ops():
    a = IntervalSet.from_pairs([(0, 5), (3, 8), (8, 10), (20, 25)])
    assert list(a.pairs()) == [(0, 10), (20, 25)]
    b = a - IntervalSet.openclosed(4, 6)
    assert list(b.pairs()) == [(0, 4), (6, 10), (20, 25)]
    c = a & IntervalSet.from_pairs([(2, 22)])
    assert list(c.pairs()) == [(2, 10), (20, 22)]


def test_frame_conversions():
    # 1 ms frames (reference analysis/utils.py:8-25)
    assert to_frames(1.5) == 1500
    assert to_frames(0.0001) == 0
    assert to_sec(1500) == 1.5
    # banker's rounding matches python round()
    assert to_frames(0.0005) == round(0.0005 * 1000)
