"""TextGrid writer/reader round-trips + short-format parsing."""

import numpy as np

from laughter_detection_icsi_tpu.eval import textgrid as tg


def test_roundtrip(tmp_path):
    path = str(tmp_path / "chan0.TextGrid")
    instances = [(1.5, 2.75), (10.0, 10.4)]
    tg.write_textgrid(path, instances, xmax=20.0)
    got = tg.read_laughter_intervals(path)
    np.testing.assert_allclose(got, instances)


def test_gaps_are_empty_text(tmp_path):
    path = str(tmp_path / "chan0.TextGrid")
    tg.write_textgrid(path, [(1.0, 2.0)], xmax=5.0)
    tiers = tg.read_textgrid(path)
    assert "laughter" in tiers
    assert tiers["laughter"] == [(0.0, 1.0, ""), (1.0, 2.0, "laugh"), (2.0, 5.0, "")]


def test_empty_instances(tmp_path):
    path = str(tmp_path / "chan0.TextGrid")
    tg.write_textgrid(path, [], xmax=3.0)
    assert tg.read_laughter_intervals(path) == []


def test_short_format_parse(tmp_path):
    """A REAL Praat-saved short-format file: the standard long-style header
    ('File type = ...' / 'Object class = "TextGrid"') with a bare-value
    body — dispatch must key on body shape, not on 'class =' (which both
    formats contain; keying on it silently parsed short files as {} —
    round-2 review finding, confirmed by execution)."""
    content = "\n".join(
        [
            'File type = "ooTextFile"',
            'Object class = "TextGrid"',
            "",
            "0",
            "5",
            "<exists>",
            "1",
            '"IntervalTier"',
            '"laughter"',
            "0",
            "5",
            "2",
            "0",
            "1.5",
            '"laugh"',
            "1.5",
            "5",
            '""',
        ]
    )
    path = tmp_path / "short.TextGrid"
    path.write_text(content)
    got = tg.read_laughter_intervals(str(path))
    np.testing.assert_allclose(got, [(0.0, 1.5)])


def test_overlapping_instances_write_merged(tmp_path):
    """Overlapping/contained instances must produce a monotone, disjoint
    tier (Praat requires a partition; overlaps would double-count time on
    read-back)."""
    path = str(tmp_path / "ov.TextGrid")
    tg.write_textgrid(path, [(0.0, 5.0), (1.0, 2.0), (4.0, 7.0)], xmax=9.0)
    tiers = tg.read_textgrid(path)
    ivals = tiers["laughter"]
    # monotone partition of [0, 9]
    assert ivals[0][0] == 0.0 and ivals[-1][1] == 9.0
    for (a0, b0, _), (a1, b1, _) in zip(ivals, ivals[1:]):
        assert b0 == a1 and a0 < b0
    assert tg.read_laughter_intervals(path) == [(0.0, 7.0)]


def test_quote_escaping_roundtrip(tmp_path):
    """Praat escapes '\"' as '\"\"'; writer and both readers must agree (the
    tgt/textgrids libraries parse unescaped quotes as string terminators)."""
    p = str(tmp_path / "q.TextGrid")
    tg.write_textgrid(p, [(1.0, 2.0)], tier_name='la"ugh', text='he" he')
    tiers = tg.read_textgrid(p)
    assert 'la"ugh' in tiers
    assert [t for _, _, t in tiers['la"ugh'] if t] == ['he" he']


def test_intervals_clamped_to_xmax(tmp_path):
    """Frame->seconds rounding can step past the channel length; the tier
    must stay a valid [xmin, xmax] partition or laugh time past xmax trips
    the evaluator's closure assert."""
    p = str(tmp_path / "c.TextGrid")
    tg.write_textgrid(p, [(2.0, 12.0)], xmax=10.0)
    assert tg.read_laughter_intervals(p) == [(2.0, 10.0)]
    # interval entirely past xmax: clamped away, grid stays valid
    tg.write_textgrid(p, [(11.0, 12.0)], xmax=10.0)
    assert tg.read_laughter_intervals(p) == []


def test_reversed_interval_rejected(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="end"):
        tg.write_textgrid(str(tmp_path / "r.TextGrid"), [(5.0, 3.0)], xmax=10.0)


def test_point_tier_skipped(tmp_path):
    """A TextTier (point tier) in a long-format file must not be collected
    as intervals."""
    p = tmp_path / "pt.TextGrid"
    p.write_text(
        'File type = "ooTextFile"\n'
        'Object class = "TextGrid"\n\n'
        "xmin = 0\nxmax = 10\ntiers? <exists>\nsize = 2\n"
        "item []:\n"
        "    item [1]:\n"
        '        class = "TextTier"\n'
        '        name = "points"\n'
        "        xmin = 0\n        xmax = 10\n"
        "        points: size = 1\n"
        "        points [1]:\n"
        "            number = 5\n"
        '            mark = "x"\n'
        "    item [2]:\n"
        '        class = "IntervalTier"\n'
        '        name = "laughter"\n'
        "        xmin = 0\n        xmax = 10\n"
        "        intervals: size = 1\n"
        "        intervals [1]:\n"
        "            xmin = 1\n            xmax = 2\n"
        '            text = "laugh"\n'
    )
    tiers = tg.read_textgrid(str(p))
    assert "points" not in tiers or tiers["points"] == []
    assert tg.read_laughter_intervals(str(p)) == [(1.0, 2.0)]


def test_touching_instances_stay_distinct(tmp_path):
    """Exactly-touching predicted events are DISTINCT instances: a
    write/read round-trip must preserve their count (adjacent same-text
    intervals are a valid Praat partition).  Only genuine overlaps merge."""
    path = str(tmp_path / "touch.TextGrid")
    tg.write_textgrid(path, [(10.0, 11.0), (11.0, 12.0)], xmax=20.0)
    got = tg.read_laughter_intervals(path)
    assert got == [(10.0, 11.0), (11.0, 12.0)]
    ivals = tg.read_textgrid(path)["laughter"]
    for (a0, b0, _), (a1, b1, _) in zip(ivals, ivals[1:]):
        assert b0 == a1 and a0 < b0  # still a monotone partition


def test_short_format_point_tier_keeps_alignment(tmp_path):
    """A short-format TextTier has TWO lines per point; the parser must
    consume them so a following IntervalTier is read correctly."""
    content = "\n".join(
        [
            'File type = "ooTextFile"',
            'Object class = "TextGrid"',
            "",
            "0",
            "5",
            "<exists>",
            "2",
            '"TextTier"',
            '"points"',
            "0",
            "5",
            "2",
            "1.5",
            '"a"',
            "3.0",
            '"b"',
            '"IntervalTier"',
            '"laughter"',
            "0",
            "5",
            "2",
            "0",
            "1.5",
            '"laugh"',
            "1.5",
            "5",
            '""',
        ]
    )
    path = tmp_path / "short_pt.TextGrid"
    path.write_text(content)
    assert tg.read_laughter_intervals(str(path)) == [(0.0, 1.5)]


def test_utf16_textgrid_parses(tmp_path):
    """Praat saves UTF-16 (BOM) by default for non-ASCII content; the
    reader must sniff the BOM instead of rejecting the file as 'not a
    TextGrid' after a garbled UTF-8 decode."""
    p = tmp_path / "u16.TextGrid"
    text = (
        'File type = "ooTextFile"\n'
        'Object class = "TextGrid"\n'
        "xmin = 0\nxmax = 5\ntiers? <exists>\nsize = 1\n"
        "item []:\n    item [1]:\n"
        '        class = "IntervalTier"\n        name = "laughter"\n'
        "        xmin = 0\n        xmax = 5\n"
        "        intervals: size = 2\n"
        "        intervals [1]:\n"
        "            xmin = 1.0\n            xmax = 2.0\n"
        '            text = "laugh"\n'
        "        intervals [2]:\n"
        "            xmin = 2.0\n            xmax = 3.0\n"
        '            text = "é non-laugh"\n'  # the non-ASCII Praat saves as UTF-16 for
    )
    for enc in ("utf-16-le", "utf-16-be", "utf-8-sig"):
        import codecs

        bom = {"utf-16-le": codecs.BOM_UTF16_LE,
               "utf-16-be": codecs.BOM_UTF16_BE,
               "utf-8-sig": b""}[enc]
        p.write_bytes(bom + text.encode(enc))
        got = tg.read_laughter_intervals(str(p))
        assert got == [(1.0, 2.0)], enc
