"""Transcript parsing + index building on the synthetic corpus."""

import pytest

from laughter_detection_icsi_tpu.eval import indices as idx_mod
from laughter_detection_icsi_tpu.eval import transcript
from laughter_detection_icsi_tpu.eval.transcript import TranscriptStore


@pytest.fixture(scope="module")
def store(synthetic_corpus):
    return TranscriptStore(str(synthetic_corpus.transcript_dir))


@pytest.fixture(scope="module")
def indices(store):
    return idx_mod.build_indices(store)


def test_preamble_maps(store):
    assert store.chan_to_part["Btr001"] == {"chan0": "me001", "chan1": "me002"}
    assert store.part_to_chan["Btr001"]["me002"] == "chan1"
    # participant without channel is not mapped
    assert "mn003" not in store.part_to_chan["Btr001"]


def test_segment_classification(store, synthetic_corpus):
    exp = synthetic_corpus.expected["Btr001"]
    laugh = store.laugh_only_df[store.laugh_only_df.meeting_id == "Btr001"]
    # LAUGH type includes breath-laugh and too-short laughs (the *type* is
    # laugh; routing to invalid happens at index build time)
    got_laughs = {(r.part_id, r.start, r.end) for r in laugh.itertuples()}
    expected_laughs = set(exp["laugh"]) | set(exp["invalid_routed"])
    assert got_laughs == expected_laughs

    invalid = store.invalid_df[store.invalid_df.meeting_id == "Btr001"]
    assert {(r.part_id, r.start, r.end) for r in invalid.itertuples()} == set(
        exp["invalid_type"]
    )

    speech = store.speech_df[store.speech_df.meeting_id == "Btr001"]
    assert {(r.part_id, r.start, r.end) for r in speech.itertuples()} == set(
        exp["speech"]
    )

    noise = store.noise_df[store.noise_df.meeting_id == "Btr001"]
    assert {(r.part_id, r.start, r.end) for r in noise.itertuples()} == set(
        exp["noise"]
    )

    # unmapped participant dropped entirely
    for df in (store.laugh_only_df, store.speech_df, store.invalid_df, store.noise_df):
        assert "mn003" not in set(df.part_id)


def test_laugh_types_recorded(store):
    btr = store.laugh_only_df[store.laugh_only_df.meeting_id == "Btr001"]
    types = dict(zip(zip(btr.part_id, btr.start), btr.laugh_type))
    assert types[("me001", 10.0)] == "laugh"
    assert types[("me001", 20.0)] == "breath-laugh"


def test_info_df(store, synthetic_corpus):
    btr = store.info_df[store.info_df.meeting_id == "Btr001"]
    assert set(btr.chan_id) == {"chan0", "chan1"}
    assert (btr.length == 60.0).all()
    assert "Btr001/chan0.sph" in set(btr.path)
    assert store.meeting_ids == ["Bmr021", "Btr001"]


def test_laugh_index_routing(indices):
    # valid laughs only
    me001 = indices.laugh.get("Btr001", "me001")
    assert list(me001.pairs()) == [(10000, 12000)]
    me002 = indices.laugh.get("Btr001", "me002")
    assert list(me002.pairs()) == [(35000, 36500)]
    # tot_len counts only valid laughs: 2.0 + 1.5
    assert indices.laugh.tot_len["Btr001"] == pytest.approx(3.5)
    assert indices.laugh.tot_events["Btr001"] == 2


def test_invalid_index_contains_routed_laughs(indices):
    inv = indices.invalid.get("Btr001", "me001")
    # invalid-type segment 40-41 plus routed breath-laugh 20-21 and short 30-30.1
    assert list(inv.pairs()) == [(20000, 21000), (30000, 30100), (40000, 41000)]
    inv2 = indices.invalid.get("Btr001", "me002")
    assert list(inv2.pairs()) == [(25000, 27000)]


def test_silence_index_complement(indices, store):
    # me001@Btr001: 60 s minus speech(0-5, 50-52), laugh(10-12),
    # invalid(20-21, 30-30.1, 40-41), noise(54-55): 60 - 12.1 = 47.9 s
    sil = indices.silence.get("Btr001", "me001")
    expected_len = 60.0 - (5 + 2 + 2 + 1 + 0.1 + 1 + 1)
    assert sil.length() == pytest.approx(expected_len * 1000)
    # silence never overlaps any other index
    for idx in (indices.laugh, indices.invalid, indices.speech, indices.noise):
        assert not sil.overlaps(idx.get("Btr001", "me001"))


def test_all_meetings_present_in_all_indices(indices, store):
    for meeting_id in store.meeting_ids:
        for idx in (
            indices.laugh,
            indices.invalid,
            indices.speech,
            indices.noise,
            indices.silence,
        ):
            assert meeting_id in idx.sets


def test_index_cache_roundtrip(store, tmp_path):
    first = idx_mod.load(store, cache_dir=str(tmp_path))
    idx_mod._INDEX_CACHE.clear()
    second = idx_mod.load(store, cache_dir=str(tmp_path))
    assert first.laugh.get("Btr001", "me001") == second.laugh.get("Btr001", "me001")
    assert first.laugh.tot_len == second.laugh.tot_len


def test_count_laugh_segments(synthetic_corpus):
    """Parity with the reference's xmllint counting scripts (reference
    analysis/transcript_parsing/filter_all_laughs.sh /
    filter_laugh_only.sh) on the synthetic corpus: 'all' counts segments
    containing any laugh VocalSound; 'laugh only' requires no text and no
    sibling tags around it."""
    from laughter_detection_icsi_tpu.eval.transcript import count_laugh_segments

    counts = count_laugh_segments(str(synthetic_corpus.transcript_dir))
    assert set(counts) == {"Btr001", "Bmr021"}
    # Btr001 fixture (tests/fixtures/mrt.py): segments containing a laugh
    # VocalSound are the pure laugh, breath-laugh, short laugh, laugh+text,
    # multi-child laugh, and me002's laugh = 6.  The fixture serializes
    # sounds with NO whitespace text siblings, and the reference xpath
    # requires empty-text siblings on both sides — so laugh_only is 0
    # there, exactly as xmllint would report on the same bytes.
    n_all, n_only = counts["Btr001"]
    assert n_all == 6
    assert n_only == 0


def test_count_laugh_segments_laugh_only_branch(tmp_path):
    """With the real corpus's whitespace-rich serialization, the laugh-only
    predicate (empty text around a single laugh child) fires."""
    from laughter_detection_icsi_tpu.eval.transcript import count_laugh_segments

    (tmp_path / "Bxx001.mrt").write_text(
        """<?xml version="1.0" encoding="UTF-8"?>
<Meeting Session="Bxx001">
  <Transcript StartTime="0.0" EndTime="10.0">
    <Segment StartTime="1.0" EndTime="2.0" Participant="me001">
      <VocalSound Description="laugh"/>
    </Segment>
    <Segment StartTime="3.0" EndTime="4.0" Participant="me001">
      <VocalSound Description="laugh"/> yeah
    </Segment>
    <Segment StartTime="5.0" EndTime="6.0" Participant="me001">
      <VocalSound Description="laugh"/>
      <NonVocalSound Description="clap"/>
    </Segment>
  </Transcript>
</Meeting>
"""
    )
    counts = count_laugh_segments(str(tmp_path))
    assert counts["Bxx001"] == (3, 1)


def test_comment_inside_segment_does_not_invalidate(tmp_path, synthetic_corpus):
    """An annotator XML comment inside a pure-laugh <Segment> must not count
    as a child (lxml would), which misclassified the laugh as INVALID and
    disagreed with count_laugh_segments' element-only XPath."""
    import shutil

    from laughter_detection_icsi_tpu.eval import transcript as tl

    tdir = tmp_path / "tr"
    shutil.copytree(synthetic_corpus.transcript_dir, tdir)
    mrt = tdir / "Bmr021.mrt"
    text = mrt.read_text()
    assert "<VocalSound" in text
    text = text.replace("<VocalSound", "<!-- annotator note --><VocalSound", 1)
    mrt.write_text(text)
    base = tl.TranscriptStore(str(synthetic_corpus.transcript_dir))
    got = tl.TranscriptStore(str(tdir))
    assert len(got.laugh_only_df) == len(base.laugh_only_df)
    assert len(got.invalid_df) == len(base.invalid_df)


def test_stray_dotted_mrt_not_double_parsed(tmp_path, synthetic_corpus):
    """Bmr021.orig.mrt next to Bmr021.mrt must be skipped, not parsed as a
    second copy of meeting Bmr021 (the reference's first-dot split would
    silently double every row)."""
    import shutil

    from laughter_detection_icsi_tpu.eval import transcript as tl

    tdir = tmp_path / "tr"
    shutil.copytree(synthetic_corpus.transcript_dir, tdir)
    shutil.copyfile(tdir / "Bmr021.mrt", tdir / "Bmr021.orig.mrt")
    base = tl.TranscriptStore(str(synthetic_corpus.transcript_dir))
    got = tl.TranscriptStore(str(tdir))
    assert len(got.laugh_only_df) == len(base.laugh_only_df)
    assert len(got.info_df) == len(base.info_df)


def test_duplicate_participant_channels_warn_first_wins(tmp_path, capsys):
    """A participant listed on two channels makes the part->chan inversion
    ambiguous; it must be surfaced (first listing wins), not silently
    last-one-wins."""
    (tmp_path / "preambles.mrt").write_text(
        '<?xml version="1.0"?>\n<Meetings>\n'
        '<Meeting Session="Bxx001">\n<Preamble>\n<Participants>\n'
        '<Participant Name="me013" Channel="chan0"/>\n'
        '<Participant Name="me013" Channel="chan1"/>\n'
        "</Participants>\n</Preamble>\n</Meeting>\n</Meetings>\n"
    )
    chan_to_part, part_to_chan = transcript.parse_preambles(
        str(tmp_path / "preambles.mrt")
    )
    out = capsys.readouterr().out
    assert "me013" in out and "WARNING" in out
    assert part_to_chan["Bxx001"]["me013"] == "chan0"
    assert set(chan_to_part["Bxx001"]) == {"chan0", "chan1"}


def test_count_laugh_segments_matches_store_membership(synthetic_corpus, tmp_path):
    """A stray 'Bmr021.orig.mrt' backup is excluded from the store, so the
    xmllint-equivalent counter must exclude it too or the two totals stop
    reconciling for the same directory."""
    import shutil

    tdir = tmp_path / "t"
    shutil.copytree(synthetic_corpus.transcript_dir, tdir)
    want = transcript.count_laugh_segments(str(tdir))
    shutil.copyfile(tdir / "Bmr021.mrt", tdir / "Bmr021.orig.mrt")
    got = transcript.count_laugh_segments(str(tdir))
    assert got == want  # the backup contributed nothing
