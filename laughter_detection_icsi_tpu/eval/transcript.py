"""ICSI ``.mrt`` transcript parsing into typed segment tables.

Fresh implementation of the behavior of
reference analysis/transcript_parsing/parse.py:28-307: parse the preambles for
channel<->participant maps, classify every ``<Segment>`` of every meeting
transcript, and produce the five DataFrames the rest of the pipeline consumes.

Unlike the reference, parsing is NOT an import side effect (reference
parse.py:356-360 runs at import); callers construct a :class:`TranscriptStore`
explicitly (or via :func:`load`, which memoizes per directory).

Classification semantics (mirrors reference parse.py:117-165):
- 0 children                      -> SPEECH
- 1 child VocalSound 'laugh…'     -> LAUGH if the segment has no text at all,
                                     else INVALID (laughter next to speech)
- 1 child VocalSound other        -> OTHER_VOCAL
- 1 child NonVocalSound           -> NON_VOCAL
- 1 child other tag (Comment, …)  -> SPEECH
- >1 children, any laugh          -> INVALID
- >1 children, any (Non)VocalSound-> MIXED
- >1 children, otherwise          -> SPEECH

DataFrame groupings (reference parse.py:168-203):
laugh_only_df=LAUGH, speech_df=SPEECH, invalid_df=INVALID,
noise_df=MIXED|NON_VOCAL|OTHER_VOCAL.
"""

from __future__ import annotations

import dataclasses
import enum
import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import pandas as pd
from lxml import etree


class SegmentType(str, enum.Enum):
    INVALID = "invalid"
    SPEECH = "speech"
    LAUGH = "laugh"
    OTHER_VOCAL = "other_vocal"
    NON_VOCAL = "non_vocal"
    MIXED = "mixed"


@dataclasses.dataclass
class Segment:
    """One transcription segment (reference parse.py:41-51)."""

    meeting_id: str
    part_id: str
    chan_id: str
    start: float
    end: float
    length: float
    type: SegmentType
    laugh_type: Optional[str]

    def as_row(self) -> Dict:
        d = dataclasses.asdict(self)
        d["type"] = self.type.value
        return d


SEGMENT_COLUMNS = [
    "meeting_id", "part_id", "chan_id", "start", "end", "length", "type",
    "laugh_type",
]
INFO_COLUMNS = ["meeting_id", "part_id", "chan_id", "length", "path"]


def parse_preambles(
    preambles_path: str,
) -> Tuple[Dict[str, Dict[str, str]], Dict[str, Dict[str, str]]]:
    """Parse ``preambles.mrt`` into (chan_to_part, part_to_chan) maps
    (reference parse.py:54-81).  Only participants with both Name and Channel
    attributes are mapped."""
    tree = etree.parse(preambles_path)
    chan_to_part: Dict[str, Dict[str, str]] = {}
    for meeting in tree.xpath("//Meeting"):
        session = meeting.get("Session")
        chan_map: Dict[str, str] = {}
        for part in meeting.xpath(
            "./Preamble/Participants/Participant[@Name and @Channel]"
        ):
            chan_map[part.get("Channel")] = part.get("Name")
        chan_to_part[session] = chan_map
    part_to_chan: Dict[str, Dict[str, str]] = {}
    for mid, cmap in chan_to_part.items():
        inv: Dict[str, str] = {}
        for c, p in cmap.items():
            if p in inv:
                # A participant listed on TWO channels (mic switch) makes
                # the inversion ambiguous: last-one-wins would silently
                # attribute ALL their segments to one channel and score
                # the other channel's real laughs as false positives.
                # Surface it; keep the first listing (document order).
                print(
                    f"WARNING: {mid}: participant {p!r} listed on channels "
                    f"{inv[p]} and {c}; segments attributed to {inv[p]}",
                    flush=True,
                )
                continue
            inv[p] = c
        part_to_chan[mid] = inv
    return chan_to_part, part_to_chan


def classify_segment(xml_seg) -> Tuple[SegmentType, Optional[str]]:
    """Classify one ``<Segment>`` element (reference parse.py:117-165).

    Child counting skips XML comments/PIs: lxml's getchildren() (which the
    reference uses) would count an annotator comment as a child and
    misclassify a pure laugh as INVALID — a divergence that only fires on
    content the real ICSI transcripts don't contain, and that keeps this
    classifier consistent with count_laugh_segments' element-only
    ``count(./*)`` XPath."""
    children = [c for c in xml_seg if isinstance(c.tag, str)]
    if len(children) == 0:
        return SegmentType.SPEECH, None
    if len(children) == 1:
        child = children[0]
        if child.tag == "VocalSound":
            desc = child.get("Description") or ""
            if "laugh" in desc:
                if "".join(xml_seg.itertext()).strip() == "":
                    return SegmentType.LAUGH, desc
                return SegmentType.INVALID, None
            return SegmentType.OTHER_VOCAL, None
        if child.tag == "NonVocalSound":
            return SegmentType.NON_VOCAL, None
        # e.g. <Comment> wrapping plain speech
        return SegmentType.SPEECH, None
    # Multiple children: laughter next to anything else is untrackable ->
    # excluded from evaluation as INVALID.
    laughs = xml_seg.xpath("./VocalSound[contains(@Description, 'laugh')]")
    if laughs:
        return SegmentType.INVALID, None
    tags = {c.tag for c in children}
    if "NonVocalSound" in tags or "VocalSound" in tags:
        return SegmentType.MIXED, None
    return SegmentType.SPEECH, None


def _as_tree(mrt):
    """Accept an .mrt path or an already-parsed lxml tree (so TranscriptStore
    can parse each multi-megabyte transcript once, not once per consumer)."""
    return mrt if hasattr(mrt, "getroot") else etree.parse(mrt)


def parse_meeting(
    mrt_path,
    meeting_id: str,
    part_to_chan: Dict[str, Dict[str, str]],
) -> List[Segment]:
    """Parse one meeting transcript (path or parsed tree) into Segment
    records.  Segments whose participant has no mapped audio channel are
    dropped (reference parse.py:93-98)."""
    tree = _as_tree(mrt_path)
    chan_of = part_to_chan.get(meeting_id, {})
    out: List[Segment] = []
    for xml_seg in tree.xpath("//Segment"):
        part_id = xml_seg.get("Participant")
        if part_id not in chan_of:
            continue
        start = float(xml_seg.get("StartTime"))
        end = float(xml_seg.get("EndTime"))
        seg_type, laugh_type = classify_segment(xml_seg)
        out.append(
            Segment(
                meeting_id=meeting_id,
                part_id=part_id,
                chan_id=chan_of[part_id],
                start=start,
                end=end,
                length=end - start,
                type=seg_type,
                laugh_type=laugh_type,
            )
        )
    return out


def meeting_length(mrt_path) -> float:
    """EndTime of the meeting's <Transcript> element (reference
    parse.py:206-215).  Accepts a path or a parsed tree."""
    tree = _as_tree(mrt_path)
    transcript = tree.find(".//Transcript")
    return float(transcript.get("EndTime"))


class TranscriptStore:
    """Parsed corpus ground truth: segment DataFrames + channel maps.

    Equivalent to the reference's module-level globals
    (reference parse.py:15-25), built eagerly by the constructor.
    """

    def __init__(self, transcript_dir: str):
        self.transcript_dir = str(transcript_dir)
        preambles = os.path.join(self.transcript_dir, "preambles.mrt")
        self.chan_to_part, self.part_to_chan = parse_preambles(preambles)

        laugh_rows: List[Dict] = []
        speech_rows: List[Dict] = []
        invalid_rows: List[Dict] = []
        noise_rows: List[Dict] = []
        info_rows: List[List] = []

        for filename in sorted(os.listdir(self.transcript_dir)):
            # All ICSI meetings have a 6-char ID (reference parse.py:232-235).
            # EXACTLY '<6 chars>.mrt': the reference's first-dot split would
            # also parse a stray 'Bmr001.orig.mrt' as meeting Bmr001 and
            # silently double every segment/info row of that meeting.
            stem, dot, ext = filename.partition(".")
            if not (dot and ext == "mrt" and len(stem) == 6):
                continue
            mrt_path = os.path.join(self.transcript_dir, filename)
            meeting_id = stem
            tree = etree.parse(mrt_path)
            length = meeting_length(tree)
            for chan_id, part_id in self.chan_to_part.get(meeting_id, {}).items():
                info_rows.append(
                    [
                        meeting_id,
                        part_id,
                        chan_id,
                        length,
                        os.path.join(meeting_id, f"{chan_id}.sph"),
                    ]
                )
            for seg in parse_meeting(tree, meeting_id, self.part_to_chan):
                row = seg.as_row()
                if seg.type is SegmentType.LAUGH:
                    laugh_rows.append(row)
                elif seg.type is SegmentType.SPEECH:
                    speech_rows.append(row)
                elif seg.type is SegmentType.INVALID:
                    invalid_rows.append(row)
                else:
                    noise_rows.append(row)

        def _df(rows: List[Dict]) -> pd.DataFrame:
            return pd.DataFrame(rows, columns=SEGMENT_COLUMNS)

        self.laugh_only_df = _df(laugh_rows)
        self.speech_df = _df(speech_rows)
        self.invalid_df = _df(invalid_rows)
        self.noise_df = _df(noise_rows)
        self.info_df = pd.DataFrame(info_rows, columns=INFO_COLUMNS).astype(
            {"length": "float"}
        )

    @property
    def meeting_ids(self) -> List[str]:
        return sorted(self.info_df["meeting_id"].unique().tolist())


_STORE_CACHE: Dict[str, TranscriptStore] = {}


def count_laugh_segments(transcript_dir: str) -> Dict[str, Tuple[int, int]]:
    """Per-meeting (all_laugh_segments, laugh_only_segments) counts.

    Exact equivalents of the reference's xmllint sweeps (reference
    analysis/transcript_parsing/filter_all_laughs.sh /
    filter_laugh_only.sh): "all" counts ``Segment`` elements containing a
    VocalSound whose Description mentions 'laugh'; "laugh only" further
    requires whitespace-only text siblings on BOTH sides of the laugh and
    no sibling tags (``count(./*) < 2``).  Note the reference predicate
    tests for the EXISTENCE of empty text siblings, so a serialization
    with no text nodes at all never matches — faithfully reproduced here
    (xmllint reports the same on the same bytes; pinned by tests)."""
    out: Dict[str, Tuple[int, int]] = {}
    no_text = "text()[normalize-space()='']"
    all_xp = "count(//Segment[VocalSound[contains(@Description,'laugh')]])"
    only_xp = (
        "count(//Segment[VocalSound[contains(@Description,'laugh')]"
        f"[preceding-sibling::{no_text} and following-sibling::{no_text}]"
        " and count(./*) < 2])"
    )
    for path in sorted(Path(transcript_dir).glob("*.mrt")):
        # Same membership rule as TranscriptStore.__init__ (exactly
        # '<6 chars>.mrt'): a stray 'Bmr001.orig.mrt' backup is excluded
        # from the store, and counting it here would make these totals
        # stop reconciling with the store-derived laugh_only_df counts
        # for the same directory.
        if len(path.name) != len("Xxx000.mrt") or path.name == "preambles.mrt":
            continue
        tree = etree.parse(str(path))
        out[path.stem] = (int(tree.xpath(all_xp)), int(tree.xpath(only_xp)))
    return out


def load(transcript_dir: Optional[str] = None) -> TranscriptStore:
    """Memoized TranscriptStore for ``transcript_dir`` (defaults to
    config.ANALYSIS.transcript_dir)."""
    from laughter_detection_icsi_tpu import config as _config

    tdir = str(transcript_dir or _config.ANALYSIS.transcript_dir)
    # Content-keyed like the index cache (indices._cache_key): a path-only
    # key would keep serving the OLD parse after the .mrt files change on
    # disk in a long-running process — and the indices rebuilt from that
    # stale store would then be cached under the NEW content hash.  The key
    # carries the full stat fingerprint (no lossy hash()) over the
    # symlink-resolved dir, and superseded entries for the same dir are
    # evicted — otherwise every corpus update would leak a whole parsed
    # store (five corpus-wide DataFrames) in this module-global dict.
    prefix = f"{Path(tdir).resolve()}#"
    stat = "|".join(
        f"{p.name}:{p.stat().st_size}:{p.stat().st_mtime_ns}"
        for p in sorted(Path(tdir).glob("*.mrt"))
    )
    key = prefix + stat
    if key not in _STORE_CACHE:
        for old in [k for k in _STORE_CACHE if k.startswith(prefix)]:
            del _STORE_CACHE[old]
        _STORE_CACHE[key] = TranscriptStore(tdir)
    return _STORE_CACHE[key]
