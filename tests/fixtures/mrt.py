"""Synthetic ICSI-style .mrt fixtures with hand-computable ground truth.

The reference corpus is not shipped (transcripts stripped from the mount), so
tests build a miniature corpus following the MRT schema the parser consumes
(reference analysis/transcript_parsing/parse.py:54-81, 168-215): a
``preambles.mrt`` with Participant/Channel maps and one ``<meeting>.mrt`` per
meeting with ``<Transcript EndTime=...>`` wrapping ``<Segment>`` elements.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List


@dataclasses.dataclass
class SyntheticCorpus:
    root: Path
    transcript_dir: Path
    meetings: List[str]
    # meeting -> list of (part_id, start, end, kind) where kind is the
    # expected classification
    expected: Dict[str, List]


PREAMBLES = """<?xml version="1.0" encoding="UTF-8"?>
<Preambles>
  <Meeting Session="Btr001" DateTimeStamp="2000-01-01">
    <Preamble>
      <Participants>
        <Participant Name="me001" Channel="chan0"/>
        <Participant Name="me002" Channel="chan1"/>
        <Participant Name="mn003"/>
      </Participants>
      <Channels>
        <Channel Name="chan0" AudioFile="chan0.sph"/>
        <Channel Name="chan1" AudioFile="chan1.sph"/>
      </Channels>
    </Preamble>
  </Meeting>
  <Meeting Session="Bmr021" DateTimeStamp="2000-01-02">
    <Preamble>
      <Participants>
        <Participant Name="me001" Channel="chan0"/>
        <Participant Name="me004" Channel="chan1"/>
      </Participants>
      <Channels>
        <Channel Name="chan0" AudioFile="chan0.sph"/>
        <Channel Name="chan1" AudioFile="chan1.sph"/>
      </Channels>
    </Preamble>
  </Meeting>
</Preambles>
"""


def _segment(part: str, start: float, end: float, body: str) -> str:
    return (
        f'    <Segment StartTime="{start}" EndTime="{end}" '
        f'Participant="{part}">{body}</Segment>'
    )


def _meeting_xml(meeting_id: str, end_time: float, segments: List[str]) -> str:
    seg_text = "\n".join(segments)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<Meeting Session="{meeting_id}">\n'
        f'  <Transcript StartTime="0.0" EndTime="{end_time}">\n'
        f"{seg_text}\n"
        "  </Transcript>\n"
        "</Meeting>\n"
    )


def write_synthetic_corpus(root: Path) -> SyntheticCorpus:
    root = Path(root)
    tdir = root / "transcripts"
    tdir.mkdir(parents=True, exist_ok=True)
    (tdir / "preambles.mrt").write_text(PREAMBLES)

    # ---- Btr001 (train split), 60 s meeting ---------------------------- #
    btr_segments = [
        # pure laugh, 2 s                                      -> LAUGH
        _segment("me001", 10.0, 12.0, '<VocalSound Description="laugh"/>'),
        # breath-laugh (long enough) -> LAUGH type but routed to invalid
        # index by seg_is_invalid
        _segment("me001", 20.0, 21.0, '<VocalSound Description="breath-laugh"/>'),
        # too-short laugh (0.1 s)    -> LAUGH type, invalid index
        _segment("me001", 30.0, 30.1, '<VocalSound Description="laugh"/>'),
        # laugh next to text                                   -> INVALID
        _segment("me001", 40.0, 41.0, '<VocalSound Description="laugh"/> yeah'),
        # plain speech                                         -> SPEECH
        _segment("me001", 0.0, 5.0, "hello there"),
        # speech wrapped in a Comment tag                      -> SPEECH
        _segment("me001", 50.0, 52.0, '<Comment Description="while standing"/>'),
        # cough                                                -> OTHER_VOCAL
        _segment("me001", 54.0, 55.0, '<VocalSound Description="cough"/>'),
        # mic noise                                            -> NON_VOCAL
        _segment("me002", 5.0, 6.0, '<NonVocalSound Description="mic noise"/>'),
        # speech + noise, no laugh                             -> MIXED
        _segment(
            "me002", 15.0, 18.0, 'ok <NonVocalSound Description="door slam"/> fine'
        ),
        # multi-child with laugh                               -> INVALID
        _segment(
            "me002",
            25.0,
            27.0,
            '<VocalSound Description="laugh"/><NonVocalSound Description="clap"/>',
        ),
        # laugh for participant me002, 1.5 s                   -> LAUGH
        _segment("me002", 35.0, 36.5, '<VocalSound Description="laugh"/>'),
        # segment for unmapped participant (no channel)        -> dropped
        _segment("mn003", 45.0, 46.0, "ghost speech"),
    ]
    (tdir / "Btr001.mrt").write_text(_meeting_xml("Btr001", 60.0, btr_segments))

    # ---- Bmr021 (dev split), 100 s meeting ----------------------------- #
    bmr_segments = [
        _segment("me001", 1.0, 4.0, "speech at the start"),
        _segment("me001", 10.0, 13.0, '<VocalSound Description="laugh"/>'),
        _segment("me004", 20.0, 30.0, "a longer stretch of speech"),
        _segment("me004", 50.0, 50.5, '<VocalSound Description="laugh"/>'),
    ]
    (tdir / "Bmr021.mrt").write_text(_meeting_xml("Bmr021", 100.0, bmr_segments))

    expected = {
        "Btr001": {
            "laugh": [("me001", 10.0, 12.0), ("me002", 35.0, 36.5)],
            "invalid_type": [("me001", 40.0, 41.0), ("me002", 25.0, 27.0)],
            "invalid_routed": [("me001", 20.0, 21.0), ("me001", 30.0, 30.1)],
            "speech": [("me001", 0.0, 5.0), ("me001", 50.0, 52.0)],
            "noise": [
                ("me001", 54.0, 55.0),
                ("me002", 5.0, 6.0),
                ("me002", 15.0, 18.0),
            ],
            "length": 60.0,
        },
        "Bmr021": {
            "laugh": [("me001", 10.0, 13.0), ("me004", 50.0, 50.5)],
            "speech": [("me001", 1.0, 4.0), ("me004", 20.0, 30.0)],
            "length": 100.0,
        },
    }
    return SyntheticCorpus(
        root=root,
        transcript_dir=tdir,
        meetings=["Bmr021", "Btr001"],
        expected=expected,
    )
