from .events_adapter import TRANSCRIPTS_FROM_EVENTS_SQL, transcripts_from_events
from .transcripts import (
    generate_stream_fixture,
    read_transcripts,
    transcript_fragments,
)

__all__ = [
    "generate_stream_fixture",
    "read_transcripts",
    "transcript_fragments",
    "transcripts_from_events",
    "TRANSCRIPTS_FROM_EVENTS_SQL",
]
